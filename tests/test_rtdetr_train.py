"""RT-DETR training stack: LAP matcher, DETR loss, denoising group.

Mirrors the reference surfaces: models/utils/ops.py HungarianMatcher +
get_cdn_group, models/utils/loss.py DETRLoss/RTDETRDetectionLoss, and
models/rtdetr/train.py trainer wiring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

TINY_RTDETR = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],   # 2 P3/8
        [-1, 1, "Conv", [32, 3, 2]],   # 3 P4/16
        [-1, 1, "Conv", [32, 3, 2]],   # 4 P5/32
    ],
    # nc, hd, nq, ndl, d_ffn (parser extras shrink the decoder for tests)
    "head": [[[2, 3, 4], 1, "RTDETRDecoder", [3, 64, 30, 2, 64]]],
}


class TestLAP:
    def test_matches_scipy_optimal_cost(self):
        from scipy.optimize import linear_sum_assignment as scipy_lsa

        from yolo_ad_refine_tpu.ops.lap import linear_sum_assignment

        rng = np.random.default_rng(7)
        c = rng.standard_normal((3, 12, 40)).astype(np.float32) * 5
        ours = np.asarray(linear_sum_assignment(jnp.asarray(c)))
        for b in range(3):
            ri, ci = scipy_lsa(c[b])
            assert len(set(ours[b].tolist())) == 12  # distinct columns
            assert np.isclose(c[b][np.arange(12), ours[b]].sum(),
                              c[b][ri, ci].sum(), atol=1e-3)

    def test_masked_rows_do_not_distort(self):
        from scipy.optimize import linear_sum_assignment as scipy_lsa

        from yolo_ad_refine_tpu.ops.lap import linear_sum_assignment

        rng = np.random.default_rng(3)
        c = rng.standard_normal((1, 8, 20)).astype(np.float32)
        mask = np.zeros((1, 8), np.float32)
        mask[0, :4] = 1
        res = np.asarray(linear_sum_assignment(jnp.asarray(c), jnp.asarray(mask)))[0]
        ri, ci = scipy_lsa(c[0, :4])
        assert np.isclose(c[0][np.arange(4), res[:4]].sum(), c[0, :4][ri, ci].sum(),
                          atol=1e-3)


class TestCDN:
    def test_group_layout_and_mask(self):
        from yolo_ad_refine_tpu.train.rtdetr import (
            build_dn_attn_blocked, make_cdn_group, make_dn_config,
        )

        cfg = make_dn_config(max_boxes=8, num_dn=32)  # 4 groups of 8
        assert cfg.num_group == 4 and cfg.ndn == 64
        blocked = build_dn_attn_blocked(cfg, nq=30)
        assert blocked.shape == (94, 94)
        # match queries cannot see dn; dn can see match queries
        assert blocked[64:, :64].all() and not blocked[:64, 64:].any()
        # groups mutually blind, self-visible
        assert blocked[0, 16] and not blocked[0, 8]  # g0 pos -> g1 blocked, g0 neg ok

        rng = np.random.default_rng(0)
        cls = rng.integers(0, 3, (2, 8, 1)).astype(np.float32)
        bboxes = np.tile(np.asarray([8.0, 8.0, 40.0, 40.0], np.float32), (2, 8, 1))
        mask = np.concatenate([np.ones((2, 3, 1)), np.zeros((2, 5, 1))], 1).astype(np.float32)
        dn = make_cdn_group(jnp.asarray(cls), jnp.asarray(bboxes), jnp.asarray(mask),
                            jax.random.PRNGKey(0), nc=3, imgsz=64.0, cfg=cfg,
                            attn_blocked=jnp.asarray(blocked))
        assert dn["cls"].shape == (2, 64)
        assert dn["bbox_logit"].shape == (2, 64, 4)
        # validity mirrors the gt mask per slot
        v = np.asarray(dn["valid"]).reshape(2, 4, 2, 8)
        assert (v[:, :, :, :3] == 1).all() and (v[:, :, :, 3:] == 0).all()
        # negative slots are noised harder than positives on average
        bl = np.asarray(dn["bbox_logit"]).reshape(2, 4, 2, 8, 4)
        gt_logit = np.log(np.asarray([0.375, 0.375, 0.5, 0.5]) /
                          (1 - np.asarray([0.375, 0.375, 0.5, 0.5])))
        dev = np.abs(bl[:, :, :, :3] - gt_logit)
        assert dev[:, :, 1].mean() > dev[:, :, 0].mean()


class TestRTDETRTraining:
    @pytest.fixture(scope="class")
    def model(self):
        from yolo_ad_refine_tpu.models.model import DetectionModel

        m = DetectionModel(TINY_RTDETR, nc=3)
        m.init(jax.random.PRNGKey(0), imgsz=64)
        return m

    def test_loss_decreases_with_denoising(self, model):
        import optax

        from yolo_ad_refine_tpu.train.rtdetr import (
            RTDETRLoss, build_dn_attn_blocked, make_cdn_group,
        )
        from yolo_ad_refine_tpu.train.step import TrainState, make_train_step

        max_boxes = 8
        loss_fn = RTDETRLoss(nc=3, nq=30, imgsz=64, max_boxes=max_boxes)
        attn = jnp.asarray(build_dn_attn_blocked(loss_fn.dn_cfg, 30))
        dn_fn = lambda batch, rng: make_cdn_group(  # noqa: E731
            batch["cls"], batch["bboxes"], batch["mask"], rng,
            nc=3, imgsz=64.0, cfg=loss_fn.dn_cfg, attn_blocked=attn,
        )
        tx = optax.sgd(0.01, momentum=0.9)
        step = jax.jit(make_train_step(model.graph, loss_fn, tx, dn_fn=dn_fn),
                       donate_argnums=0)
        # deep-copy: donation would otherwise free the class-scoped fixture's
        # buffers (state.params aliases model.variables)
        state = TrainState.create(jax.tree.map(jnp.array, model.variables), tx)
        r = np.random.default_rng(0)
        batch = {
            "img": r.random((2, 64, 64, 3), dtype=np.float32),
            "cls": r.integers(0, 3, (2, max_boxes, 1)).astype(np.float32),
            "bboxes": np.tile(np.asarray([8.0, 8.0, 40.0, 40.0], np.float32),
                              (2, max_boxes, 1)),
            "mask": np.concatenate(
                [np.ones((2, 3, 1)), np.zeros((2, 5, 1))], 1
            ).astype(np.float32),
        }
        losses = []
        for i in range(4):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_eval_contract(self, model):
        y, raw = model.graph.apply(model.variables,
                                   jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
        assert y.shape == (1, 30, 4 + 3)
        assert len(raw) == 4  # (dec_b, dec_s, enc_b, enc_s)
        # normalized xywh + sigmoid scores
        assert float(jnp.max(y[..., :4])) <= 1.5 and float(jnp.min(y[..., 4:])) >= 0.0


class TestDETRLossParityShape:
    def test_loss_value_against_torch_formulas(self):
        """Cross-check one level's class/bbox/giou math against a direct torch
        transcription of the reference formulas on a fixed random problem."""
        import torch

        from yolo_ad_refine_tpu.train.rtdetr import RTDETRLoss

        rng = np.random.default_rng(0)
        b, nq, nc, m = 2, 12, 3, 4
        pred_b = rng.uniform(0.2, 0.8, (b, nq, 4)).astype(np.float32)
        pred_s = rng.standard_normal((b, nq, nc)).astype(np.float32)
        gt_cls = rng.integers(0, nc, (b, m)).astype(np.float32)
        gt_xywh = rng.uniform(0.3, 0.6, (b, m, 4)).astype(np.float32)
        gt_mask = np.ones((b, m), np.float32)
        gt_mask[1, 2:] = 0

        loss = RTDETRLoss(nc=nc, nq=nq, imgsz=1.0, max_boxes=m, use_vfl=False)
        match_q = loss.match(jnp.asarray(pred_b), jnp.asarray(pred_s),
                             jnp.asarray(gt_cls), jnp.asarray(gt_xywh),
                             jnp.asarray(gt_mask))
        lc, lb, lg = loss.level_loss(jnp.asarray(pred_b), jnp.asarray(pred_s),
                                     jnp.asarray(gt_cls), jnp.asarray(gt_xywh),
                                     jnp.asarray(gt_mask), match_q)

        # torch reference math (focal path, loss.py:66-104)
        mq = np.asarray(match_q)
        num = int(gt_mask.sum())
        tgt = np.full((b, nq), nc, np.int64)
        pb_list, gb_list = [], []
        for bi in range(b):
            for j in range(m):
                if gt_mask[bi, j]:
                    tgt[bi, mq[bi, j]] = int(gt_cls[bi, j])
                    pb_list.append(pred_b[bi, mq[bi, j]])
                    gb_list.append(gt_xywh[bi, j])
        one_hot = torch.zeros((b, nq, nc + 1))
        one_hot.scatter_(2, torch.tensor(tgt).unsqueeze(-1), 1)
        one_hot = one_hot[..., :-1]
        ps = torch.tensor(pred_s)
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            ps, one_hot, reduction="none")
        p = ps.sigmoid()
        p_t = one_hot * p + (1 - one_hot) * (1 - p)
        fl = bce * (1 - p_t) ** 1.5 * (one_hot * 0.25 + (1 - one_hot) * 0.75)
        ref_cls = float(fl.mean(1).sum() / max(num, 1) * nq)
        pb_t = torch.tensor(np.asarray(pb_list))
        gb_t = torch.tensor(np.asarray(gb_list))
        ref_l1 = float(torch.nn.functional.l1_loss(pb_t, gb_t, reduction="sum") / num) * 5
        assert np.isclose(float(lc), ref_cls, rtol=1e-4), (float(lc), ref_cls)
        assert np.isclose(float(lb), ref_l1, rtol=1e-4), (float(lb), ref_l1)
        assert np.isfinite(float(lg))
