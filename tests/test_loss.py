"""Loss + assigner tests (parity surface: reference utils/loss.py, utils/tal.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.anchors import make_anchors
from yolo_ad_refine_tpu.train.loss import DetectionLoss, bce_with_logits, dfl_loss, slide_weight
from yolo_ad_refine_tpu.train.tal import TaskAlignedAssigner

NC = 4
STRIDES = (8, 16, 32)


def make_feats(b=2, imgsz=64, nc=NC, seed=0, bias=0.0):
    r = np.random.default_rng(seed)
    feats = []
    for s in STRIDES:
        h = imgsz // s
        f = r.normal(0, 0.5, (b, h, h, 64 + nc)).astype(np.float32)
        f[..., 64:] += bias
        feats.append(jnp.asarray(f))
    return feats


def make_targets(b=2, n=8, imgsz=64, seed=1):
    r = np.random.default_rng(seed)
    labels = r.integers(0, NC, (b, n, 1)).astype(np.float32)
    xy = r.uniform(4, imgsz - 24, (b, n, 2))
    wh = r.uniform(8, 20, (b, n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    mask = (r.uniform(size=(b, n, 1)) > 0.3).astype(np.float32)
    boxes = boxes * mask
    return jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(mask)


class TestComponents:
    def test_bce_matches_manual(self):
        r = np.random.default_rng(0)
        x = r.normal(size=(10,)).astype(np.float32)
        t = r.uniform(size=(10,)).astype(np.float32)
        ours = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
        p = 1 / (1 + np.exp(-x))
        ref = -(t * np.log(p) + (1 - t) * np.log(1 - p))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_slide_weight_regions(self):
        # auto_iou = 0.5: targets below 0.4 -> 1.0; 0.45 -> e^0.5; 0.9 -> e^0.1
        t = jnp.asarray([0.1, 0.45, 0.9])
        w = np.asarray(slide_weight(t, jnp.asarray(0.5)))
        np.testing.assert_allclose(w, [1.0, np.e**0.5, np.e**0.1], atol=1e-5)

    def test_slide_weight_clamps_low_iou(self):
        w1 = np.asarray(slide_weight(jnp.asarray([0.3]), jnp.asarray(0.05)))
        w2 = np.asarray(slide_weight(jnp.asarray([0.3]), jnp.asarray(0.2)))
        np.testing.assert_allclose(w1, w2)

    def test_dfl_loss_minimal_at_target(self):
        # logits peaked at the true bin -> lower loss than uniform
        reg_max = 16
        target = jnp.asarray([[3.0, 7.5, 0.2, 14.0]])
        peaked = jax.nn.one_hot(jnp.floor(target).astype(int), reg_max) * 10.0
        uniform = jnp.zeros((1, 4, reg_max))
        assert float(dfl_loss(peaked, target).squeeze()) < float(dfl_loss(uniform, target).squeeze())

    def test_dfl_hat_equals_gather_formulation(self):
        """The shipping gather-free hat DFL == the literal two-gather
        reference formulation, values AND gradients, incl. integer and
        boundary targets."""
        from yolo_ad_refine_tpu.train.loss import _dfl_loss_gather

        r = np.random.default_rng(3)
        pd = jnp.asarray(r.normal(0, 2, (2, 50, 4, 16)).astype(np.float32))
        t = r.uniform(0, 15, (2, 50, 4)).astype(np.float32)
        t[0, 0] = [0.0, 3.0, 15.0, 14.999]  # exact-bin + boundary targets
        t = jnp.asarray(t)
        a, ga = jax.value_and_grad(lambda p: jnp.sum(dfl_loss(p, t)))(pd)
        b, gb = jax.value_and_grad(lambda p: jnp.sum(_dfl_loss_gather(p, t)))(pd)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)


class TestAssigner:
    def test_obvious_assignment(self):
        """A single GT box: its inside-anchors with high class score get assigned."""
        imgsz = 64
        shapes = [(imgsz // s, imgsz // s) for s in STRIDES]
        anchors, stride_t = make_anchors(shapes, STRIDES)
        anc_px = np.asarray(anchors * stride_t)
        a = anc_px.shape[0]

        gt_box = np.array([[[8.0, 8.0, 40.0, 40.0]]], np.float32)  # one gt
        gt_lbl = np.array([[[2.0]]], np.float32)
        mask = np.ones((1, 1, 1), np.float32)

        scores = np.full((1, a, NC), 0.01, np.float32)
        inside = (
            (anc_px[:, 0] > 8) & (anc_px[:, 0] < 40) & (anc_px[:, 1] > 8) & (anc_px[:, 1] < 40)
        )
        scores[0, inside, 2] = 0.9
        pd_boxes = np.tile(np.concatenate([anc_px - 8, anc_px + 8], -1)[None], (1, 1, 1)).astype(
            np.float32
        )

        assigner = TaskAlignedAssigner(topk=10, num_classes=NC)
        res = assigner(
            jnp.asarray(scores), jnp.asarray(pd_boxes), jnp.asarray(anc_px),
            jnp.asarray(gt_lbl), jnp.asarray(gt_box), jnp.asarray(mask),
        )
        fg = np.asarray(res.fg_mask[0])
        assert fg.sum() > 0
        assert not fg[~inside].any()  # no anchor outside the gt is foreground
        assert (np.asarray(res.target_labels[0])[fg] == 2).all()
        tb = np.asarray(res.target_bboxes[0])[fg]
        np.testing.assert_allclose(tb, np.tile(gt_box[0, 0], (tb.shape[0], 1)), atol=1e-4)

    def test_topk_iterated_argmax_equals_sort_formulation(self):
        """The shipping iterated-argmax topk must select the identical mask
        as the reference's sort + one-hot duplicate-drop formulation,
        including masked rows, sub-topk rows, and exact value ties."""
        from yolo_ad_refine_tpu.train.tal import (
            _select_topk_candidates, _select_topk_candidates_sort)

        r = np.random.default_rng(7)
        b, n, a, k = 3, 8, 120, 10
        m = r.random((b, n, a)).astype(np.float32)
        m[m < 0.55] = 0.0              # plenty of exact zero-ties
        m[0, 1] = 0.0                  # a row with no positive metric
        m[1, 2, :4] = 0.25             # positive ties within a row
        row_mask = (r.random((b, n)) > 0.3)
        topk_mask = np.broadcast_to(row_mask[..., None], (b, n, k))
        got = np.asarray(_select_topk_candidates(jnp.asarray(m), k, jnp.asarray(topk_mask)))
        want = np.asarray(_select_topk_candidates_sort(jnp.asarray(m), k, jnp.asarray(topk_mask)))
        # the formulations may differ only on zero-metric picks, which the
        # caller multiplies away by the inside-GT validity mask (metric>0)
        valid = m > 0
        np.testing.assert_array_equal(got * valid, want * valid)
        # and on strictly-positive rows with >= k candidates they are equal
        # outright (both orderings are value-desc / index-asc)
        full_rows = (valid.sum(-1) >= k) & row_mask
        np.testing.assert_array_equal(got[full_rows], want[full_rows])

    @pytest.mark.slow
    def test_empty_gt(self):
        imgsz = 64
        shapes = [(imgsz // s, imgsz // s) for s in STRIDES]
        anchors, stride_t = make_anchors(shapes, STRIDES)
        anc_px = anchors * stride_t
        a = anc_px.shape[0]
        assigner = TaskAlignedAssigner(topk=10, num_classes=NC)
        res = assigner(
            jnp.full((1, a, NC), 0.5), jnp.zeros((1, a, 4)), anc_px,
            jnp.zeros((1, 3, 1)), jnp.zeros((1, 3, 4)), jnp.zeros((1, 3, 1)),
        )
        assert not bool(res.fg_mask.any())
        np.testing.assert_allclose(np.asarray(res.target_scores), 0.0)


class TestDetectionLoss:
    def setup_method(self):
        self.loss = DetectionLoss(nc=NC, strides=STRIDES)

    @pytest.mark.slow
    def test_finite_and_positive(self):
        feats = make_feats()
        labels, boxes, mask = make_targets()
        out = self.loss(feats, labels, boxes, mask)
        assert np.isfinite(float(out.total))
        assert float(out.total) > 0
        assert np.isfinite(np.asarray(out.components)).all()

    @pytest.mark.slow
    def test_empty_targets(self):
        feats = make_feats()
        labels, boxes, mask = make_targets()
        out = self.loss(feats, labels, boxes, mask * 0.0)
        assert np.isfinite(float(out.total))
        comps = np.asarray(out.components)
        assert comps[0] == 0.0 and comps[2] == 0.0  # no box/dfl loss without fg

    @pytest.mark.slow
    def test_gradients_flow(self):
        labels, boxes, mask = make_targets()
        feats = make_feats()

        def f(feats):
            return self.loss(feats, labels, boxes, mask).total

        grads = jax.grad(f)(feats)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).sum()) > 0

    @pytest.mark.slow
    def test_better_predictions_lower_loss(self):
        """Feats whose cls logits are peaked on correct targets should score
        lower cls loss than random ones."""
        labels, boxes, mask = make_targets(seed=5)
        feats_rand = make_feats(seed=6, bias=0.0)
        feats_conf = [f - 6.0 for f in make_feats(seed=6)]  # low obj scores everywhere
        out_rand = self.loss(feats_rand, labels, boxes, mask)
        out_conf = self.loss(feats_conf, labels, boxes, mask)
        # suppressing background logits reduces cls loss
        assert float(out_conf.components[1]) < float(out_rand.components[1])

    @pytest.mark.slow
    def test_jit_compiles(self):
        labels, boxes, mask = make_targets()
        feats = make_feats()
        jitted = jax.jit(lambda f, l, b, m: self.loss(f, l, b, m).total)
        v1 = float(jitted(feats, labels, boxes, mask))
        v2 = float(self.loss(feats, labels, boxes, mask).total)
        assert v1 == pytest.approx(v2, rel=1e-4)
