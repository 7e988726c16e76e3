"""Loss-stage decomposition on the real TPU (chained-truth method).

bench_assigner.py shows loss fwd ~= 20.7 ms at (B16, A8400, N64, nc80) of
which the assigner alone is ~2.9 ms. This isolates where the rest goes:

  feats_prep   cast f32 + reshape/concat + softmax-EV decode
  assign_metrics  in-gts mask + class-score gather + (B,N,A) CIoU
  topk         the iterated-argmax topk on (B,N,A)
  assigner     full assigner (= metrics + topk + resolve/gather/normalize)
  post_fixed   loss body with assigner outputs held constant
  full         the whole DetectionLoss forward

Usage: python benchmarks/bench_loss_decomp.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))

from yolo_ad_refine_tpu.ops.anchors import dist2bbox, make_anchors
from yolo_ad_refine_tpu.ops.iou import bbox_iou
from yolo_ad_refine_tpu.train.loss import DetectionLoss
from yolo_ad_refine_tpu.train import tal

B, A, N, NC = 16, 8400, 64, 80
STRIDES = (8, 16, 32)
NO = NC + 64


def chained(make_fn, label, k=8):
    def runner(kk):
        @jax.jit
        def go(c0):
            return jax.lax.fori_loop(0, kk, lambda i, c: make_fn(c), c0)

        float(go(jnp.float32(0.0)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(go(jnp.float32(1e-6)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = runner(1)
    tk = runner(k)
    ms = (tk - t1) / (k - 1) * 1e3
    print(f"[{label}] k=1 {t1*1e3:.1f} ms, k={k} {tk*1e3:.1f} ms -> {ms:.2f} ms/iter",
          flush=True)
    return ms


def main():
    r = np.random.default_rng(0)
    feats = [
        jnp.asarray(r.standard_normal((B, 640 // s, 640 // s, NO)).astype(np.float32))
        for s in STRIDES
    ]
    gt_labels = jnp.asarray(r.integers(0, NC, (B, N, 1)), jnp.float32)
    wh = r.random((B, N, 2), np.float32) * 100 + 8
    xy = r.random((B, N, 2), np.float32) * 500
    gt_bboxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    mask_gt = jnp.asarray((r.random((B, N, 1)) > 0.3).astype(np.float32))

    loss_fn = DetectionLoss(nc=NC, strides=STRIDES)
    shapes = [(640 // s, 640 // s) for s in STRIDES]
    anchor_points, stride_tensor = make_anchors(shapes, STRIDES, 0.5)

    # --- stage inputs precomputed once (held constant inside chains below)
    def prep(feats):
        flat = [f.reshape(B, -1, NO).astype(jnp.float32) for f in feats]
        x = jnp.concatenate(flat, axis=1)
        pred_distri, pred_scores = x[..., :64], x[..., 64:]
        dist = pred_distri.reshape(B, -1, 4, 16)
        dist = jnp.einsum("banr,r->ban", jax.nn.softmax(dist, axis=-1),
                          jnp.arange(16, dtype=jnp.float32))
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)
        return pred_distri, pred_scores, pred_bboxes

    pred_distri0, pred_scores0, pred_bboxes0 = jax.jit(prep)(feats)
    pd_scores0 = jax.nn.sigmoid(pred_scores0)
    pd_pix0 = pred_bboxes0 * stride_tensor[None]
    anc_pix = anchor_points * stride_tensor
    assign0 = jax.jit(lambda: loss_fn.assigner(
        pd_scores0, pd_pix0, anc_pix, gt_labels, gt_bboxes, mask_gt))()

    # 1. feats prep
    def feats_prep(c):
        fs = [f + c.astype(f.dtype) * 0 for f in feats]
        _, ps, pb = prep(fs)
        return (jnp.sum(ps) + jnp.sum(pb)).astype(jnp.float32) * 1e-9 + c

    chained(feats_prep, "feats_prep")

    # 2. assigner metrics only (in-gts mask + score gather + CIoU + align)
    def assign_metrics(c):
        ps = pd_scores0 + c * 0
        valid = tal.select_candidates_in_gts(anc_pix, gt_bboxes) & (mask_gt[..., 0] > 0)[..., None]
        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, NC - 1)
        bbox_scores = jnp.take_along_axis(ps.transpose(0, 2, 1), labels[:, :, None], axis=1)
        bbox_scores = jnp.where(valid, bbox_scores, 0.0)
        overlaps = bbox_iou(gt_bboxes[:, :, None, :], pd_pix0[:, None, :, :], xywh=False, CIoU=True)
        overlaps = jnp.where(valid, jnp.clip(overlaps, 0.0, None), 0.0)
        am = bbox_scores**0.5 * overlaps**6.0
        return jnp.sum(am).astype(jnp.float32) * 1e-9 + c

    chained(assign_metrics, "assign_metrics")

    # 3. topk alone on a precomputed metric tensor
    valid0 = jax.jit(lambda: tal.select_candidates_in_gts(anc_pix, gt_bboxes)
                     & (mask_gt[..., 0] > 0)[..., None])()
    am0 = jax.jit(lambda: jnp.where(valid0, r.random((B, N, A)).astype(np.float32), 0.0))()
    tmask = jnp.broadcast_to((mask_gt[..., :1] > 0), (B, N, 10))

    def topk_only(c):
        m = am0 + c * 0
        sel = tal._select_topk_candidates(m, 10, tmask)
        return jnp.sum(sel).astype(jnp.float32) * 1e-9 + c

    chained(topk_only, "topk_only")

    # 4. full assigner
    def assigner_full(c):
        res = loss_fn.assigner(pd_scores0 + c * 0, pd_pix0, anc_pix,
                               gt_labels, gt_bboxes, mask_gt)
        return jnp.sum(res.target_scores).astype(jnp.float32) * 1e-9 + c

    chained(assigner_full, "assigner_full")

    # 5. loss body with assigner outputs fixed
    def post_fixed(c):
        pred_scores = pred_scores0 + c * 0
        pred_bboxes = pred_bboxes0 + c * 0
        pred_distri = pred_distri0 + c * 0
        target_bboxes_g = assign0.target_bboxes / stride_tensor[None]
        weight = jnp.sum(assign0.target_scores, axis=-1) * assign0.fg_mask
        tss = jnp.maximum(jnp.sum(assign0.target_scores), 1.0)
        iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)
        loss_box = jnp.sum((1.0 - iou) * weight) / tss
        from yolo_ad_refine_tpu.ops.iou import wasserstein_similarity
        nwd = wasserstein_similarity(pred_bboxes, target_bboxes_g)
        loss_box = 0.5 * loss_box + 0.5 * jnp.sum((1.0 - nwd) * weight) / tss
        from yolo_ad_refine_tpu.ops.anchors import bbox2dist
        from yolo_ad_refine_tpu.train.loss import bce_with_logits, dfl_loss, slide_weight
        target_ltrb = bbox2dist(anchor_points[None], target_bboxes_g, 15)
        ldfl = dfl_loss(pred_distri.reshape(B, -1, 4, 16), target_ltrb, 16)
        loss_dfl = jnp.sum(ldfl * weight) / tss
        bce = bce_with_logits(pred_scores, assign0.target_scores)
        n_fg = jnp.maximum(jnp.sum(assign0.fg_mask), 1.0)
        auto_iou = jnp.sum(jax.lax.stop_gradient(iou) * assign0.fg_mask) / n_fg
        bce = bce * slide_weight(assign0.target_scores, auto_iou)
        loss_cls = jnp.sum(bce) / tss
        return (loss_box * 7.5 + loss_cls * 0.5 + loss_dfl * 1.5).astype(jnp.float32) * 1e-9 + c

    chained(post_fixed, "post_fixed")

    # 6. full loss
    def full(c):
        fs = [f + c.astype(f.dtype) * 0 for f in feats]
        return loss_fn(fs, gt_labels, gt_bboxes, mask_gt).total.astype(jnp.float32) * 1e-9 + c

    chained(full, "full")


if __name__ == "__main__":
    main()
