"""post_fixed-stage decomposition: which loss-body op costs 19 ms?

Candidates at (B16, A8400): DFL's two take_along_axis gathers over
(B,A,4,16) — TPU gathers run at scalar rate — vs the BCE+slide pass over
(B,A,80) vs the box CIoU/NWD pair. Also A/Bs a gather-free DFL that
expresses the two-bin cross-entropy as hat weights max(0, 1-|t-r|).

Usage: python benchmarks/bench_loss_post.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))

from yolo_ad_refine_tpu.ops.anchors import bbox2dist, make_anchors
from yolo_ad_refine_tpu.ops.iou import bbox_iou, wasserstein_similarity
from yolo_ad_refine_tpu.train.loss import (
    _dfl_loss_gather, bce_with_logits, dfl_loss, slide_weight)

B, A, NC = 16, 8400, 80
STRIDES = (8, 16, 32)


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


dfl_hat = dfl_loss  # the shipping version IS the hat formulation now


def main():
    r = np.random.default_rng(0)
    pred_scores = jnp.asarray(r.standard_normal((B, A, NC)).astype(np.float32))
    pred_distri = jnp.asarray(r.standard_normal((B, A, 4, 16)).astype(np.float32))
    pred_bboxes = jnp.asarray(r.random((B, A, 4), np.float32) * 80)
    target_bboxes_g = jnp.asarray(r.random((B, A, 4), np.float32) * 80)
    target_scores = jnp.asarray((r.random((B, A, NC)) < 0.01).astype(np.float32) * 0.7)
    fg = jnp.asarray((r.random((B, A)) < 0.02).astype(np.float32))
    weight = jnp.sum(target_scores, -1) * fg
    tss = jnp.maximum(jnp.sum(target_scores), 1.0)
    shapes = [(640 // s, 640 // s) for s in STRIDES]
    anchor_points, _ = make_anchors(shapes, STRIDES, 0.5)
    tl = jax.jit(lambda: bbox2dist(anchor_points[None], target_bboxes_g, 15))()

    def box_pair(c):
        pb = pred_bboxes + c * 0
        iou = bbox_iou(pb, target_bboxes_g, xywh=False, CIoU=True)
        nwd = wasserstein_similarity(pb, target_bboxes_g)
        lb = jnp.sum((1.0 - iou) * weight) / tss + jnp.sum((1.0 - nwd) * weight) / tss
        return lb.astype(jnp.float32) * 1e-9 + c

    chained(box_pair, "box ciou+nwd")

    def dfl_gather(c):
        pd = pred_distri + c * 0
        return (jnp.sum(_dfl_loss_gather(pd, tl, 16) * weight) / tss).astype(jnp.float32) * 1e-9 + c

    chained(dfl_gather, "dfl gather (take_along_axis)")

    def dfl_hat_fn(c):
        pd = pred_distri + c * 0
        return (jnp.sum(dfl_hat(pd, tl, 16) * weight) / tss).astype(jnp.float32) * 1e-9 + c

    chained(dfl_hat_fn, "dfl hat (gather-free)")

    def bce_slide(c):
        ps = pred_scores + c * 0
        bce = bce_with_logits(ps, target_scores)
        bce = bce * slide_weight(target_scores, jnp.float32(0.4))
        return (jnp.sum(bce) / tss).astype(jnp.float32) * 1e-9 + c

    chained(bce_slide, "bce+slide")

    def bbox2dist_only(c):
        tb = target_bboxes_g + c * 0
        return jnp.sum(bbox2dist(anchor_points[None], tb, 15)).astype(jnp.float32) * 1e-9 + c

    chained(bbox2dist_only, "bbox2dist")

    # numerical check on TPU too
    a = jax.jit(lambda: _dfl_loss_gather(pred_distri, tl, 16))()
    b = jax.jit(lambda: dfl_hat(pred_distri, tl, 16))()
    print("max |gather - hat| =", float(jnp.max(jnp.abs(a - b))), flush=True)


if __name__ == "__main__":
    main()
