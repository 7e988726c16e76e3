"""TAL assigner + loss-stage microbench on the real TPU (chained-truth).

train_decomp.py showed loss fwd+bwd on frozen feats = ~31 ms of the 61 ms
step. This decomposes that: assigner alone, full loss fwd, full loss
fwd+bwd, at the training shapes (B=16, A=8400, N=64, nc=80).

Usage: python benchmarks/bench_assigner.py [--sort]
  --sort  A/B: patch in the reference sort+one-hot topk formulation
          (tal._select_topk_candidates_sort) instead of the shipping
          iterated-argmax one.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))

from yolo_ad_refine_tpu.train.loss import DetectionLoss
from yolo_ad_refine_tpu.train.tal import TaskAlignedAssigner

B, A, N, NC = 16, 8400, 64, 80
STRIDES = (8, 16, 32)


def chained(make_fn, label, k=8):
    def runner(kk):
        @jax.jit
        def go(c0):
            return jax.lax.fori_loop(0, kk, lambda i, c: make_fn(c), c0)

        float(go(jnp.float32(0.0)))  # compile + settle
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
    if "--sort" in sys.argv:
        import yolo_ad_refine_tpu.train.tal as tal

        tal._select_topk_candidates = tal._select_topk_candidates_sort
        print("[A/B] using sort+one-hot topk formulation", flush=True)
    r = np.random.default_rng(0)
    pd_scores = jnp.asarray(r.random((B, A, NC), np.float32))
    pd_bboxes = jnp.asarray(r.random((B, A, 4), np.float32) * 640)
    anc = jnp.asarray(r.random((A, 2), np.float32) * 640)
    gt_labels = jnp.asarray(r.integers(0, NC, (B, N, 1)), jnp.float32)
    wh = r.random((B, N, 2), np.float32) * 100 + 8
    xy = r.random((B, N, 2), np.float32) * 500
    gt_bboxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    mask_gt = jnp.asarray((r.random((B, N, 1)) > 0.3).astype(np.float32))

    assigner = TaskAlignedAssigner(topk=10, num_classes=NC)

    def assigner_only(c):
        res = assigner(pd_scores + c * 0, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt)
        return jnp.sum(res.target_scores).astype(jnp.float32) * 1e-9 + c

    chained(assigner_only, "assigner fwd (B16,A8400,N64)")

    # full loss on synthetic per-level feats
    loss_fn = DetectionLoss(nc=NC, strides=STRIDES)
    feats = [
        jnp.asarray(r.standard_normal((B, 640 // s, 640 // s, 144), np.float32).astype(np.float32))
        for s in STRIDES
    ]
    cls = gt_labels
    mask = mask_gt

    def loss_fwd(c):
        fs = [f + c.astype(f.dtype) * 0 for f in feats]
        return loss_fn(fs, cls, gt_bboxes, mask).total.astype(jnp.float32) * 1e-9 + c

    chained(loss_fwd, "loss fwd")

    def loss_bwd(c):
        def f(fs):
            fs = [a + c.astype(a.dtype) * 0 for a in fs]
            return loss_fn(fs, cls, gt_bboxes, mask).total

        val, g = jax.value_and_grad(f)(feats)
        return val.astype(jnp.float32) * 1e-9 + jnp.sum(g[0]).astype(jnp.float32) * 1e-9 + c

    chained(loss_bwd, "loss fwd+bwd")


if __name__ == "__main__":
    main()
