"""Chained-truth flagship forward / train-step timing on the real TPU.

The headline measurement behind bench.py, made reproducible: chain k
data-dependent iterations inside ONE executable (lax.fori_loop folding
sum(y)*0 back into the input) and report (T_k - T_1)/(k - 1), which cancels
dispatch overhead and the axon tunnel's request coalescing exactly
(docs/performance.md "How to measure").

Usage:
    YAT_DCN_IMPL=mxu2 python benchmarks/bench_flagship.py [--what infer,train]
        [--batch 32] [--imgsz 640] [--k 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def chained_ms(make_step, k, label):
    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, k, lambda i, c: make_step(c), c0)

    t0 = time.perf_counter()
    float(run(jnp.float32(0.0)))
    print(f"  [{label} k={k}] compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(jnp.float32(1e-6)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure(make_step, label, k=6):
    t1 = chained_ms(make_step, 1, label)
    tk = chained_ms(make_step, k, label)
    ms = (tk - t1) / (k - 1) * 1000
    print(f"[{label}] k=1 {t1*1e3:.1f} ms, k={k} {tk*1e3:.1f} ms "
          f"-> {ms:.2f} ms/iter", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="infer")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--train-batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--k", type=int, default=6)
    args = ap.parse_args()

    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    print(f"DCN impl: {os.environ.get('YAT_DCN_IMPL', 'auto')}, "
          f"device {jax.devices()[0]}", flush=True)
    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16, imgsz=256)

    if "infer" in args.what:
        x0 = jnp.asarray(
            np.random.default_rng(0).random(
                (args.batch, args.imgsz, args.imgsz, 3), dtype=np.float32),
            jnp.bfloat16)
        variables = model.variables

        def step(c):
            y, _ = model.apply(
                variables, x0 + c.astype(x0.dtype) * 0, train=False)
            return jnp.sum(y).astype(jnp.float32) * 1e-12 + c

        print(f"stem s2d rewrite: {model.stem_s2d_chans is not None and __import__('yolo_ad_refine_tpu.ops.s2d_stem', fromlist=['x']).stem_s2d_enabled()}",
              flush=True)

        ms = measure(step, f"infer bs{args.batch}/{args.imgsz}", args.k)
        print(f"INFER {args.batch / ms * 1000:.1f} img/s "
              f"({ms / args.batch:.3f} ms/img)", flush=True)

    if "train" in args.what:
        from yolo_ad_refine_tpu.train.loss import DetectionLoss
        from yolo_ad_refine_tpu.train.optim import build_optimizer
        from yolo_ad_refine_tpu.train.step import TrainState, make_train_step

        B, MAXB = args.train_batch, 64
        loss_fn = DetectionLoss(nc=model.nc, strides=model.strides)
        tx, _, _ = build_optimizer(model.variables["params"], lr0=0.01,
                                   epochs=100, nb=100, batch=B, nbs=B)
        state = TrainState.create(model.variables, tx)
        tstep = make_train_step(model.graph, loss_fn, tx)
        r = np.random.default_rng(0)
        batch = {
            "img": jnp.asarray(
                r.random((B, args.imgsz, args.imgsz, 3), dtype=np.float32)),
            "cls": jnp.asarray(r.integers(0, model.nc, (B, MAXB, 1)),
                               jnp.float32),
            "bboxes": jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0],
                                           jnp.float32), (B, MAXB, 1)),
            "mask": jnp.ones((B, MAXB, 1), jnp.float32),
        }
        rng = jax.random.PRNGKey(0)

        # carry the state through the chain: each iteration is a REAL
        # dependent step (params feed forward), so nothing coalesces
        from functools import partial

        @partial(jax.jit, static_argnums=1)
        def run_k(state, k):
            def body(i, s):
                s2, m = tstep(s, batch, jax.random.fold_in(rng, i))
                return s2
            return jax.lax.fori_loop(0, k, body, state)

        def timed(k):
            t0 = time.perf_counter()
            s = run_k(state, k)
            float(jnp.sum(jax.tree.leaves(s.params)[0]))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(1)
        print(f"  [train k-var] compile {time.perf_counter()-t0:.1f}s",
              flush=True)
        timed(args.k)
        ts = []
        for _ in range(3):
            t1 = timed(1)
            tk = timed(args.k)
            ts.append((tk - t1) / (args.k - 1) * 1000)
        ms = float(np.median(ts))
        print(f"TRAIN step {ms:.1f} ms bs{B} "
              f"({B / ms * 1000:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
