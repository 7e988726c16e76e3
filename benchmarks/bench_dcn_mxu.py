"""Chained-executable timing of DCN formulations on the real TPU.

Ground-truth method (docs/performance.md): chain k data-dependent iterations
inside ONE executable via lax.fori_loop (fold sum(y)*0 back into x), time
k=1 vs k=K with forced float() readbacks, report (T_K - T_1)/(K - 1).

Run: python benchmarks/bench_dcn_mxu.py [--levels P3,P4,P5] [--what fwd,bwd]
     [--variants exact,pallas,mxu]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from yolo_ad_refine_tpu.ops.deform import modulated_deform_conv2d  # noqa: E402
from yolo_ad_refine_tpu.ops.deform_pallas import (  # noqa: E402
    modulated_deform_conv2d_pallas,
)
from yolo_ad_refine_tpu.ops.deform_mxu import (  # noqa: E402
    modulated_deform_conv2d_mxu,
)
from yolo_ad_refine_tpu.ops.deform_mxu2 import (  # noqa: E402
    modulated_deform_conv2d_mxu2,
)

LEVELS = {"P3": (80, 80), "P4": (40, 40), "P5": (20, 20)}
C = 64
B = 32
KCHAIN = 6


def chained(fn, k):
    @jax.jit
    def run(x, off, mask, w):
        def body(i, x):
            y = fn(x, off, mask, w)
            return x + jnp.sum(y).astype(x.dtype) * 0
        x = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(x)
    return run


def measure(fn, args, label):
    r1 = chained(fn, 1)
    rk = chained(fn, KCHAIN)
    t0 = time.perf_counter()
    float(r1(*args))  # compile + first-readback tax
    print(f"  [{label}] k=1 compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    float(rk(*args))
    print(f"  [{label}] k={KCHAIN} compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(r1(*args)); t1 = time.perf_counter()
        float(rk(*args)); t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (KCHAIN - 1) * 1000)
    ms = float(np.median(ts))
    print(f"  [{label}] {ms:.2f} ms/call", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="P3")
    ap.add_argument("--what", default="fwd")
    ap.add_argument("--variants", default="exact,mxu")
    ap.add_argument("--batch", type=int, default=B)
    args = ap.parse_args()

    fns = {
        "exact": lambda x, o, m, w: modulated_deform_conv2d(x, o, m, w),
        "pallas": lambda x, o, m, w: modulated_deform_conv2d_pallas(
            x, o, m, w, 3),
        "mxu": lambda x, o, m, w: modulated_deform_conv2d_mxu(x, o, m, w, 3),
        "mxu16": lambda x, o, m, w: modulated_deform_conv2d_mxu(
            x.astype(jnp.bfloat16), o, m, w, 3).astype(jnp.float32),
        "mxu2": lambda x, o, m, w: modulated_deform_conv2d_mxu2(
            x, o, m, w, 3),
        "mxu216": lambda x, o, m, w: modulated_deform_conv2d_mxu2(
            x.astype(jnp.bfloat16), o, m, w, 3).astype(jnp.float32),
        "exact16": lambda x, o, m, w: modulated_deform_conv2d(
            x.astype(jnp.bfloat16), o, m, w).astype(jnp.float32),
    }

    for lv in args.levels.split(","):
        h, w_ = LEVELS[lv]
        r = np.random.default_rng(0)
        x = jnp.asarray(r.random((args.batch, h, w_, C)), jnp.float32)
        off = jnp.asarray(
            np.clip(r.normal(0, 1.0, (args.batch, h, w_, 18)), -2.9, 2.9),
            jnp.float32)
        mask = jnp.asarray(r.random((args.batch, h, w_, 9)), jnp.float32)
        wt = jnp.asarray(r.normal(0, 0.1, (3, 3, C, C)), jnp.float32)
        inp = (x, off, mask, wt)
        print(f"== {lv} ({args.batch},{h},{w_},{C}) ==", flush=True)
        for what in args.what.split(","):
            for v in args.variants.split(","):
                fn = fns[v]
                if what == "bwd":
                    base = fn
                    def fn(x, o, m, w, base=base):  # noqa: E306
                        g = jax.grad(
                            lambda *a: jnp.sum(base(*a) ** 2),
                            argnums=(0, 1, 2, 3))(x, o, m, w)
                        return sum(jnp.sum(t) for t in g)
                try:
                    measure(fn, inp, f"{lv} {what} {v}")
                except Exception as e:  # noqa: BLE001
                    print(f"  [{lv} {what} {v}] FAILED: {type(e).__name__}: "
                          f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
