"""DCN clip-radius cost curve on the real TPU (VERDICT r4 #1).

The mxu2 kernel's sampling window is (CH + 2r + 4) rows x round_up(TW+2(r+2), 8)
cols, so the sampling matmul K-dim grows ~linearly with radius. This measures
the production path (bf16 in, f32 accum) fwd and fwd+bwd at r in {3,5,8,17}
with offsets spread over the radius, using the chained-executable ground-truth
method (docs/performance.md).

Run: python benchmarks/bench_dcn_radius.py [--levels P3,P4] [--what fwd,bwd]
Writes benchmarks/artifacts/dcn_radius_cost.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

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
    float(r1(*args))
    print(f"  [{label}] k=1 compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    float(rk(*args))
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
    ap.add_argument("--levels", default="P3,P4")
    ap.add_argument("--what", default="fwd,bwd")
    ap.add_argument("--radii", default="3,5,8,17")
    ap.add_argument("--batch", type=int, default=B)
    args = ap.parse_args()

    out = {"device": str(jax.devices()[0]), "batch": args.batch, "C": C,
           "method": "chained k=1 vs k=6, median of 3", "results": {}}
    for lv in args.levels.split(","):
        h, w_ = LEVELS[lv]
        for radius in (int(r) for r in args.radii.split(",")):
            r = np.random.default_rng(0)
            x = jnp.asarray(r.random((args.batch, h, w_, C)), jnp.bfloat16)
            off = jnp.asarray(
                r.uniform(-(radius - 0.2), radius - 0.2,
                          (args.batch, h, w_, 18)), jnp.float32)
            mask = jnp.asarray(r.random((args.batch, h, w_, 9)), jnp.float32)
            wt = jnp.asarray(r.normal(0, 0.1, (3, 3, C, C)), jnp.float32)
            inp = (x, off, mask, wt)
            for what in args.what.split(","):
                if what == "fwd":
                    fn = lambda x, o, m, w, rr=radius: (  # noqa: E731
                        modulated_deform_conv2d_mxu2(x, o, m, w, rr))
                else:
                    def fn(x, o, m, w, rr=radius):
                        g = jax.grad(
                            lambda *a: jnp.sum(
                                modulated_deform_conv2d_mxu2(*a, rr)
                                .astype(jnp.float32) ** 2),
                            argnums=(0, 1, 2, 3))(x, o, m, w)
                        return sum(jnp.sum(t.astype(jnp.float32)) for t in g)
                try:
                    ms = measure(fn, inp, f"{lv} r={radius} {what}")
                    out["results"][f"{lv}_r{radius}_{what}"] = ms
                except Exception as e:  # noqa: BLE001
                    print(f"  [{lv} r={radius} {what}] FAILED: "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                    out["results"][f"{lv}_r{radius}_{what}"] = None

    p = Path("benchmarks/artifacts/dcn_radius_cost.json")
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out["results"], indent=1))


if __name__ == "__main__":
    main()
