"""Per-layer attribution of the flagship's first 4 rows with REAL modules.

bench_stem.py showed bare conv+silu for rows 0-1 is < 1 ms — so the 8.39 ms
that bench_body.py attributes to prefix[0:4) lives in the real modules'
extra structure (BatchNorm eval scale/bias passes, C3k2's split/concat/
bottleneck chain at C=16-32 where every elementwise pass moves a 128-lane
padded tensor). This bench instantiates the actual nn/block.py modules at
the flagship-n shapes and times each in isolation plus the full chain.

Usage: python benchmarks/bench_stem2.py [--batch 32] [--k 48]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def chained(make_step, label, k=48):
    def run_k(kk):
        @jax.jit
        def go(c0):
            return jax.lax.fori_loop(0, kk, lambda i, c: make_step(c), c0)

        t0 = time.perf_counter()
        float(go(jnp.float32(0.0)))
        print(f"  [{label} k={kk}] compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(go(jnp.float32(1e-6)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tk = run_k(1), run_k(k)
    ms = (tk - t1) / (k - 1) * 1000
    print(f"[{label}] {ms:.2f} ms/iter", flush=True)
    return ms


def module_step(mod, shape, dtype=jnp.bfloat16):
    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.random(shape, dtype=np.float32), dtype)
    variables = mod.init(jax.random.PRNGKey(0), x0, train=False)

    def step(c):
        y = mod.apply(variables, x0 + c.astype(dtype) * 0, train=False)
        return jnp.sum(y).astype(jnp.float32) * 1e-12 + c

    return step


def chain_step(mods, shape, dtype=jnp.bfloat16):
    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.random(shape, dtype=np.float32), dtype)
    vs = []
    y = x0
    for m in mods:
        vs.append(m.init(jax.random.PRNGKey(0), y, train=False))
        y = m.apply(vs[-1], y, train=False)

    def step(c):
        y = x0 + c.astype(dtype) * 0
        for m, v in zip(mods, vs):
            y = m.apply(v, y, train=False)
        return jnp.sum(y).astype(jnp.float32) * 1e-12 + c

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=48)
    args = ap.parse_args()
    B, K = args.batch, args.k
    print(f"device {jax.devices()[0]}", flush=True)

    from yolo_ad_refine_tpu.nn.block import C3k2, Conv

    dt = jnp.bfloat16
    l0 = Conv(16, 3, 2, dtype=dt)
    l1 = Conv(32, 3, 2, dtype=dt)
    l2 = C3k2(64, n=1, c3k=False, e=0.25, dtype=dt)   # depth 2*0.5 -> n=1
    l3 = Conv(64, 3, 2, dtype=dt)

    results = {}
    results["l0 Conv3->16@640"] = chained(
        module_step(l0, (B, 640, 640, 3)), "l0", K)
    results["l1 Conv16->32@320"] = chained(
        module_step(l1, (B, 320, 320, 16)), "l1", K)
    results["l2 C3k2 32->64@160"] = chained(
        module_step(l2, (B, 160, 160, 32)), "l2", K)
    results["l3 Conv64->64s2@160"] = chained(
        module_step(l3, (B, 160, 160, 64)), "l3", K)
    results["chain l0..l3"] = chained(
        chain_step([l0, l1, l2, l3], (B, 640, 640, 3)), "chain", K)

    print("\n== summary (ms) ==")
    for k, v in results.items():
        print(f"  {k:24s} {v:7.2f}")


if __name__ == "__main__":
    main()
