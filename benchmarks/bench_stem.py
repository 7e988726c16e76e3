"""Shallow-stem microbench: attribute the [0..4) 8.4 ms and test s2d rewrites.

bench_body.py showed the first four flagship rows (Conv 3->16 s2 @640,
Conv 16->32 s2 @320, C3k2 32->64 @160, Conv 64->64 s2 @160) cost 8.39 ms of
the 26.3 ms bs32 forward — ~2% MXU efficiency. Hypothesis: lane padding
(C=3/16/32 padded to 128) makes these layers HBM-traffic-bound, and an
exact space-to-depth rewrite of the stem (host-side 4x4 s2d -> two k2 s1
convs at C=48/64 @160^2) removes ~16x of that traffic.

Variants timed (chained-truth method, docs/performance.md):
  l0      Conv 3->16 k3 s2 @ (32,640,640,3)
  l1      Conv 16->32 k3 s2 @ (32,320,320,16)
  l2conv  Conv 32->64 k3 s2 @ (32,160,160,32)   (stand-in for C3k2 mass)
  stem    l0+l1 chained (the thing the rewrite replaces)
  s2d_stem  conv 48->64 k2 s1 + conv 64->32 k2 s1 @ (32,160,160,48)
            (the exact-rewrite shapes; FLOPs 1.8-7x higher, traffic 16x lower)
  s2d_dev   same but with the 4x4 s2d done ON device from (32,640,640,3)
            (isolates whether the input tensor's lane padding is the cost)

Usage: python benchmarks/bench_stem.py [--batch 32]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

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
        dt = time.perf_counter() - t0
        print(f"  [{label} k={kk}] compile+first {dt:.1f}s", flush=True)
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


def conv_apply(cin, cout, ksz, stride, pad, shape, dtype=jnp.bfloat16):
    """Plain conv + bias + silu, mirroring nn/block.py Conv's compute."""
    r = np.random.default_rng(0)
    w = jnp.asarray(r.normal(0, 0.1, (ksz, ksz, cin, cout)), dtype)
    b = jnp.asarray(r.normal(0, 0.1, (cout,)), dtype)
    x0 = jnp.asarray(r.random(shape, dtype=np.float32), dtype)

    def step(c):
        x = x0 + c.astype(dtype) * 0
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.silu(y + b)
        return jnp.sum(y).astype(jnp.float32) * 1e-12 + c

    return step


def two_conv_apply(c0, c1, c2, k1, k2, s1, s2, p1, p2, shape,
                   dtype=jnp.bfloat16, s2d_from=None):
    r = np.random.default_rng(0)
    w1 = jnp.asarray(r.normal(0, 0.1, (k1, k1, c0, c1)), dtype)
    b1 = jnp.asarray(r.normal(0, 0.1, (c1,)), dtype)
    w2 = jnp.asarray(r.normal(0, 0.1, (k2, k2, c1, c2)), dtype)
    b2 = jnp.asarray(r.normal(0, 0.1, (c2,)), dtype)
    x0 = jnp.asarray(r.random(shape, dtype=np.float32), dtype)

    def step(c):
        x = x0 + c.astype(dtype) * 0
        if s2d_from is not None:
            b, h, w, ch = x.shape
            f = s2d_from
            x = x.reshape(b, h // f, f, w // f, f, ch)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f,
                                                      f * f * ch)
        y = jax.lax.conv_general_dilated(
            x, w1, (s1, s1), p1, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.silu(y + b1)
        y = jax.lax.conv_general_dilated(
            y, w2, (s2, s2), p2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.silu(y + b2)
        return jnp.sum(y).astype(jnp.float32) * 1e-12 + c

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    B = args.batch
    print(f"device {jax.devices()[0]}", flush=True)

    results = {}
    results["l0"] = chained(
        conv_apply(3, 16, 3, 2, [(1, 1), (1, 1)], (B, 640, 640, 3)), "l0")
    results["l1"] = chained(
        conv_apply(16, 32, 3, 2, [(1, 1), (1, 1)], (B, 320, 320, 16)), "l1")
    results["l2conv"] = chained(
        conv_apply(32, 64, 3, 2, [(1, 1), (1, 1)], (B, 160, 160, 32)),
        "l2conv")
    # the real stem: l0 then l1 chained in one executable
    results["stem"] = chained(
        two_conv_apply(3, 16, 32, 3, 3, 2, 2, [(1, 1), (1, 1)],
                       [(1, 1), (1, 1)], (B, 640, 640, 3)), "stem")
    # exact-rewrite shapes: host-fed s2d4 input, k2 s1 convs, pad (top,left)
    results["s2d_stem"] = chained(
        two_conv_apply(48, 64, 32, 2, 2, 1, 1, [(1, 0), (1, 0)],
                       [(1, 0), (1, 0)], (B, 160, 160, 48)), "s2d_stem")
    # same compute but s2d done on device from the raw (640,640,3) input
    results["s2d_dev"] = chained(
        two_conv_apply(48, 64, 32, 2, 2, 1, 1, [(1, 0), (1, 0)],
                       [(1, 0), (1, 0)], (B, 640, 640, 3), s2d_from=4),
        "s2d_dev")

    print("\n== summary (ms) ==")
    for k, v in results.items():
        print(f"  {k:10s} {v:7.2f}")


if __name__ == "__main__":
    main()
