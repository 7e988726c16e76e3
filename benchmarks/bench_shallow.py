"""Micro-bench: shallow-stage conv formulations at flagship shapes.

The [0..4] prefix of the flagship costs ~9.7 of 26.3 ms bs32 (bench_body)
against a ~0.9 ms unpadded-HBM floor. Hypothesis: XLA pads C=16/32/64
activations to the 128-lane boundary, multiplying HBM traffic 8/4/2x, and
lowers small-N convs at a fraction of MXU rate. This times each candidate
rewrite of the same math:

  conv16   3x3 16->16 s1 @160^2 (the C3k2 bottleneck conv, worst case)
  conv1x1  1x1 32->32 s1 @160^2 (the C3k2 cv1)
  conv s2  3x3 64->64 s2 @160->80 (row 3)

formulations per op:
  plain    the module path (what XLA does today)
  blocked  s2d(2) layout: scattered-weight block conv (4x FLOPs for s1 k3,
           1.78x for s2 k3, 4x for 1x1-as-kron) with C_eff = 4C lanes

Chained-truth timing (docs/performance.md). Usage:
  python benchmarks/bench_shallow.py [--batch 32]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))


def chained(fn, x0, k=8, label=""):
    @partial(jax.jit, static_argnums=1)
    def run(c0, kk):
        def body(i, c):
            y = fn(x0 + c.astype(x0.dtype) * 0)
            return jnp.sum(y).astype(jnp.float32) * 1e-12 + c
        return jax.lax.fori_loop(0, kk, body, c0)

    t0 = time.perf_counter()
    float(run(jnp.float32(0.0), 1))
    float(run(jnp.float32(0.0), k))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t1 = time.perf_counter(); float(run(jnp.float32(1e-6), 1)); d1 = time.perf_counter() - t1
        t1 = time.perf_counter(); float(run(jnp.float32(1e-6), k)); dk = time.perf_counter() - t1
        ts.append((dk - d1) / (k - 1) * 1000)
    ms = float(np.median(ts))
    print(f"[{label:<28}] {ms:7.3f} ms  (compile {compile_s:.1f}s)", flush=True)
    return ms


def b2d(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C), phase-major ((dy,dx) major, c minor)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def scatter_k3_s1(w):
    """3x3 s1 conv C->C' == 3x3 block conv 4C->4C' on s2d(2) with scattered
    weights. Output phase (a,b) at block (I,J) = conv at pixel (2I+a, 2J+b),
    reading rows 2I+a-1..2I+a+1: row r in block (I+U, phase du) with
    r = 2(I+U)+du. Tap u (=r-(2I+a)+1) => 2U+du = a+u-1."""
    C, Cp = w.shape[2], w.shape[3]
    w4 = np.zeros((3, 3, 4 * C, 4 * Cp), w.dtype)
    for a in range(2):
        for b in range(2):
            for u in range(3):
                for v in range(3):
                    ry, rx = a + u - 1, b + v - 1  # 2U+du, 2V+dv with U in {-1,0,1}
                    U, du = ry // 2, ry % 2
                    V, dv = rx // 2, rx % 2
                    w4[U + 1, V + 1, (2 * du + dv) * C:(2 * du + dv + 1) * C,
                       (2 * a + b) * Cp:(2 * a + b + 1) * Cp] = w[u, v]
    return jnp.asarray(w4)


def scatter_k3_s2(w):
    """3x3 s2 conv C->C' @2H^2 == 2x2 block conv 4C->C' on s2d(2) (output
    unblocked at H^2). Output (I,J) = pixel (2I,2J), reads rows 2I-1..2I+1:
    row r = 2(I+U)+du => 2U+du = u-1, so taps live in blocks U in {-1,0}
    — a k2 conv with padding (1,0)."""
    C, Cp = w.shape[2], w.shape[3]
    w4 = np.zeros((2, 2, 4 * C, Cp), w.dtype)
    for u in range(3):
        for v in range(3):
            ry, rx = u - 1, v - 1
            U, du = ry // 2, ry % 2
            V, dv = rx // 2, rx % 2
            w4[U + 1, V + 1, (2 * du + dv) * C:(2 * du + dv + 1) * C] = w[u, v]
    return jnp.asarray(w4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    B = args.batch
    r = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")
    conv = partial(jax.lax.conv_general_dilated, dimension_numbers=dn)

    x16 = jnp.asarray(r.random((B, 160, 160, 16), np.float32), jnp.bfloat16)
    w16 = jnp.asarray(r.random((3, 3, 16, 16), np.float32) - 0.5, jnp.bfloat16)
    x32 = jnp.asarray(r.random((B, 160, 160, 32), np.float32), jnp.bfloat16)
    w32 = jnp.asarray(r.random((1, 1, 32, 32), np.float32) - 0.5, jnp.bfloat16)
    x64 = jnp.asarray(r.random((B, 160, 160, 64), np.float32), jnp.bfloat16)
    w64 = jnp.asarray(r.random((3, 3, 64, 64), np.float32) - 0.5, jnp.bfloat16)

    # --- 3x3 16->16 s1 @160^2 ---
    chained(lambda x: conv(x, w16, (1, 1), [(1, 1), (1, 1)]), x16,
            label="k3s1 16->16 plain")
    x16b = b2d(x16)
    w16b = scatter_k3_s1(np.asarray(w16, np.float32)).astype(jnp.bfloat16)
    chained(lambda x: conv(x, w16b, (1, 1), [(1, 1), (1, 1)]), x16b,
            label="k3s1 16->16 blocked(s2d2)")
    # parity check
    y_ref = conv(x16, w16, (1, 1), [(1, 1), (1, 1)])
    y_blk = conv(x16b, w16b, (1, 1), [(1, 1), (1, 1)])
    np.testing.assert_allclose(np.asarray(b2d(y_ref), np.float32),
                               np.asarray(y_blk, np.float32), atol=2e-2)
    print("  blocked s1 parity OK", flush=True)

    # --- 1x1 32->32 @160^2 ---
    chained(lambda x: conv(x, w32, (1, 1), [(0, 0), (0, 0)]), x32,
            label="1x1 32->32 plain")
    x32b = b2d(x32)
    w32k = jnp.asarray(np.kron(np.eye(4, dtype=np.float32),
                               np.asarray(w32, np.float32)[0, 0])[None, None],
                       jnp.bfloat16)
    chained(lambda x: conv(x, w32k, (1, 1), [(0, 0), (0, 0)]), x32b,
            label="1x1 32->32 kron(s2d2)")
    y_ref = conv(x32, w32, (1, 1), [(0, 0), (0, 0)])
    y_blk = conv(x32b, w32k, (1, 1), [(0, 0), (0, 0)])
    np.testing.assert_allclose(np.asarray(b2d(y_ref), np.float32),
                               np.asarray(y_blk, np.float32), atol=2e-2)
    print("  kron 1x1 parity OK", flush=True)

    # --- 3x3 64->64 s2 @160->80 ---
    chained(lambda x: conv(x, w64, (2, 2), [(1, 1), (1, 1)]), x64,
            label="k3s2 64->64 plain")
    x64b = b2d(x64)
    w64b = scatter_k3_s2(np.asarray(w64, np.float32)).astype(jnp.bfloat16)
    chained(lambda x: conv(x, w64b, (1, 1), [(1, 0), (1, 0)]), x64b,
            label="k3s2 64->64 blocked(s2d2)")
    y_ref = conv(x64, w64, (2, 2), [(1, 1), (1, 1)])
    y_blk = conv(x64b, w64b, (1, 1), [(1, 0), (1, 0)])
    np.testing.assert_allclose(np.asarray(y_ref, np.float32),
                               np.asarray(y_blk, np.float32), atol=2e-2)
    print("  blocked s2 parity OK", flush=True)

    # --- end-to-end relayout cost: b2d alone ---
    chained(b2d, x64, label="b2d relayout 64ch")


if __name__ == "__main__":
    main()
