"""Microbenchmark the modulated-deform-conv formulations on the real TPU.

Decides the round-2 DCN strategy (VERDICT item 2): the flagship's DyDCNv2 is
~70% of inference batch time. Candidates:
  exact    — ops.deform.modulated_deform_conv2d (XLA 2x2-block gather)
  dense3   — bounded-offset dense, r=3 (current train path)
  dense2   — bounded-offset dense, r=2
  pallas-* — probe whether Mosaic supports a real in-VMEM gather
             (jnp.take along the row axis), which would unlock a
             speed-of-light kernel.

Shapes = flagship AYHead levels at 640 input (task_ch=64): P3 80x80, P4
40x40, P5 20x20, batch 32.

Run: python benchmarks/bench_dcn.py [--batch 32]
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

from yolo_ad_refine_tpu.ops.deform import (  # noqa: E402
    modulated_deform_conv2d,
    modulated_deform_conv2d_dense,
)

LEVELS = [(80, 80), (40, 40), (20, 20)]
C = 64


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def mdc_exact_rows(x, offset, mask, weight, k: int = 3):
    """Exact DCN via 4 flat-index row gathers (take_along_axis) instead of
    one 2x2-block lax.gather — probes which gather XLA lowers faster."""
    b, h, w_, c = x.shape
    kk = k * k
    cout = weight.shape[-1]
    pad = k // 2
    hp, wp = h + 2, w_ + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(b, hp * wp, c)

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w_, dtype=jnp.float32)[None, :]
    base_y = jnp.broadcast_to(gy, (h, w_)).reshape(1, h * w_, 1)
    base_x = jnp.broadcast_to(gx, (h, w_)).reshape(1, h * w_, 1)
    tap_dy = jnp.asarray([t // k - pad for t in range(kk)], jnp.float32)[None, None, :]
    tap_dx = jnp.asarray([t % k - pad for t in range(kk)], jnp.float32)[None, None, :]
    off = offset.astype(jnp.float32).reshape(b, h * w_, kk, 2)
    cy = (base_y + tap_dy + off[..., 0]).reshape(b, -1)
    cx = (base_x + tap_dx + off[..., 1]).reshape(b, -1)

    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    ly, lx = cy - y0, cx - x0
    iy = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 2)
    ix = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 2)
    in_y = ((y0 >= -1) & (y0 <= h - 1)).astype(jnp.float32)
    in_x = ((x0 >= -1) & (x0 <= w_ - 1)).astype(jnp.float32)
    wy = jnp.stack([1 - ly, ly], -1) * in_y[..., None]
    wx = jnp.stack([1 - lx, lx], -1) * in_x[..., None]

    acc = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            flat = (iy + dy) * wp + (ix + dx)
            g = jnp.take_along_axis(xp, flat[..., None], axis=1)
            acc = acc + (wy[..., dy] * wx[..., dx])[..., None] * g.astype(jnp.float32)
    sampled = acc * mask.reshape(b, -1, 1)
    sampled = sampled.astype(x.dtype).reshape(b, h * w_, kk * c)
    out = jnp.einsum("bnk,ko->bno", sampled, weight.reshape(kk * c, cout),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, w_, cout).astype(x.dtype)


def probe_pallas_gather(b, h, w, c, dtype):
    """Can Mosaic gather rows of a VMEM-resident (HW, C) array with dynamic
    per-row indices? If yes, report its speed for the tap-sample pattern."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hw = h * w
    n = hw * 9  # all taps' nearest-row fetches

    def kernel(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0, fill_value=0)

    @jax.jit
    def run(x, idx):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, c), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.vmap(f)(x, idx)

    r = np.random.default_rng(0)
    x = jnp.asarray(r.random((b, hw, c)), dtype)
    idx = jnp.asarray(r.integers(0, hw, (b, n)), jnp.int32)
    ms = timeit(run, x, idx)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    b = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    r = np.random.default_rng(0)
    total = {}
    for h, w in LEVELS:
        x = jnp.asarray(r.random((b, h, w, C)), dtype)
        off = jnp.asarray(r.normal(0, 1.0, (b, h, w, 18)), jnp.float32)
        mask = jnp.asarray(r.random((b, h, w, 9)), jnp.float32)
        wgt = jnp.asarray(r.normal(0, 0.05, (3, 3, C, C)), dtype)

        variants = {
            "exact": jax.jit(modulated_deform_conv2d),
            "exact4": jax.jit(mdc_exact_rows),
            "dense3": jax.jit(partial(modulated_deform_conv2d_dense, max_offset=3.0)),
            "dense2": jax.jit(partial(modulated_deform_conv2d_dense, max_offset=2.0)),
            "dense1": jax.jit(partial(modulated_deform_conv2d_dense, max_offset=1.0)),
        }
        for name, fn in variants.items():
            try:
                ms = timeit(fn, x, off, mask, wgt)
            except Exception as e:  # noqa: BLE001
                ms = float("nan")
                print(f"{name} {h}x{w}: FAILED {e}", file=sys.stderr)
            total[name] = total.get(name, 0.0) + (ms if ms == ms else 0.0)
            print(f"{name:8s} {h:3d}x{w:<3d}: {ms:8.2f} ms")

        try:
            ms = probe_pallas_gather(b, h, w, C, dtype)
            total["pl-take"] = total.get("pl-take", 0.0) + ms
            print(f"{'pl-take':8s} {h:3d}x{w:<3d}: {ms:8.2f} ms (gather only, 9 taps)")
        except Exception as e:  # noqa: BLE001
            print(f"pl-take {h}x{w}: UNSUPPORTED: {type(e).__name__}: {str(e)[:200]}")

    print("\ntotals over 3 levels (ms/batch):")
    for k, v in total.items():
        print(f"  {k:8s}: {v:8.2f}")




def bench_grads(b=32, dtype=jnp.bfloat16):
    """Measure fwd+bwd of each formulation (the train-path decision point:
    XLA's gather adjoint is a scatter — is it actually slow on this chip?)"""
    r = np.random.default_rng(0)
    print("\n-- grad (fwd+bwd) --")
    for h, w in LEVELS:
        x = jnp.asarray(r.random((b, h, w, C)), dtype)
        off = jnp.asarray(r.normal(0, 1.0, (b, h, w, 18)), jnp.float32)
        mask = jnp.asarray(r.random((b, h, w, 9)), jnp.float32)
        wgt = jnp.asarray(r.normal(0, 0.05, (3, 3, C, C)), dtype)

        def make(fn):
            def loss(x, off, mask, wgt):
                return fn(x, off, mask, wgt).astype(jnp.float32).sum()
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

        for name, fn in {
            "exact": modulated_deform_conv2d,
            "exact4": mdc_exact_rows,
            "dense3": partial(modulated_deform_conv2d_dense, max_offset=3.0),
        }.items():
            try:
                ms = timeit(make(fn), x, off, mask, wgt)
            except Exception as e:  # noqa: BLE001
                print(f"grad-{name} {h}x{w}: FAILED {type(e).__name__} {str(e)[:120]}")
                continue
            print(f"grad-{name:8s} {h:3d}x{w:<3d}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
    bench_grads()
