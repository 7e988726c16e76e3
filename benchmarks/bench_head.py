"""Standalone module attribution: AYHead + deep-backbone blocks (chained).

bench_body's prefix deltas carry XLA layout noise (a negative section in
round 4); this times suspect modules in isolation on their real shapes,
all in ONE process so comparisons share layout decisions:

  ayhead        full AYHead eval on (80^2, 40^2, 20^2) x 128ch
  ayhead_plain  same with the DCN monkeypatched to a plain 3x3 conv
  coordatt      CoordAtt alone @80^2 x 64
  taskdecomp    TaskDecomposition alone @80^2 x 64
  mlca          C3k2_MLCA(256, c3k=True) @20^2 (flagship row 8)
  sppf          SPPF(256) @20^2
  c2ptssa       C2PTSSA(256) @20^2 (flagship row 10)

Usage: python benchmarks/bench_head.py [--batch 32] [--which a,b,...]
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


def chained(fn, inputs, k=8, label=""):
    @partial(jax.jit, static_argnums=1)
    def run(c0, kk):
        def body(i, c):
            y = fn(*[x + c.astype(x.dtype) * 0 for x in inputs])
            if isinstance(y, (tuple, list)):
                y = y[0]
            return jnp.sum(y).astype(jnp.float32) * 1e-12 + c
        return jax.lax.fori_loop(0, kk, body, c0)

    t0 = time.perf_counter()
    float(run(jnp.float32(0.0), 1))
    float(run(jnp.float32(0.0), k))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t1 = time.perf_counter(); float(run(jnp.float32(1e-6), 1)); d1 = time.perf_counter() - t1
        t1 = time.perf_counter(); float(run(jnp.float32(1e-6), k)); dk = time.perf_counter() - t1
        ts.append((dk - d1) / (k - 1) * 1000)
    ms = float(np.median(ts))
    print(f"[{label:<14}] {ms:7.3f} ms  (compile {comp:.0f}s)", flush=True)
    return ms


def make(mod, *shapes, dtype=jnp.bfloat16, batch=32, **kw):
    r = np.random.default_rng(0)
    xs = [jnp.asarray(r.random((batch, *s), np.float32), dtype) for s in shapes]
    x0 = xs[0] if len(xs) == 1 else [x for x in xs]
    variables = mod.init(jax.random.PRNGKey(0), x0, **kw)
    return variables, xs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--which", default="ayhead,ayhead_plain,coordatt,taskdecomp,mlca,sppf,c2ptssa")
    args = ap.parse_args()
    B = args.batch
    which = set(args.which.split(","))
    dt = jnp.bfloat16

    from yolo_ad_refine_tpu.nn import block as blk
    from yolo_ad_refine_tpu.nn import head as hd
    from yolo_ad_refine_tpu.nn import tssa

    if {"ayhead", "ayhead_plain"} & which:
        mod = hd.AYHead(nc=80, ch=(128, 128, 128), dtype=dt)
        r = np.random.default_rng(0)
        feats = [jnp.asarray(r.random((B, s, s, 128), np.float32), dt)
                 for s in (80, 40, 20)]
        variables = mod.init(jax.random.PRNGKey(0), feats, train=False, input_h=640)

        if "ayhead" in which:
            chained(lambda *fs: mod.apply(variables, list(fs), train=False,
                                          input_h=640)[0],
                    feats, label="ayhead")
        if "ayhead_plain" in which:
            import yolo_ad_refine_tpu.ops.deform_mxu2 as dm2
            real = dm2.modulated_deform_conv2d_mxu2

            def plain(x, offset, mask, weight, radius=3):
                return jax.lax.conv_general_dilated(
                    x, weight.astype(x.dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            dm2.modulated_deform_conv2d_mxu2 = plain
            try:
                chained(lambda *fs: mod.apply(variables, list(fs), train=False,
                                              input_h=640)[0],
                        feats, label="ayhead_plain")
            finally:
                dm2.modulated_deform_conv2d_mxu2 = real

    if "coordatt" in which:
        mod = hd.CoordAtt(64, dtype=dt)
        v, xs = make(mod, (80, 80, 64), batch=B)
        chained(lambda x: mod.apply(v, x), xs, label="coordatt")

    if "taskdecomp" in which:
        mod = hd.TaskDecomposition(64, 1, 16, dtype=dt)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.random((B, 80, 80, 64), np.float32), dt)
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        v = mod.init(jax.random.PRNGKey(0), x, avg)
        chained(lambda a, g: mod.apply(v, a, g), [x, avg], label="taskdecomp")

    if "mlca" in which:
        mod = blk.C3k2MLCA(256, n=2, c3k=True, dtype=dt)
        v, xs = make(mod, (20, 20, 256), batch=B)
        chained(lambda x: mod.apply(v, x), xs, label="mlca")

    if "sppf" in which:
        mod = blk.SPPF(256, k=5, dtype=dt)
        v, xs = make(mod, (20, 20, 256), batch=B)
        chained(lambda x: mod.apply(v, x), xs, label="sppf")

    if "c2ptssa" in which:
        mod = tssa.C2PTSSA(256, n=1, dtype=dt)
        v, xs = make(mod, (20, 20, 256), batch=B)
        chained(lambda x: mod.apply(v, x), xs, label="c2ptssa")


if __name__ == "__main__":
    main()
