"""A/B: flagship bs32/640 eval forward with/without the blocked prologue.

Chained-truth method (docs/performance.md). Also times the stem-pair-only
rewrite for a 3-way comparison:

  off    : plain module path (YAT_PROLOGUE=0, YAT_STEM_S2D=0)
  stem   : rows 0-1 s2d rewrite only (round-3 shipping)
  full   : rows 0-4 blocked prologue (round 4)

Usage: python benchmarks/bench_prologue.py [--batch 32] [--imgsz 640]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))


def chained(apply_fn, x0, k=10, label=""):
    @partial(jax.jit, static_argnums=1)
    def run(c0, kk):
        def body(i, c):
            y, _ = apply_fn(x0 + c.astype(x0.dtype) * 0)
            return jnp.sum(y).astype(jnp.float32) * 1e-12 + c
        return jax.lax.fori_loop(0, kk, body, c0)

    t0 = time.perf_counter()
    float(run(jnp.float32(0.0), 1))
    float(run(jnp.float32(0.0), k))
    print(f"  [{label}] compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t1 = time.perf_counter(); float(run(jnp.float32(1e-6), 1)); d1 = time.perf_counter() - t1
        t1 = time.perf_counter(); float(run(jnp.float32(1e-6), k)); dk = time.perf_counter() - t1
        ts.append((dk - d1) / (k - 1) * 1000)
    ms = float(np.median(ts))
    b = x0.shape[0]
    print(f"[{label}] {ms:.2f} ms/batch = {b / ms * 1000:.0f} img/s", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--modes", default="off,stem,full")
    args = ap.parse_args()

    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16, imgsz=256)
    x0 = jnp.asarray(np.random.default_rng(0).random(
        (args.batch, args.imgsz, args.imgsz, 3), np.float32), jnp.bfloat16)

    # mode -> (YAT_PROLOGUE, YAT_STEM_S2D, YAT_HEAD_FUSED)
    env = {"off": ("0", "0", "0"), "stem": ("0", "1", "0"),
           "full": ("1", "0", "0"), "head": ("0", "0", "1"),
           "fullhead": ("1", "0", "1")}
    outs = {}
    for mode in args.modes.split(","):
        pro, stem, fused = env[mode]
        os.environ["YAT_PROLOGUE"] = pro
        os.environ["YAT_STEM_S2D"] = stem
        os.environ["YAT_HEAD_FUSED"] = fused
        outs[mode] = chained(
            lambda x: model.apply(model.variables, x, train=False), x0,
            label=mode)
    # numeric cross-check of the paths on one batch
    ys = {}
    for mode in env:
        if mode not in outs:
            continue
        (os.environ["YAT_PROLOGUE"], os.environ["YAT_STEM_S2D"],
         os.environ["YAT_HEAD_FUSED"]) = env[mode]
        y, _ = jax.jit(lambda x: model.apply(model.variables, x, train=False))(x0)
        ys[mode] = np.asarray(y, np.float32)
    ref = ys.get("off")
    for mode, y in ys.items():
        if ref is not None and mode != "off":
            d = np.max(np.abs(y - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"rel max diff {mode} vs off: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
