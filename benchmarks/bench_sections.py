"""Post-prologue inference attribution: prologue vs body rows 5+ vs head.

bench_body.py attributes the MODULE path; with the blocked prologue and
fused head shipping, the question is where the remaining ms live. Times
(chained-truth, one process):

  pro    prologue_infer alone (yaml rows 0-4, blocked)
  body   graph rows 5..head-1 from the prologue output (stop_at_head)
  head   AYHead from captured head inputs (fused or module per env)
  full   the whole eval forward (model.apply)

full - (pro + body + head) ~= decode + XLA stitch overhead.

Usage: python benchmarks/bench_sections.py [--batch 32] [--imgsz 640]
       [--which pro,body,head,full]
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


def chained(fn, x0, k=10, label=""):
    @partial(jax.jit, static_argnums=1)
    def run(c0, kk):
        def body(i, c):
            y = fn(x0, c)
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
    print(f"[{label}] {ms:.3f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--which", default="pro,body,head,full")
    args = ap.parse_args()
    which = set(args.which.split(","))

    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_infer
    from yolo_ad_refine_tpu.utils import ROOT

    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16, imgsz=256)
    v = model.variables
    x0 = jnp.asarray(np.random.default_rng(0).random(
        (args.batch, args.imgsz, args.imgsz, 3), np.float32), jnp.bfloat16)

    if "pro" in which:
        chained(lambda x, c: prologue_infer(
            v, x + c.astype(x.dtype) * 0, jnp.bfloat16, model.prologue_meta),
            x0, label="pro")

    # captured intermediates (concrete, so each section times in isolation)
    y4 = jax.jit(lambda x: prologue_infer(v, x, jnp.bfloat16,
                                          model.prologue_meta))(x0)
    if "body" in which:
        def body_fn(y, c):
            feats = model.graph.apply(v, y + c.astype(y.dtype) * 0,
                                      train=False, start_at=5,
                                      full_input_h=args.imgsz,
                                      stop_at_head=True)
            return sum(jnp.sum(f) for f in feats)
        chained(body_fn, y4, label="body")

    feats0 = jax.jit(lambda y: model.graph.apply(
        v, y, train=False, start_at=5, full_input_h=args.imgsz,
        stop_at_head=True))(y4)
    if "head" in which:
        hmod = model.specs[model.head_spec.i].module
        hvars = {"params": v["params"][f"modules_{model.head_spec.i}"],
                 "batch_stats": v.get("batch_stats", {}).get(
                     f"modules_{model.head_spec.i}", {})}
        def head_fn(fs, c):
            fs = [f + c.astype(f.dtype) * 0 for f in fs]
            y, _ = hmod.apply(hvars, fs, train=False, input_h=args.imgsz)
            return y
        chained(head_fn, feats0, label="head")

    if "full" in which:
        chained(lambda x, c: model.apply(
            v, x + c.astype(x.dtype) * 0, train=False)[0], x0, label="full")


if __name__ == "__main__":
    main()
