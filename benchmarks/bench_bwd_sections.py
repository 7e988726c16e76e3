"""Backward-pass section attribution for the train step (VERDICT r4 #3).

The forward has per-section numbers (bench_sections.py); the backward was
only a 3-mode ablation (train_attrib.py). This measures each section's
fwd-only and fwd+vjp chained-truth cost on the TRAIN path (bs16/640,
production env: mxu2 DCN, fused head, blocked train prologue), so
bwd ~= (fwd+vjp) - fwd per section:

  pro       blocked train prologue (rows 0-4, live BN)
  backbone  rows 5..11 (C3k2/MLCA stages + SPPF + C2PTSSA)
  neck      rows 11..head-1 (HS-FPN/BiFPN fusion path)
  head      AYHead train forward (fused 128-lane twin branches + DCN)
  loss      assigner + CIoU/NWD + SlideLoss BCE + DFL

VJPs are taken w.r.t. (params, section input) and every grad leaf is
consumed, so XLA cannot DCE any of the backward.

Usage: python benchmarks/bench_bwd_sections.py [--which pro,backbone,neck,head,loss]
Writes benchmarks/artifacts/bwd_sections.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

os.environ.setdefault("YAT_DCN_IMPL", "mxu2")

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

B, IMGSZ, MAXB = 16, 640, 64


def consume(tree):
    return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(tree))


def chained(fn, label, k=6):
    """fn(c) -> f32 scalar folded into the carry."""
    @partial(jax.jit, static_argnums=1)
    def run(c0, kk):
        return jax.lax.fori_loop(0, kk, lambda i, c: fn(c) * 1e-12 + c, c0)

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
    ap.add_argument("--which", default="pro,backbone,neck,head,loss")
    ap.add_argument("--k", type=int, default=6)
    args = ap.parse_args()
    which = set(args.which.split(","))

    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_train
    from yolo_ad_refine_tpu.train.loss import DetectionLoss
    from yolo_ad_refine_tpu.utils import ROOT

    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16, imgsz=256)
    v = model.variables
    meta = model.prologue_meta
    hi = model.head_spec.i
    NECK_START = 11
    r = np.random.default_rng(0)
    img = jnp.asarray(r.random((B, IMGSZ, IMGSZ, 3), np.float32), jnp.bfloat16)

    results = {}

    def sect(label, f, vin, xin):
        """f(vars, x) -> pytree output. Times fwd and fwd+vjp."""
        if label not in which:
            return
        fwd = chained(lambda c: consume(
            f(vin, jax.tree.map(lambda t: t + c.astype(t.dtype) * 0, xin))),
            f"{label} fwd", k=args.k)

        def both(c):
            xs = jax.tree.map(lambda t: t + c.astype(t.dtype) * 0, xin)
            val, g = jax.value_and_grad(
                lambda vv, xx: consume(f(vv, xx)), argnums=(0, 1))(vin, xs)
            return val + consume(g)

        fb = chained(both, f"{label} fwd+vjp", k=args.k)
        results[label] = {"fwd_ms": fwd, "fwd_vjp_ms": fb,
                          "bwd_ms": round(fb - fwd, 3)}

    # -- sections -----------------------------------------------------------
    sect("pro",
         lambda vv, xx: prologue_train(vv, xx["img"], jnp.bfloat16, meta)[0],
         v, {"img": img})

    y4 = jax.jit(lambda: prologue_train(v, img, jnp.bfloat16, meta)[0])()
    def run_backbone(vv, xx):
        out, ys = model.graph.apply(
            vv, xx["y4"], train=True, start_at=5, full_input_h=IMGSZ,
            stop_at=NECK_START, mutable=["batch_stats"])[0]
        return (out, ys)
    sect("backbone", run_backbone, v, {"y4": y4})

    out10, ys10 = jax.jit(lambda: run_backbone(v, {"y4": y4}))()
    ys10 = dict(ys10)
    def run_neck(vv, xx):
        feats = model.graph.apply(
            vv, xx["out"], train=True, start_at=NECK_START,
            full_input_h=IMGSZ, resume_ys=xx["ys"], stop_at_head=True,
            mutable=["batch_stats"])[0]
        return feats
    sect("neck", run_neck, v, {"out": out10, "ys": ys10})

    feats0 = jax.jit(lambda: run_neck(v, {"out": out10, "ys": ys10}))()
    hmod = model.specs[hi].module
    def run_head(vv, xx):
        hv = {"params": vv["params"][f"modules_{hi}"],
              "batch_stats": vv.get("batch_stats", {}).get(f"modules_{hi}", {})}
        return hmod.apply(hv, list(xx["feats"]), train=True,
                          mutable=["batch_stats", "diagnostics"])[0]
    sect("head", run_head, v, {"feats": tuple(feats0)})

    houts = jax.jit(lambda: run_head(v, {"feats": tuple(feats0)}))()
    loss_fn = DetectionLoss(nc=model.nc, strides=model.strides)
    cls = jnp.asarray(r.integers(0, model.nc, (B, MAXB, 1)), jnp.float32)
    boxes = jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0], jnp.float32),
                     (B, MAXB, 1))
    mask = jnp.ones((B, MAXB, 1), jnp.float32)
    def run_loss(vv, xx):
        return loss_fn(list(xx["feats"]), cls, boxes, mask).total
    sect("loss", run_loss, {}, {"feats": tuple(houts)})

    out = {"device": str(jax.devices()[0]), "batch": B, "imgsz": IMGSZ,
           "env": {k: os.environ.get(k) for k in
                   ("YAT_DCN_IMPL", "YAT_PROLOGUE", "YAT_FUSED_AYHEAD")},
           "method": "chained k=1 vs k=6, median of 3; vjp wrt (params, input), all grad leaves consumed",
           "results": results}
    p = Path("benchmarks/artifacts/bwd_sections.json")
    p.parent.mkdir(parents=True, exist_ok=True)
    if p.exists():  # partial runs (--which) merge into the existing table
        old = json.loads(p.read_text())
        out["results"] = {**old.get("results", {}), **results}
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
