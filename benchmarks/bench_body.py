"""Flagship body decomposition on the real TPU (chained-truth method).

Times truncated graphs (backbone/neck prefixes of the flagship yaml) at
bs=32/640 to locate where the non-DCN forward time lives
(docs/performance.md "Remaining levers" 2: body layout). Each cut point is
its own jitted executable; section time = difference between cuts.

Usage: python benchmarks/bench_body.py [--cuts 4,8,10,17,23] [--batch 32]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def chained_ms(make_step, k, label):
    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, k, lambda i, c: make_step(c), c0)

    t0 = time.perf_counter()
    float(run(jnp.float32(0.0)))
    print(f"  [{label} k={k}] compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(jnp.float32(1e-6)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure(make_step, label, k=6):
    t1 = chained_ms(make_step, 1, label)
    tk = chained_ms(make_step, k, label)
    ms = (tk - t1) / (k - 1) * 1000
    print(f"[{label}] {ms:.2f} ms/iter", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cuts", default="4,8,11,17,23")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--k", type=int, default=6)
    args = ap.parse_args()

    from yolo_ad_refine_tpu.models.model import DetectionModel
    from yolo_ad_refine_tpu.models.parser import load_model_cfg
    from yolo_ad_refine_tpu.utils import ROOT

    cfg = load_model_cfg(str(ROOT / "cfg" / "models" /
                             "yolo11-701-YOLO-AD-Refine.yaml"))
    rows = list(cfg["backbone"]) + list(cfg["head"])
    x0 = jnp.asarray(
        np.random.default_rng(0).random(
            (args.batch, args.imgsz, args.imgsz, 3), dtype=np.float32),
        jnp.bfloat16)

    prev = 0.0
    for cut in [int(c) for c in args.cuts.split(",")]:
        n_backbone = len(cfg["backbone"])
        sub = {"nc": cfg.get("nc", 80)}
        for key in ("head_channel", "fusion_mode", "scales"):
            if key in cfg:
                sub[key] = cfg[key]
        sub["backbone"] = rows[: min(cut, n_backbone)]
        sub["head"] = rows[n_backbone:cut] if cut > n_backbone else []
        try:
            m = DetectionModel(sub, dtype=jnp.bfloat16)
            m.init(imgsz=256)
        except Exception as e:  # noqa: BLE001
            print(f"[cut {cut}] build failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        variables = m.variables

        def step(c, m=m, variables=variables):
            y = m.graph.apply(variables, x0 + c.astype(x0.dtype) * 0,
                              train=False)
            if isinstance(y, tuple):
                y = y[0]
            return jnp.sum(y).astype(jnp.float32) * 1e-12 + c

        ms = measure(step, f"prefix[0:{cut}]", args.k)
        print(f"  section [{prev and 'prev' or 0}..{cut}] delta "
              f"{ms - prev:.2f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
