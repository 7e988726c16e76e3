"""Benchmark harness: export-format matrix timing + model profiling.

Parity surface: reference utils/benchmarks.py:49 (benchmark(): export to each
format, run inference, tabulate ms/img) and the val.py paper report (FPS from
validator timers, GFLOPs from model_info). GFLOPs come from XLA's own cost
analysis instead of thop.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.utils import LOGGER


def model_flops(model, imgsz: int = 640) -> float:
    """Forward GFLOPs via XLA cost analysis (replaces thop; torch_utils.py:375)."""
    fn = jax.jit(lambda v, x: model.graph.apply(v, x, train=False)[0])
    lowered = fn.lower(model.variables, jnp.zeros((1, imgsz, imgsz, 3), model.dtype))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per computation
        cost = cost[0]
    return float(cost.get("flops", 0.0)) / 1e9


def time_callable(fn, x, warmup: int = 3, iters: int = 10) -> float:
    """Median wall-time per call (seconds), blocking on results."""
    for _ in range(warmup):
        jax.block_until_ready(fn(x)) if hasattr(fn(x), "block_until_ready") else fn(x)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(x)
        try:
            jax.block_until_ready(out)
        except Exception:  # noqa: BLE001 - numpy outputs
            pass
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def benchmark(yolo, imgsz: int = 640, batch: int = 1, formats: tuple = ("checkpoint", "stablehlo"),
              data=None, verbose: bool = True) -> list[dict]:
    """Export to each format, reload via AutoBackend, time inference."""
    from yolo_ad_refine_tpu.engine.exporter import Exporter, AutoBackend, UnsupportedFormat

    model = yolo.model
    rows = []
    x = np.random.default_rng(0).integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)
    for fmt in formats:
        try:
            exporter = Exporter(model, imgsz=imgsz, batch=batch)
            path = exporter(fmt, Path("runs/export") / f"model_{fmt}")
            backend = AutoBackend(path)
            dt = time_callable(backend, jnp.asarray(x, jnp.float32))
            rows.append({"format": fmt, "status": "ok", "ms_per_image": dt / batch * 1000,
                         "path": str(path)})
        except (UnsupportedFormat, ImportError) as e:
            rows.append({"format": fmt, "status": f"skipped: {e}"})
        except Exception as e:  # noqa: BLE001
            rows.append({"format": fmt, "status": f"failed: {e}"})
    if verbose:
        for r in rows:
            LOGGER.info(str(r))
    return rows


def paper_report(yolo, data, imgsz: int = 640, batch: int = 16, save_path="paper_data.txt"):
    """val.py-style report: params, GFLOPs, FPS, per-class P/R/F1/mAP table
    (reference root val.py:28-98)."""
    model = yolo.model
    results = yolo.val(data=data, imgsz=imgsz, batch=batch)
    gflops = model_flops(model, imgsz)
    n_params = model.num_params()
    infer_ms = results.get("inference_ms_per_image", 0.0)
    fps = 1000.0 / infer_ms if infer_ms else 0.0

    lines = [
        f"model: {yolo.overrides.get('model')}",
        f"params: {n_params:,}",
        f"GFLOPs(640): {gflops:.2f}",
        f"inference ms/img: {infer_ms:.2f}  FPS: {fps:.1f}",
        f"precision: {results['metrics/precision(B)']:.4f}",
        f"recall: {results['metrics/recall(B)']:.4f}",
        f"mAP50: {results['metrics/mAP50(B)']:.4f}",
        f"mAP50-95: {results['metrics/mAP50-95(B)']:.4f}",
        f"fitness(0.9*mAP50+0.1*mAP): {results['fitness']:.4f}",
    ]
    report = "\n".join(lines)
    Path(save_path).write_text(report + "\n")
    LOGGER.info(report)
    return results
