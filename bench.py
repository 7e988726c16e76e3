"""Benchmark: flagship 640x640 bs=32 inference images/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measurement matches how the reference measures speed: per-image inference ms
from the model forward only (ultralytics/engine/validator.py:161-166,198 and
root val.py:28-60 FPS report), i.e. decode included, NMS excluded. Runs in
bfloat16 compute / float32 params on whatever jax.devices()[0] is (the real
TPU chip under the driver).

vs_baseline: the reference publishes no absolute FPS (BASELINE.md); the
north-star target is A100-class throughput on one v5e chip. We normalize
against an estimated A100 fp16 throughput for this model (~400 img/s for the
~4M-param flagship with its deformable-conv head at 640px, torch AMP eager),
so vs_baseline > 1.0 means faster than the estimated A100 reference.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_ESTIMATED_IPS = 400.0
IMGSZ = 640
BATCH = 32
WARMUP = 3
ITERS = 10


def main():
    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    import sys

    t_init = time.perf_counter()
    # init at 256 (params are shape-independent) to avoid a second giant
    # 640px compile just for initialization
    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16,
        imgsz=256,
    )
    variables = model.variables
    print(f"init done in {time.perf_counter() - t_init:.1f}s", file=sys.stderr)

    @jax.jit
    def forward(x):
        y, _ = model.graph.apply(variables, x, train=False)
        return y

    x = jnp.asarray(
        np.random.default_rng(0).random((BATCH, IMGSZ, IMGSZ, 3), dtype=np.float32),
        dtype=jnp.bfloat16,
    )
    t_compile = time.perf_counter()
    for _ in range(WARMUP):
        jax.block_until_ready(forward(x))
    print(f"compile+warmup done in {time.perf_counter() - t_compile:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = forward(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / ITERS
    ips = BATCH / dt

    print(
        json.dumps(
            {
                "metric": "flagship_640_bs32_infer_images_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / A100_ESTIMATED_IPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
