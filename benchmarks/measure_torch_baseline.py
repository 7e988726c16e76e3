"""Measure the torch reference flagship on THIS host and record it.

The reference publishes no absolute FPS (BASELINE.md): its val.py report
derives FPS = 1000 / per-image inference ms from the validator Profile timers
(reference val.py:28-60, engine/validator.py:198). This script reproduces
that convention for the torch reference model on the local hardware and
writes benchmarks/torch_baseline.json, which bench.py uses as the traceable
`vs_baseline` anchor (replacing round 1's invented A100 constant).

Run: python benchmarks/measure_torch_baseline.py [--imgsz 640] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import platform
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, str(ROOT))
    from tests.test_parity import _build_torch_reference

    import torch

    model = _build_torch_reference(str(REF / "z-yaml/yolo11-701-YOLO-AD-Refine.yaml"))
    model.eval()
    x = torch.rand(1, 3, args.imgsz, args.imgsz)

    with torch.no_grad():
        for _ in range(args.warmup):
            model(x)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            model(x)
        dt = (time.perf_counter() - t0) / args.iters

    out = {
        "model": "z-yaml/yolo11-701-YOLO-AD-Refine.yaml",
        "framework": f"torch {torch.__version__} eager fp32 (reference stack)",
        "device": f"cpu ({platform.processor() or platform.machine()}), "
                  f"{torch.get_num_threads()} threads",
        "imgsz": args.imgsz,
        "batch": 1,
        "inference_ms_per_image": round(dt * 1000, 2),
        "images_per_sec": round(1.0 / dt, 3),
        "timing_convention": "reference val.py FPS = 1000/inference-ms, forward only",
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = ROOT / "benchmarks" / "torch_baseline.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
