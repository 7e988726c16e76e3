"""Rect-val delta: square letterbox vs K-bucket rectangular batching.

VERDICT r3 item 7: the K-static-bucket approximation (data/dataset.py
set_rectangle) of the reference's per-batch minimal rectangles
(reference data/base.py:261-284) shipped with correctness tests but no
measured mAP/throughput deltas. This script measures them on a
mixed-aspect synthetic shapes val set with the trained full_train_synth
flagship weights:

  square : every image letterboxed to (imgsz, imgsz)  — one executable
  rect   : K=4 aspect buckets                          — <= K executables

and records mAP50 / mAP50-95 / val img/s for both to
benchmarks/artifacts/rect_val_delta.json.

Usage: python benchmarks/rect_val_delta.py [--weights runs/full_train_synth/
       flagship/weights/best] [--imgsz 320] [--n 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="runs/full_train_synth/flagship/weights/best")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="runs/rect_val")
    args = ap.parse_args()

    import jax

    from yolo_ad_refine_tpu.data.synthetic import make_shapes_dataset
    from yolo_ad_refine_tpu.engine.checkpoint import load_checkpoint
    from yolo_ad_refine_tpu.engine.validator import DetectionValidator

    root = Path(args.out)
    make_shapes_dataset(root / "data", n_train=2, n_val=args.n,
                        imgsz=args.imgsz, aspect_range=(0.5, 2.0))
    (root / "data.yaml").write_text(
        f"path: {(root / 'data').resolve()}\ntrain: train/images\n"
        "val: val/images\nnc: 3\nnames:\n  0: disc\n  1: box\n  2: tri\n")

    model = load_checkpoint(args.weights)
    out = {"device": str(jax.devices()[0]), "weights": str(args.weights),
           "imgsz": args.imgsz, "n_val": args.n}
    for mode, rect in (("square", False), ("rect", True)):
        v = DetectionValidator(args={
            "data": str(root / "data.yaml"), "imgsz": args.imgsz,
            "batch": args.batch, "iou": 0.7, "max_det": 64, "max_boxes": 16,
            "conf": 0.001, "plots": False, "task": "detect", "rect": rect,
            "rect_buckets": 4,
        })
        t0 = time.time()
        res = v(model=model)
        wall = time.time() - t0
        # second call = warm executables: the steady-state throughput number
        t0 = time.time()
        res = v(model=model)
        wall_warm = time.time() - t0
        out[mode] = {
            "mAP50": round(res["metrics/mAP50(B)"], 5),
            "mAP50_95": round(res["metrics/mAP50-95(B)"], 5),
            "precision": round(res["metrics/precision(B)"], 5),
            "recall": round(res["metrics/recall(B)"], 5),
            "wall_s_cold": round(wall, 2),
            "wall_s_warm": round(wall_warm, 2),
            "images_per_sec_warm": round(args.n / wall_warm, 1),
        }
        print(mode, out[mode], flush=True)
    out["delta"] = {
        "mAP50": round(out["rect"]["mAP50"] - out["square"]["mAP50"], 5),
        "mAP50_95": round(out["rect"]["mAP50_95"] - out["square"]["mAP50_95"], 5),
        "speedup_warm": round(out["square"]["wall_s_warm"]
                              / max(out["rect"]["wall_s_warm"], 1e-9), 3),
    }
    art = Path(__file__).parent / "artifacts"
    art.mkdir(exist_ok=True)
    (art / "rect_val_delta.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out["delta"]))


if __name__ == "__main__":
    main()
