"""int8 post-training-quantized TFLite export + inference.

Reference analogue: examples/YOLOv8-TFLite-Python (int8 .tflite consumed
with tf.lite.Interpreter). Here the export itself is also shown: the
framework's Exporter converts the jax forward through jax2tf with a
representative-dataset PTQ pass.

Usage:
    python examples/tflite_int8.py [MODEL.yaml] [--data data.yaml] \
        [--imgsz 320] [--image path.jpg]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="yolo11n.yaml")
    ap.add_argument("--data", default=None, help="data.yaml or image dir for calibration")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--image", default=None, help="image to run after export")
    ap.add_argument("--out", default="export_int8")
    args = ap.parse_args()

    from yolo_ad_refine_tpu import YOLO
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter

    model = YOLO(args.model, imgsz=args.imgsz)
    exporter = Exporter(model.model, imgsz=args.imgsz, batch=1)
    path = exporter("tflite", args.out, int8=True, data=args.data)
    print(f"int8 tflite: {path} ({path.stat().st_size / 1e6:.2f} MB)")

    backend = AutoBackend(path)
    if args.image:
        import cv2

        from yolo_ad_refine_tpu.data.augment import letterbox

        im0 = cv2.imread(args.image)
        im, _, _ = letterbox(im0, args.imgsz, scaleup=False)
        x = im[..., ::-1].astype(np.float32)[None]
    else:
        x = np.random.default_rng(0).random(
            (1, args.imgsz, args.imgsz, 3), dtype=np.float32) * 255.0
    y = backend(x)
    print(f"output: {np.asarray(y).shape}; top conf "
          f"{float(np.asarray(y)[..., 4:].max()):.4f}")


if __name__ == "__main__":
    main()
