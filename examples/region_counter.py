"""Count objects inside multiple named regions of a video stream.

Reference analogue: examples/YOLOv8-Region-Counter (multi-region counting
with movable polygons). Built on the framework's tracking facade + the
ObjectCounter solution — one counter per region, shared track stream.

Usage:
    python examples/region_counter.py VIDEO [MODEL.yaml] [--imgsz 320]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("model", nargs="?", default="yolo11n.yaml")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--conf", type=float, default=0.25)
    args = ap.parse_args()

    from yolo_ad_refine_tpu import YOLO
    from yolo_ad_refine_tpu.solutions.object_counter import ObjectCounter

    model = YOLO(args.model, imgsz=args.imgsz)
    s = args.imgsz
    regions = {
        "left": [(0, 0), (s // 2, 0), (s // 2, s), (0, s)],
        "right": [(s // 2, 0), (s, 0), (s, s), (s // 2, s)],
    }
    counters = {name: ObjectCounter(region=pts) for name, pts in regions.items()}

    results = model.track(args.video, conf=args.conf, imgsz=args.imgsz)
    n_frames = 0
    for res in results:
        n_frames += 1
        for name, counter in counters.items():
            counter.update(res)
    for name, counter in counters.items():
        print(f"region '{name}': in={counter.in_count} out={counter.out_count}")
    print(f"{n_frames} frames processed")


if __name__ == "__main__":
    main()
