"""Validation + paper report — mirror of the reference fork's root val.py.

The reference (val.py:17-98) validates best.pt and writes a PrettyTable
report (params, GFLOPs, per-image ms, FPS, per-class metrics) to
paper_data.txt; paper_report reproduces that.
"""

from yolo_ad_refine_tpu import YOLO
from yolo_ad_refine_tpu.utils.benchmarks import paper_report

if __name__ == "__main__":
    model = YOLO("runs/yolo11-701-YOLO-AD-Refine/weights/best")
    paper_report(
        model,
        data="apid.v2i.yolov8/data.yaml",
        imgsz=640,
        batch=16,
        save_path="paper_data.txt",
    )
