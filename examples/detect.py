"""Inference entry — mirror of the reference fork's root detect.py.

The reference (detect.py:10-24) predicts over a test directory and saves
annotated images.
"""

from yolo_ad_refine_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("runs/yolo11-701-YOLO-AD-Refine/weights/best")
    results = model.predict(
        source="apid.v2i.yolov8/test/images",
        imgsz=640,
        conf=0.25,
        save=True,
    )
    for r in results:
        print(r.path, r.verbose())
