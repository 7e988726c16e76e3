"""Training entry — mirror of the reference fork's root train11.py.

The reference (train11.py:12-31) trains the flagship config on the aphid
dataset with SGD and close_mosaic=0; identical call shape here.
"""

from yolo_ad_refine_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("yolo11-701-YOLO-AD-Refine.yaml", task="detect")
    model.train(
        data="apid.v2i.yolov8/data.yaml",  # dataset yaml (path/train/val/names)
        epochs=220,
        batch=16,
        imgsz=640,
        optimizer="SGD",
        lr0=0.01,
        lrf=0.001,          # the "701" run's schedule (weights/*/args.yaml)
        close_mosaic=0,
        project="runs",
        name="yolo11-701-YOLO-AD-Refine",
    )
