"""int8 PTQ accuracy gate (VERDICT r3 item 6 / weak #6).

The one property post-training quantization can silently destroy is
accuracy. This trains a small detector to a nontrivial mAP on the
synthetic shapes set, exports fp32 AND int8 TFLite with REAL calibration
images, runs both through the validator's standalone AutoBackend mode
(reference validator.py:125-131) over the val split, and asserts the int8
mAP50 degradation stays under 3 points.

Parity surface: reference examples/YOLOv8-OpenCV-int8-tflite-Python +
engine/exporter.py export_tflite int8 branch.
"""

from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TINY = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
}
IMGSZ = 96


def test_int8_tflite_map_degradation(tmp_path):
    pytest.importorskip("tensorflow")
    from yolo_ad_refine_tpu.data import DataLoader, YOLODataset
    from yolo_ad_refine_tpu.data.synthetic import make_shapes_dataset
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter
    from yolo_ad_refine_tpu.engine.validator import DetectionValidator
    from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

    data = make_shapes_dataset(tmp_path / "ds", n_train=32, n_val=16,
                               imgsz=IMGSZ, max_objects=3)
    trainer = DetectionTrainer(overrides={
        "model": TINY, "data": data, "epochs": 45, "batch": 8,
        "imgsz": IMGSZ, "max_boxes": 8, "project": str(tmp_path / "runs"),
        "name": "t", "close_mosaic": 45, "mosaic": 0.0, "scale": 0.2,
        "translate": 0.05, "optimizer": "SGD", "lr0": 0.01, "patience": 200,
        "plots": False, "val": False,
    })
    trainer.train()
    model = trainer.model

    exporter = Exporter(model, imgsz=IMGSZ)
    fp_path = exporter("tflite", tmp_path / "fp")
    int8_path = Path(str(exporter("tflite", tmp_path / "q", int8=True,
                                  data=tmp_path / "ds" / "train" / "images",
                                  n_calib=16)))

    # the TFLite graph is exported at batch=1 (Exporter default): validate
    # with batch-1 loading, exactly how the reference runs tflite weights
    val_ds = YOLODataset(str(Path(data["path"]) / data["val"]), imgsz=IMGSZ,
                         augment=False, nc=3, max_boxes=8)
    args = {"imgsz": IMGSZ, "iou": 0.7, "max_det": 32, "max_boxes": 8,
            "batch": 1, "conf": 0.001, "plots": False, "task": "detect"}

    def map50(path):
        v = DetectionValidator(args=args,
                               dataloader=DataLoader(val_ds, batch_size=1))
        return v(model=model, backend=AutoBackend(path))["metrics/mAP50(B)"]

    m_fp = map50(fp_path)
    m_int8 = map50(int8_path)
    # the gate is meaningless if the fp model never learned
    assert m_fp > 0.25, f"fp32 TFLite mAP50 too low to gate on: {m_fp}"
    assert m_fp - m_int8 < 0.03, (
        f"int8 PTQ lost {100 * (m_fp - m_int8):.1f} mAP50 points "
        f"(fp {m_fp:.3f} -> int8 {m_int8:.3f})")
