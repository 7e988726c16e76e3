"""Slow test: training actually learns (overfits a tiny synthetic set).

The reference's equivalent is the 1-epoch smoke train (test_python.py:205);
this goes further and asserts mAP rises above chance — run with --slow.
"""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_tiny_detector_learns(tmp_path):
    import cv2

    root = tmp_path / "ds"
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.default_rng(0 if split == "train" else 1)
        for i in range(16):
            img = rng.integers(0, 60, (96, 96, 3), dtype=np.uint8)
            lines = []
            for _ in range(2):
                bw = bh = int(rng.integers(24, 40))
                x1 = int(rng.integers(0, 96 - bw))
                y1 = int(rng.integers(0, 96 - bh))
                c = int(rng.integers(0, 3))
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh),
                              [(255, 0, 0), (0, 255, 0), (0, 0, 255)][c], -1)
                lines.append(f"{c} {(x1 + bw / 2) / 96:.4f} {(y1 + bh / 2) / 96:.4f} "
                             f"{bw / 96:.4f} {bh / 96:.4f}")
            cv2.imwrite(str(root / split / "images" / f"{i}.jpg"), img)
            (root / split / "labels" / f"{i}.txt").write_text("\n".join(lines) + "\n")

    from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

    trainer = DetectionTrainer(overrides={
        "model": TINY,
        "data": {"path": str(root), "train": "train/images", "val": "val/images",
                 "names": {0: "r", 1: "g", 2: "b"}},
        "epochs": 60, "batch": 8, "imgsz": 64, "max_boxes": 8,
        "project": str(tmp_path / "runs"), "name": "c", "close_mosaic": 60,
        "mosaic": 0.0, "scale": 0.2, "translate": 0.05,
        "optimizer": "SGD", "lr0": 0.01, "patience": 200, "plots": False,
    })
    results = trainer.train()
    assert results["metrics/mAP50(B)"] > 0.15, results
