"""Predict/val save surfaces: save_txt, save_conf, save_crop (reference
predictor + results.py) and validator save_json (reference detect/val.py
pred_to_json -> predictions.json)."""

import json
from pathlib import Path

import numpy as np
import pytest

TINY = {
    "nc": 2,
    "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]], [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]]],
    "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
}


@pytest.fixture(scope="module")
def model():
    from yolo_ad_refine_tpu.models.model import build_detection_model

    return build_detection_model(TINY, imgsz=64)


def test_results_save_crop(tmp_path):
    from yolo_ad_refine_tpu.engine.results import Results

    img = np.random.default_rng(0).integers(0, 255, (80, 100, 3), np.uint8)
    boxes = np.asarray([[10, 10, 40, 50, 0.9, 0], [50, 20, 90, 70, 0.7, 1]],
                       np.float32)
    r = Results(img, "a.jpg", {0: "cat", 1: "dog"}, boxes)
    out = r.save_crop(tmp_path / "crops", "a.jpg")
    cats = list((out / "cat").glob("*.jpg"))
    dogs = list((out / "dog").glob("*.jpg"))
    assert len(cats) == 1 and len(dogs) == 1
    import cv2

    crop = cv2.imread(str(cats[0]))
    # 1.02 gain + 20 px pad around a 30x40 box, clipped to the image
    assert crop.shape[0] >= 40 and crop.shape[1] >= 30


def test_predictor_save_txt_and_crop(model, tmp_path):
    import cv2

    from yolo_ad_refine_tpu.engine.predictor import DetectionPredictor

    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
    src = tmp_path / "im0.jpg"
    cv2.imwrite(str(src), img)
    pred = DetectionPredictor(overrides={
        "imgsz": 64, "conf": 1e-8, "max_det": 5, "save_txt": True,
        "save_conf": True, "save_crop": True, "project": str(tmp_path / "runs"),
    })
    results = pred(source=str(src), model=model)
    assert len(results) == 1
    run_dir = next((tmp_path / "runs").glob("predict*"))
    txts = list((run_dir / "labels").glob("*.txt"))
    assert len(txts) == 1
    if len(results[0]):
        rows = txts[0].read_text().strip().splitlines()
        assert len(rows) == len(results[0])
        # cls cx cy w h conf with save_conf
        assert len(rows[0].split()) == 6
        assert (run_dir / "crops").exists()


def test_validator_save_json(model, tmp_path):
    import cv2

    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(2)
    for i in range(4):
        cv2.imwrite(str(root / "images" / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), np.uint8))
        (root / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images\nval: images\nnc: 2\nnames:\n  0: a\n  1: b\n")

    from yolo_ad_refine_tpu.engine.validator import DetectionValidator

    v = DetectionValidator(args={"data": str(root / "data.yaml"), "imgsz": 64,
                                 "batch": 4, "conf": 1e-8, "max_det": 5,
                                 "save_json": True,
                                 "save_dir": str(tmp_path / "out"),
                                 "plots": False})
    v(model=model)
    pj = tmp_path / "out" / "predictions.json"
    assert pj.exists()
    rows = json.loads(pj.read_text())
    assert isinstance(rows, list)
    if rows:
        r0 = rows[0]
        assert set(r0) == {"image_id", "category_id", "bbox", "score"}
        assert isinstance(r0["image_id"], int)  # numeric stems -> int ids
        assert len(r0["bbox"]) == 4 and r0["bbox"][2] >= 0
