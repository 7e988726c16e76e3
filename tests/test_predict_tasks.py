"""Task-aware predict surface: segment masks, pose keypoints, OBB results."""

import numpy as np
import pytest

from yolo_ad_refine_tpu.engine.predictor import DetectionPredictor
from yolo_ad_refine_tpu.models.model import build_detection_model

BACKBONE = [
    [-1, 1, "Conv", [16, 3, 2]],
    [-1, 1, "Conv", [32, 3, 2]],
    [-1, 1, "Conv", [64, 3, 2]],
    [-1, 1, "Conv", [128, 3, 2]],
    [-1, 1, "Conv", [256, 3, 2]],
]


def _img(seed=0):
    return np.random.default_rng(seed).integers(0, 255, (80, 100, 3), dtype=np.uint8)


def _run(head_row, **kwargs):
    m = build_detection_model({"nc": 2, "backbone": BACKBONE, "head": [head_row]},
                              nc=2, imgsz=64)
    p = DetectionPredictor(overrides={"imgsz": 64, "conf": 0.05, "batch": 1, **kwargs})
    return p(source=_img(), model=m)[0]


class TestPredictTasks:
    def test_segment_predict_returns_masks(self):
        r = _run([[2, 3, 4], 1, "Segment", ["nc", 8, 32]])
        if len(r.boxes):
            assert r.masks is not None
            assert r.masks.data.shape[1:] == r.orig_shape
            assert len(r.masks) == len(r.boxes)
            assert r.plot().shape == r.orig_img.shape

    @pytest.mark.slow
    def test_pose_predict_returns_keypoints(self):
        r = _run([[2, 3, 4], 1, "Pose", ["nc", [4, 3]]])
        if len(r.boxes):
            assert r.keypoints is not None
            assert r.keypoints.data.shape[1:] == (4, 3)
            assert r.keypoints.conf is not None
            assert r.keypoints.xyn.max() < 2.0  # roughly normalized range
            assert r.plot().shape == r.orig_img.shape

    def test_obb_predict_returns_rboxes(self):
        r = _run([[2, 3, 4], 1, "OBB", ["nc", 1]])
        if len(r.boxes):
            assert r.obb is not None
            assert r.obb.data.shape[-1] == 7
            assert r.obb.xyxyxyxy.shape == (len(r.obb), 4, 2)
            # AA hulls in .boxes contain the rotated corners
            np.testing.assert_allclose(r.boxes.xyxy[:, :2],
                                       r.obb.xyxyxyxy.min(1), atol=1e-3)
            assert r.plot().shape == r.orig_img.shape

    @pytest.mark.slow
    def test_save_txt_and_json_task_formats(self, tmp_path):
        import json

        r = _run([[2, 3, 4], 1, "Pose", ["nc", [4, 3]]])
        if len(r.boxes):
            p = r.save_txt(tmp_path / "pose.txt", save_conf=True)
            first = p.read_text().splitlines()[0].split()
            assert len(first) == 1 + 4 + 4 * 3 + 1  # cls xywhn kpts conf
            j = json.loads(r.tojson())
            assert "keypoints" in j[0] and len(j[0]["keypoints"]["x"]) == 4

        r = _run([[2, 3, 4], 1, "OBB", ["nc", 1]])
        if len(r.boxes):
            p = r.save_txt(tmp_path / "obb.txt")
            assert len(p.read_text().splitlines()[0].split()) == 9  # cls + 4 corners
            j = json.loads(r.tojson())
            assert "rbox" in j[0]

    def test_detect_predict_unchanged(self):
        r = _run([[2, 3, 4], 1, "Detect", ["nc"]])
        assert r.masks is None and r.keypoints is None and r.obb is None
