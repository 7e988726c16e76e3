"""OBB task wiring: corner-label parsing, rotated NMS, trainer e2e."""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

TINY_OBB = {
    "nc": 1,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "OBB", ["nc", 1]]],
}


def _rot_corners(cx, cy, w, h, theta):
    c, s = np.cos(theta), np.sin(theta)
    dx = np.asarray([-w / 2, w / 2, w / 2, -w / 2])
    dy = np.asarray([-h / 2, -h / 2, h / 2, h / 2])
    return np.stack([cx + dx * c - dy * s, cy + dx * s + dy * c], -1)


@pytest.fixture(scope="module")
def obb_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("obbds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(5)
    for i in range(6):
        img = rng.integers(0, 60, (96, 96, 3), dtype=np.uint8)
        lines = []
        for _ in range(2):
            cx, cy = rng.uniform(0.35, 0.65, 2)
            quad = _rot_corners(cx, cy, 0.3, 0.12, rng.uniform(0, np.pi / 2)).clip(0.01, 0.99)
            cv2.fillPoly(img, [(quad * 96).astype(np.int32)], (0, 0, 255))
            lines.append("0 " + " ".join(f"{v:.4f}" for v in quad.reshape(-1)))
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        (root / "labels" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    return root


class TestOBBConvert:
    def test_corners_to_xywhr(self):
        from yolo_ad_refine_tpu.data.dataset import xyxyxyxy2xywhr_np

        quad = _rot_corners(50.0, 40.0, 30.0, 10.0, 0.5)
        rb = xyxyxyxy2xywhr_np(quad[None])
        assert rb.shape == (1, 5)
        np.testing.assert_allclose(rb[0, :2], [50, 40], atol=0.5)
        # minAreaRect may swap w/h with a +-pi/2 angle shift
        assert sorted(rb[0, 2:4].round(1)) == [10.0, 30.0]
        assert 0.0 <= rb[0, 4] <= np.pi / 2 + 1e-6


class TestRotatedNMS:
    def test_suppresses_rotated_duplicates(self):
        from yolo_ad_refine_tpu.ops.nms import non_max_suppression

        # two clusters of near-identical rotated boxes + angle extra column
        n = 16
        pred = np.zeros((1, n, 1 + 4 + 1), np.float32)  # xywh + 1 class + angle
        for j in range(n):
            c = 100.0 if j % 2 else 300.0
            pred[0, j, :4] = [c + j * 0.5, c, 60, 20]
            pred[0, j, 4] = 0.9 - j * 0.01
            pred[0, j, 5] = 0.7  # angle rad
        det, cnt, extras = non_max_suppression(
            jnp.asarray(pred), nc=1, max_nms=16, max_det=8, rotated=True)
        assert int(cnt[0]) == 2  # one survivor per cluster
        assert extras.shape[-1] == 1
        # det rows are xywh for rotated mode
        assert abs(float(det[0, 0, 2]) - 60) < 1e-3


class TestOBBTrainer:
    def test_obb_training_e2e(self, obb_dataset, tmp_path):
        """Full OBB training: RotatedTAL + probiou loss through the jitted
        step, rotated-NMS val with probiou matching, checkpoints saved."""
        from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

        trainer = DetectionTrainer(overrides={
            "model": TINY_OBB,
            "data": {"path": str(obb_dataset), "train": "images", "val": "images",
                     "names": {0: "thing"}},
            "task": "obb", "epochs": 2, "batch": 2, "imgsz": 64, "max_boxes": 8,
            "project": str(tmp_path), "name": "obb", "close_mosaic": 0,
            "warmup_epochs": 0.0, "optimizer": "SGD", "plots": False, "workers": 2,
        })
        results = trainer.train()
        assert "metrics/mAP50(B)" in results
        assert (tmp_path / "obb" / "weights" / "last" / "weights.msgpack").exists()
