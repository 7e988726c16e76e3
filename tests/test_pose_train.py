"""Pose task wiring: keypoint label parsing, collate, trainer e2e."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

TINY_POSE = {
    "nc": 1,
    "kpt_shape": [4, 3],
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "Pose", ["nc", [4, 3]]]],
}


@pytest.fixture(scope="module")
def pose_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("poseds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(3)
    for i in range(6):
        img = rng.integers(0, 60, (96, 96, 3), dtype=np.uint8)
        lines = []
        for _ in range(2):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w = h = 0.25
            # 4 keypoints at the box corners, third visibility=2/1/0 mix
            kx = np.asarray([cx - w / 4, cx + w / 4, cx - w / 4, cx + w / 4])
            ky = np.asarray([cy - h / 4, cy - h / 4, cy + h / 4, cy + h / 4])
            kv = np.asarray([2.0, 2.0, 1.0, 0.0])
            cv2.circle(img, (int(cx * 96), int(cy * 96)), 8, (0, 255, 0), -1)
            kstr = " ".join(f"{x:.4f} {y:.4f} {v:.0f}" for x, y, v in zip(kx, ky, kv))
            lines.append(f"0 {cx:.4f} {cy:.4f} {w:.4f} {h:.4f} {kstr}")
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        (root / "labels" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    return root


class TestPoseDataset:
    def test_labels_and_collate(self, pose_dataset):
        from yolo_ad_refine_tpu.data import DataLoader, YOLODataset

        ds = YOLODataset(pose_dataset / "images", imgsz=64, augment=False, nc=1,
                         max_boxes=8, task="pose", cache=False)
        assert ds.kpt_shape == (4, 3)  # inferred from label width
        s = ds.get_sample(0)
        assert s["keypoints"].shape == (2, 4, 3)
        # visible keypoints land inside their boxes (letterboxed px coords)
        k0, b0 = s["keypoints"][0], s["bboxes"][0]
        vis = k0[:, 2] > 0
        assert (k0[vis, 0] >= b0[0] - 1).all() and (k0[vis, 0] <= b0[2] + 1).all()
        assert (k0[~vis] == 0).all() or (~vis).sum() == 0
        b = next(iter(DataLoader(ds, batch_size=2, shuffle=False)))
        assert b["keypoints"].shape == (2, 8, 4, 3)
        assert b["keypoints"][:, :2, :, :2].max() > 1.0  # pixels, not normalized

    def test_fliplr_swaps_pairs(self, pose_dataset):
        from yolo_ad_refine_tpu.data import YOLODataset

        ds = YOLODataset(pose_dataset / "images", imgsz=64, augment=True,
                         hyp={"fliplr": 1.0, "mosaic": 0.0}, nc=1, max_boxes=8,
                         task="pose", cache=False, flip_idx=[1, 0, 3, 2])
        base = YOLODataset(pose_dataset / "images", imgsz=64, augment=False, nc=1,
                           max_boxes=8, task="pose", cache=False)
        s = ds.get_sample(0, rng=np.random.default_rng(0))
        s0 = base.get_sample(0)
        k, k0 = s["keypoints"][0], s0["keypoints"][0]
        # left/right pair swapped + x mirrored (same y)
        np.testing.assert_allclose(k[0, 1], k0[1, 1], atol=1e-3)
        np.testing.assert_allclose(k[0, 0], s["img"].shape[1] - k0[1, 0], atol=1e-3)


class TestPoseTrainer:
    def test_pose_training_e2e(self, pose_dataset, tmp_path):
        """Full pose training loop: PoseLoss through the jitted step, kpt
        components finite, checkpoints saved."""
        from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

        trainer = DetectionTrainer(overrides={
            "model": TINY_POSE,
            "data": {"path": str(pose_dataset), "train": "images", "val": "images",
                     "names": {0: "thing"}, "kpt_shape": [4, 3], "flip_idx": [1, 0, 3, 2]},
            "task": "pose", "epochs": 2, "batch": 2, "imgsz": 64, "max_boxes": 8,
            "project": str(tmp_path), "name": "pose", "close_mosaic": 0,
            "warmup_epochs": 0.0, "optimizer": "SGD", "plots": False, "workers": 2,
        })
        results = trainer.train()
        assert "metrics/mAP50(B)" in results
        assert "metrics/mAP50(P)" in results  # OKS keypoint mAP
        assert 0.0 <= results["metrics/mAP50(P)"] <= 1.0
        assert (tmp_path / "pose" / "weights" / "last" / "weights.msgpack").exists()


class TestKptIoU:
    def test_perfect_match_is_one(self):
        from yolo_ad_refine_tpu.utils.metrics_np import kpt_iou_np

        rng = np.random.default_rng(0)
        k = rng.uniform(10, 50, (3, 5, 2))
        gt = np.concatenate([k, np.ones((3, 5, 1))], -1)
        area = np.full(3, 400.0)
        oks = kpt_iou_np(gt, k, area, np.ones(5) / 5)
        np.testing.assert_allclose(np.diag(oks), 1.0, atol=1e-6)
        # far-away preds score near zero
        oks_far = kpt_iou_np(gt, k + 500.0, area, np.ones(5) / 5)
        assert oks_far.max() < 1e-3

    def test_invisible_keypoints_ignored(self):
        from yolo_ad_refine_tpu.utils.metrics_np import kpt_iou_np

        gt = np.zeros((1, 4, 3))
        gt[0, :2, :2] = [[10, 10], [20, 20]]
        gt[0, :2, 2] = 1  # only first two visible
        pred = np.zeros((1, 4, 2))
        pred[0, :2] = [[10, 10], [20, 20]]
        pred[0, 2:] = 999.0  # wild but invisible -> no penalty
        oks = kpt_iou_np(gt, pred, np.asarray([300.0]), np.ones(4) / 4)
        np.testing.assert_allclose(oks[0, 0], 1.0, atol=1e-6)
