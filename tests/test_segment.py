"""Segmentation task tests: polygon dataset, index masks, seg loss, grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

TINY_SEG = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "Segment", ["nc", 8, 32]]],
}


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("segds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 60, (96, 96, 3), dtype=np.uint8)
        lines = []
        for _ in range(2):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            r = rng.uniform(0.1, 0.2)
            # octagon polygon
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            poly = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], -1).clip(0.01, 0.99)
            pts = (poly * 96).astype(np.int32)
            cv2.fillPoly(img, [pts], (0, 0, 255))
            coords = " ".join(f"{v:.4f}" for v in poly.reshape(-1))
            lines.append(f"{int(rng.integers(0, 2))} {coords}")
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        (root / "labels" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    return root


class TestSegDataset:
    def test_labels_and_masks(self, seg_dataset):
        from yolo_ad_refine_tpu.data import DataLoader, YOLODataset

        ds = YOLODataset(seg_dataset / "images", imgsz=64, augment=False, nc=2,
                         max_boxes=8, task="segment", cache=False)
        s = ds.get_sample(0)
        assert len(s["segments"]) == 2
        assert s["bboxes"].shape == (2, 4)
        dl = DataLoader(ds, batch_size=2, shuffle=False)
        b = next(iter(dl))
        assert b["masks"].shape == (2, 16, 16)
        assert b["masks"].max() >= 1  # instances rendered
        # mask indices only where an instance exists; index <= n instances
        assert b["masks"].max() <= 2

    def test_mosaic_polygon_warping(self, seg_dataset):
        """Mosaic + affine path: polygons warped with the image, boxes hull
        the final polygons, masks render from warped polygons."""
        from yolo_ad_refine_tpu.data import DataLoader, YOLODataset

        ds = YOLODataset(seg_dataset / "images", imgsz=64, augment=True,
                         hyp={"mosaic": 1.0, "scale": 0.5, "translate": 0.1,
                              "fliplr": 0.5}, nc=2, max_boxes=16,
                         task="segment", cache=False)
        s = ds.get_sample(0, rng=np.random.default_rng(3), mosaic=True)
        assert s["img"].shape == (64, 64, 3)
        assert len(s["segments"]) == len(s["bboxes"]) == len(s["cls"])
        for poly, box in zip(s["segments"], s["bboxes"]):
            assert poly[:, 0].min() >= box[0] - 1e-3
            assert poly[:, 1].max() <= box[3] + 1e-3
            assert 0 <= poly.min() and poly.max() <= 64
        b = next(iter(DataLoader(ds, batch_size=2, shuffle=False)))
        assert b["masks"].shape == (2, 16, 16)

    def test_index_mask_rendering(self):
        from yolo_ad_refine_tpu.train.segment import polygons_to_index_mask

        p1 = np.asarray([[1, 1], [10, 1], [10, 10], [1, 10]], np.float32)  # big
        p2 = np.asarray([[4, 4], [7, 4], [7, 7], [4, 7]], np.float32)  # small, inside
        m = polygons_to_index_mask([p1, p2], (16, 16))
        assert m[2, 2] == 1
        assert m[5, 5] == 2  # smaller instance wins the overlap
        assert m[14, 14] == 0


class TestSegValidator:
    def test_mask_map_runs(self, seg_dataset):
        from yolo_ad_refine_tpu.engine.validator import DetectionValidator
        from yolo_ad_refine_tpu.models.model import build_detection_model

        m = build_detection_model(TINY_SEG, nc=2, imgsz=64)
        v = DetectionValidator(args={
            "data": {"path": str(seg_dataset), "train": "images", "val": "images",
                     "names": {0: "a", 1: "b"}},
            "imgsz": 64, "batch": 2, "max_boxes": 8, "task": "segment",
        })
        results = v(model=m)
        assert "metrics/mAP50(M)" in results
        assert 0.0 <= results["metrics/mAP50(M)"] <= 1.0
        assert "metrics/mAP50(B)" in results


class TestSegLoss:
    def test_finite_and_grads(self, seg_dataset):
        from yolo_ad_refine_tpu.data import DataLoader, YOLODataset
        from yolo_ad_refine_tpu.models.model import build_detection_model
        from yolo_ad_refine_tpu.train.segment import SegmentationLoss

        m = build_detection_model(TINY_SEG, nc=2, imgsz=64)
        ds = YOLODataset(seg_dataset / "images", imgsz=64, augment=False, nc=2,
                         max_boxes=8, task="segment", cache=False)
        batch = next(iter(DataLoader(ds, batch_size=2, shuffle=False)))
        loss_fn = SegmentationLoss(nc=2, strides=m.strides, max_fg=32)

        def f(params):
            preds = m.graph.apply(
                {"params": params, "batch_stats": m.variables.get("batch_stats", {})},
                jnp.asarray(batch["img"], jnp.float32) / 255.0, train=True,
                rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
            )[0]
            out = loss_fn(preds, jnp.asarray(batch["cls"]), jnp.asarray(batch["bboxes"]),
                          jnp.asarray(batch["mask"]), jnp.asarray(batch["masks"]))
            return out.total, out.components

        (total, comps), grads = jax.value_and_grad(f, has_aux=True)(m.variables["params"])
        assert np.isfinite(float(total))
        assert np.isfinite(np.asarray(comps)).all()
        assert np.asarray(comps)[1] > 0  # seg component present
        gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert np.isfinite(gsum) and gsum > 0


class TestSegTrainer:
    def test_segment_training_e2e(self, seg_dataset, tmp_path):
        """Full segment training loop: seg loss wired through the trainer,
        mask mAP in validation, checkpoints saved."""
        from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

        trainer = DetectionTrainer(overrides={
            "model": TINY_SEG,
            "data": {"path": str(seg_dataset), "train": "images", "val": "images",
                     "names": {0: "a", 1: "b"}},
            "task": "segment", "epochs": 2, "batch": 2, "imgsz": 64, "max_boxes": 8,
            "project": str(tmp_path), "name": "seg", "close_mosaic": 0,
            "warmup_epochs": 0.0, "optimizer": "SGD", "plots": False, "workers": 2,
        })
        results = trainer.train()
        assert "metrics/mAP50(M)" in results
        assert (tmp_path / "seg" / "weights" / "last" / "weights.msgpack").exists()
