"""Data pipeline tests: augmentations, dataset, loader collate."""

import numpy as np
import pytest

from yolo_ad_refine_tpu.data import augment as A


@pytest.fixture(scope="session")
def toy_dataset(tmp_path_factory):
    """Synthetic YOLO-format dataset: colored rectangles on noise."""
    import cv2

    root = tmp_path_factory.mktemp("toyds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    n_cls = 3
    for i in range(12):
        h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
        img = rng.integers(0, 80, (h, w, 3), dtype=np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 5))):
            bw, bh = int(rng.integers(10, w // 2)), int(rng.integers(10, h // 2))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            c = int(rng.integers(0, n_cls))
            color = [(255, 60, 60), (60, 255, 60), (60, 60, 255)][c]
            cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
            cx, cy = (x1 + bw / 2) / w, (y1 + bh / 2) / h
            lines.append(f"{c} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
        cv2.imwrite(str(root / "images" / f"im{i:03d}.jpg"), img)
        (root / "labels" / f"im{i:03d}.txt").write_text("\n".join(lines) + "\n")
    return root


class TestAugment:
    def test_letterbox_shapes(self):
        img = np.zeros((100, 200, 3), np.uint8)
        out, ratio, pad = A.letterbox(img, 64)
        assert out.shape == (64, 64, 3)
        assert ratio[0] == pytest.approx(64 / 200)
        # pad fills top/bottom with 114
        assert (out[0] == 114).all()

    def test_letterbox_box_transform(self):
        img = np.zeros((100, 200, 3), np.uint8)
        boxes = np.array([[0.0, 0.0, 200.0, 100.0]], np.float32)
        out, ratio, pad = A.letterbox(img, 64)
        b = A.apply_letterbox_to_boxes(boxes, ratio, pad)
        assert b[0, 0] == pytest.approx(0, abs=1)
        assert b[0, 2] == pytest.approx(64, abs=1)
        assert b[0, 3] - b[0, 1] == pytest.approx(32, abs=1)

    def test_letterbox_no_scaleup(self):
        img = np.zeros((32, 32, 3), np.uint8)
        out, ratio, _ = A.letterbox(img, 64, scaleup=False)
        assert ratio[0] == 1.0 and out.shape == (64, 64, 3)

    def test_hsv_preserves_shape_dtype(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8).copy()
        out = A.augment_hsv(img, rng)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8

    def test_flip_lr_boxes(self):
        img = np.zeros((10, 20, 3), np.uint8)
        boxes = np.array([[2.0, 1.0, 6.0, 5.0]], np.float32)
        _, fb = A.flip_lr(img, boxes)
        np.testing.assert_allclose(fb, [[14, 1, 18, 5]])

    def test_mosaic4_canvas(self):
        rng = np.random.default_rng(0)
        items = []
        for _ in range(4):
            img = np.full((48, 48, 3), 50, np.uint8)
            boxes = np.array([[10.0, 10.0, 30.0, 30.0]], np.float32)
            items.append((img, boxes, np.array([0.0])))
        canvas, boxes, cls = A.mosaic4(items, 64, rng)
        assert canvas.shape == (128, 128, 3)
        assert len(boxes) == 4
        assert (boxes >= 0).all() and (boxes <= 128).all()

    def test_random_perspective_identity_when_disabled(self):
        rng = np.random.default_rng(0)
        img = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
        boxes = np.array([[8.0, 8.0, 40.0, 40.0]], np.float32)
        out, b, c = A.random_perspective(img, boxes, np.array([1.0]), rng,
                                         translate=0.0, scale=0.0)
        assert out.shape == img.shape
        np.testing.assert_allclose(b, boxes, atol=1.0)


class TestDataset:
    def test_dataset_and_loader(self, toy_dataset):
        from yolo_ad_refine_tpu.data import DataLoader, YOLODataset

        ds = YOLODataset(toy_dataset / "images", imgsz=64, augment=True,
                         hyp={"mosaic": 1.0, "fliplr": 0.5}, max_boxes=16, nc=3)
        assert len(ds) == 12
        s = ds.get_sample(0, np.random.default_rng(0))
        assert s["img"].shape == (64, 64, 3)
        assert s["bboxes"].shape[1] == 4

        dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
        batches = list(dl)
        assert len(batches) == 3
        b = batches[0]
        assert b["img"].shape == (4, 64, 64, 3) and b["img"].dtype == np.uint8
        assert b["cls"].shape == (4, 16, 1)
        assert b["bboxes"].shape == (4, 16, 4)
        assert b["mask"].sum() > 0
        # boxes with mask=1 are inside the image
        m = b["mask"][..., 0] > 0
        assert (b["bboxes"][m] >= 0).all() and (b["bboxes"][m] <= 64).all()

    def test_val_mode_letterbox(self, toy_dataset):
        from yolo_ad_refine_tpu.data import YOLODataset

        ds = YOLODataset(toy_dataset / "images", imgsz=64, augment=False, nc=3)
        s = ds.get_sample(1)
        assert s["img"].shape == (64, 64, 3)
        assert s["ori_shape"][0] >= 80  # original recorded
        (r, _), (dw, dh) = s["ratio_pad"][0], s["ratio_pad"][1]
        assert 0 < r <= 1.0

    def test_epoch_determinism(self, toy_dataset):
        from yolo_ad_refine_tpu.data import DataLoader, YOLODataset

        ds = YOLODataset(toy_dataset / "images", imgsz=64, augment=True,
                         hyp={"mosaic": 1.0}, max_boxes=16, nc=3)
        dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
        a = next(iter(dl))
        b = next(iter(dl))
        np.testing.assert_array_equal(a["img"], b["img"])  # same epoch => same batch
        dl.set_epoch(1)
        c = next(iter(dl))
        assert not np.array_equal(a["img"], c["img"])

    def test_close_mosaic(self, toy_dataset):
        from yolo_ad_refine_tpu.data import DataLoader, YOLODataset

        ds = YOLODataset(toy_dataset / "images", imgsz=64, augment=True,
                         hyp={"mosaic": 1.0}, max_boxes=16, nc=3)
        dl = DataLoader(ds, batch_size=4)
        dl.close_mosaic()
        assert not ds.mosaic_enabled


class TestImageCache:
    """reference base.py:189-259 cache_images RAM/disk."""

    def _mkdata(self, tmp_path, n=3):
        import cv2

        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        for i in range(n):
            img = np.random.default_rng(i).integers(0, 255, (40 + i, 60, 3), np.uint8)
            cv2.imwrite(str(tmp_path / "images" / f"im{i}.jpg"), img)
            (tmp_path / "labels" / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        return tmp_path / "images"

    def test_ram_cache_hits(self, tmp_path):
        from yolo_ad_refine_tpu.data.dataset import YOLODataset

        ds = YOLODataset(self._mkdata(tmp_path), imgsz=64, cache=False,
                         cache_images="ram")
        a, shape_a = ds.load_image(0)
        assert ds._ram[0] is not None
        b, shape_b = ds.load_image(0)
        assert shape_a == shape_b
        np.testing.assert_array_equal(a, b)
        b[:] = 0  # caller mutation must not poison the cache
        c, _ = ds.load_image(0)
        assert c.any()

    def test_disk_cache_roundtrip(self, tmp_path):
        from yolo_ad_refine_tpu.data.dataset import YOLODataset

        root = self._mkdata(tmp_path)
        ds = YOLODataset(root, imgsz=64, cache=False, cache_images="disk")
        a, shape_a = ds.load_image(1)
        sidecars = list(root.glob("*.yat64.npz"))  # imgsz-keyed sidecar name
        assert len(sidecars) == 1
        b, shape_b = ds.load_image(1)  # served from the sidecar
        assert shape_a == shape_b
        np.testing.assert_array_equal(a, b)
        # a different imgsz must NOT be served the 64-px sidecar
        ds96 = YOLODataset(root, imgsz=96, cache=False, cache_images="disk")
        c, _ = ds96.load_image(1)
        assert max(c.shape[:2]) == 96
