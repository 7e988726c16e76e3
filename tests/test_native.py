"""Native C++ ops tests: exact parity with the python/numpy implementations."""

import numpy as np
import pytest

from yolo_ad_refine_tpu.ops.native import get_lib, letterbox_native, nms_native


pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


def test_nms_native_matches_numpy_reference():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_ops import nms_numpy  # naive greedy reference

    r = np.random.default_rng(0)
    n = 400
    xy = r.uniform(0, 100, (n, 2))
    wh = r.uniform(5, 25, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = r.uniform(0, 1, n).astype(np.float32)
    cls = r.integers(0, 4, n).astype(np.float32)

    keep = nms_native(boxes, scores, cls, iou_thres=0.45, conf_thres=0.25, max_det=400)
    m = scores > 0.25
    idx = np.nonzero(m)[0]
    off = boxes[idx] + (cls[idx] * 7680.0)[:, None].repeat(4, 1)
    ref = idx[np.asarray(nms_numpy(off, scores[idx], 0.45))]
    assert keep.tolist() == sorted(ref.tolist(), key=lambda i: -scores[i])


def test_nms_native_max_det_cap():
    boxes = np.asarray([[i * 50.0, 0, i * 50 + 10, 10] for i in range(10)], np.float32)
    scores = np.linspace(0.9, 0.5, 10).astype(np.float32)
    cls = np.zeros(10, np.float32)
    keep = nms_native(boxes, scores, cls, 0.45, 0.1, max_det=3)
    assert len(keep) == 3 and keep.tolist() == [0, 1, 2]


def test_letterbox_native_matches_python():
    from yolo_ad_refine_tpu.data.augment import letterbox as letterbox_py

    r = np.random.default_rng(1)
    img = r.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    out_n, ratio_n, pad_n = letterbox_native(img, 64)
    out_p, ratio_p, pad_p = letterbox_py(img, 64)
    assert ratio_n[0] == pytest.approx(ratio_p[0], abs=1e-5)
    assert pad_n == pytest.approx(pad_p, abs=0.5)
    # interpolation rounding differs by at most 1 LSB
    assert np.abs(out_n.astype(int) - out_p.astype(int)).max() <= 1


class TestNativeLoader:
    """csrc/yat_loader.cpp: libjpeg decode + letterbox threads."""

    @pytest.fixture()
    def jpegs(self, tmp_path):
        import cv2

        paths = []
        r = np.random.default_rng(0)
        for i, (h, w) in enumerate([(97, 143), (200, 100), (64, 64)]):
            img = r.integers(0, 255, (h, w, 3), np.uint8)
            # smooth it so JPEG loss doesn't dominate comparisons
            img = cv2.GaussianBlur(img, (7, 7), 3)
            p = tmp_path / f"im{i}.jpg"
            cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
            paths.append(p)
        return paths

    def test_single_image_matches_python_letterbox(self, jpegs):
        import cv2

        from yolo_ad_refine_tpu.data.augment import letterbox
        from yolo_ad_refine_tpu.ops.native import load_image_native

        res = load_image_native(jpegs[0], 96)
        if res is None:
            pytest.skip("native loader unavailable")
        img_n, (h0, w0), r, (dw, dh) = res
        ref_bgr = cv2.imread(str(jpegs[0]))
        assert (h0, w0) == ref_bgr.shape[:2]
        img_p, (rp, _), (dwp, dhp) = letterbox(ref_bgr, 96)
        assert img_n.shape == img_p.shape
        assert abs(r - rp) < 1e-6 and abs(dw - dwp) < 1e-6 and abs(dh - dhp) < 1e-6
        # decode differs slightly (libjpeg idct variant) and resize taps are
        # float vs cv2 fixed-point: compare loosely but meaningfully
        diff = np.abs(img_n.astype(int) - img_p.astype(int))
        assert np.mean(diff) < 2.0
        assert np.percentile(diff, 99) <= 12

    def test_batch_loader_order_and_meta(self, jpegs):
        from yolo_ad_refine_tpu.ops.native import NativeBatchLoader, get_loader_lib

        if get_loader_lib() is None:
            pytest.skip("native loader unavailable")
        loader = NativeBatchLoader(jpegs, imgsz=64, batch=2, threads=3)
        batches = list(loader)
        loader.close()
        assert [b[0].shape[0] for b in batches] == [2, 1]
        metas = np.concatenate([b[1] for b in batches])
        assert metas[0][:2].tolist() == [97, 143]
        assert metas[1][:2].tolist() == [200, 100]
        assert metas[2][:2].tolist() == [64, 64]
        assert metas[2][2] == 1.0  # 64 -> 64: ratio 1

    def test_unreadable_file_skipped(self, jpegs, tmp_path):
        from yolo_ad_refine_tpu.ops.native import NativeBatchLoader, get_loader_lib

        if get_loader_lib() is None:
            pytest.skip("native loader unavailable")
        bad = tmp_path / "missing.jpg"
        loader = NativeBatchLoader([jpegs[0], bad, jpegs[2]], imgsz=64,
                                   batch=4, threads=2)
        batches = list(loader)
        loader.close()
        assert sum(b[0].shape[0] for b in batches) == 2
