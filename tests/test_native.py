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
