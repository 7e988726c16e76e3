"""Multi-scale training tests (reference detect/train.py:60-75)."""

import numpy as np

from yolo_ad_refine_tpu.train.trainer import multi_scale_batch


def test_multi_scale_batch_resizes_and_scales_boxes():
    rng = np.random.default_rng(3)  # seed chosen so a non-identity size is drawn
    batch = {
        "img": np.zeros((2, 128, 128, 3), np.uint8),
        "bboxes": np.asarray([[[10.0, 10.0, 50.0, 50.0]] * 4] * 2, np.float32),
        "cls": np.zeros((2, 4, 1), np.float32),
        "mask": np.ones((2, 4, 1), np.float32),
    }
    seen_sizes = set()
    for _ in range(10):
        out = multi_scale_batch(batch, 128, rng)
        sz = out["img"].shape[1]
        seen_sizes.add(sz)
        assert sz % 64 == 0 and 64 <= sz <= 192
        scale = sz / 128
        np.testing.assert_allclose(out["bboxes"][0, 0], np.asarray([10, 10, 50, 50]) * scale)
    assert len(seen_sizes) > 1  # actually varies


def test_multi_scale_identity_size_passthrough():
    rng = np.random.default_rng(0)
    batch = {"img": np.zeros((1, 64, 64, 3), np.uint8),
             "bboxes": np.zeros((1, 2, 4), np.float32)}
    out = multi_scale_batch(batch, 64, rng)  # grid collapses to {64}
    assert out["img"].shape == (1, 64, 64, 3)
