"""Mask postprocess tests + segment inference e2e (coeffs through NMS to masks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.masks import crop_mask, process_mask


def test_crop_mask():
    masks = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0], [0.0, 0.0, 8.0, 8.0]])
    out = np.asarray(crop_mask(masks, boxes))
    assert out[0].sum() == 16  # 4x4 window
    assert out[1].sum() == 64
    assert out[0, 0, 0] == 0 and out[0, 3, 3] == 1


def test_process_mask_shapes_and_range():
    r = np.random.default_rng(0)
    proto = jnp.asarray(r.normal(size=(16, 16, 8)).astype(np.float32))
    coeffs = jnp.asarray(r.normal(size=(5, 8)).astype(np.float32))
    boxes = jnp.asarray(np.tile([8.0, 8.0, 48.0, 48.0], (5, 1)).astype(np.float32))
    m = np.asarray(process_mask(proto, coeffs, boxes, (64, 64)))
    assert m.shape == (5, 64, 64)
    assert m.min() >= 0 and m.max() <= 1
    # outside the box everything is (near) zero
    assert m[:, :4, :4].max() < 1e-3


@pytest.mark.slow
def test_segment_inference_pipeline():
    """Eval Segment output -> NMS with coeff carry -> masks."""
    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.ops.nms import non_max_suppression

    cfg = {
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
    m = build_detection_model(cfg, nc=2, imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), dtype=np.float32))
    y, (feats, mc, proto) = m(x, train=False)
    assert y.shape[-1] == 4 + 2 + 8  # box + cls + coeffs
    det, cnt, extras = non_max_suppression(y, conf_thres=1e-6, max_det=10, max_nms=64, nc=2)
    assert extras.shape == (1, 10, 8)
    masks = process_mask(proto[0], extras[0], det[0, :, :4], (64, 64))
    assert masks.shape == (10, 64, 64)
