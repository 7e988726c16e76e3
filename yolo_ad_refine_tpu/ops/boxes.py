"""Box format conversions and rescaling.

Parity surface: reference ultralytics/utils/ops.py:392-599 (conversions),
ops.py:88 (scale_boxes), ops.py:337 (clip_boxes). Implemented as pure jnp
functions on (..., 4) arrays; work equally on numpy inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    xy, wh = jnp.split(x, 2, axis=-1)
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    p1, p2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([(p1 + p2) * 0.5, p2 - p1], axis=-1)


def xywhn2xyxy(x, w: float = 640.0, h: float = 640.0, padw: float = 0.0, padh: float = 0.0):
    """Normalized (cx, cy, w, h) -> pixel (x1, y1, x2, y2) with optional pad offset."""
    scale = jnp.asarray([w, h, w, h], dtype=jnp.result_type(x, jnp.float32))
    pad = jnp.asarray([padw, padh, padw, padh], dtype=scale.dtype)
    return xywh2xyxy(x * scale) + pad


def xyxy2xywhn(x, w: float = 640.0, h: float = 640.0, clip: bool = False, eps: float = 0.0):
    """Pixel (x1, y1, x2, y2) -> normalized (cx, cy, w, h)."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    scale = jnp.asarray([w, h, w, h], dtype=jnp.result_type(x, jnp.float32))
    return xyxy2xywh(x) / scale


def xywh2ltwh(x):
    """(cx, cy, w, h) -> (x1, y1, w, h)."""
    xy, wh = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([xy - wh * 0.5, wh], axis=-1)


def xyxy2ltwh(x):
    """(x1, y1, x2, y2) -> (x1, y1, w, h)."""
    p1, p2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([p1, p2 - p1], axis=-1)


def ltwh2xywh(x):
    """(x1, y1, w, h) -> (cx, cy, w, h)."""
    xy, wh = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([xy + wh * 0.5, wh], axis=-1)


def ltwh2xyxy(x):
    """(x1, y1, w, h) -> (x1, y1, x2, y2)."""
    xy, wh = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([xy, xy + wh], axis=-1)


def clip_boxes(boxes, shape):
    """Clip (..., 4) xyxy boxes to image shape (h, w)."""
    h, w = shape[0], shape[1]
    x1 = jnp.clip(boxes[..., 0:1], 0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding: bool = True):
    """Rescale xyxy boxes from img1_shape (letterboxed) back to img0_shape (original).

    Matches the reference's rounding convention (ops.py:88-127): the pad is
    round((img1 - img0*gain)/2 - 0.1).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1)
        pad_h = round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1)
    else:
        gain = ratio_pad[0][0]
        pad_w, pad_h = ratio_pad[1]

    if padding:
        boxes = boxes - jnp.asarray([pad_w, pad_h, pad_w, pad_h], dtype=jnp.result_type(boxes, jnp.float32))
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)
