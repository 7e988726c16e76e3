"""Anchor-free grid points and distance<->box transforms.

Parity surface: reference ultralytics/utils/tal.py:303 (make_anchors),
tal.py:318 (dist2bbox), tal.py:330 (bbox2dist).

Anchors live in *feature-grid units* scaled per level by stride, exactly as
the reference. Shapes are static given the feature shapes, so everything jits.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_anchors(feat_shapes, strides, grid_cell_offset: float = 0.5, dtype=jnp.float32):
    """Generate anchor centers from per-level feature map shapes.

    Args:
        feat_shapes: list of (h, w) ints per detection level (static Python ints).
        strides: list/array of per-level strides.
        grid_cell_offset: cell-center offset (0.5 = cell centers).

    Returns:
        anchor_points: (N, 2) xy in grid units, N = sum(h*w).
        stride_tensor: (N, 1) per-anchor stride.
    """
    anchor_points, stride_tensor = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), float(s), dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance, anchor_points, xywh: bool = True):
    """Decode (l, t, r, b) distances at anchor points into boxes.

    distance: (..., N, 4), anchor_points: (..., N, 2). Returns xywh or xyxy.
    """
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(anchor_points, bbox, reg_max: float):
    """Encode xyxy boxes as clamped (l, t, r, b) distances for DFL targets."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(dist, 0, reg_max - 0.01)
