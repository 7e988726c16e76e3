"""IoU family and Normalized Wasserstein Distance similarity.

Parity surface: reference ultralytics/utils/metrics.py:74 (bbox_iou with
CIoU/GIoU/DIoU variants), metrics.py:539 (wasserstein_loss), plus the pairwise
box_iou matrix used by the validator and NMS.

All functions are elementwise-broadcastable pure jnp, jit/vmap/grad safe.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _corners(box, xywh: bool):
    if xywh:
        xy, wh = box[..., :2], box[..., 2:4]
        half = wh * 0.5
        return xy - half, xy + half
    return box[..., :2], box[..., 2:4]


def bbox_iou(box1, box2, xywh: bool = True, GIoU: bool = False, DIoU: bool = False,
             CIoU: bool = False, eps: float = 1e-7):
    """Elementwise IoU between broadcastable box arrays (..., 4).

    CIoU follows the reference exactly: the aspect-ratio trade-off factor
    ``alpha`` is treated as a constant w.r.t. gradients (lax.stop_gradient),
    mirroring the ``with torch.no_grad()`` block in metrics.py:124-126.
    """
    p1, p2 = _corners(box1, xywh)
    g1, g2 = _corners(box2, xywh)
    wh1 = p2 - p1
    wh2 = g2 - g1
    w1, h1 = wh1[..., 0], wh1[..., 1] + (0.0 if xywh else eps)
    w2, h2 = wh2[..., 0], wh2[..., 1] + (0.0 if xywh else eps)

    inter_wh = jnp.clip(jnp.minimum(p2, g2) - jnp.maximum(p1, g1), 0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (GIoU or DIoU or CIoU):
        return iou

    cwh = jnp.maximum(p2, g2) - jnp.minimum(p1, g1)  # convex hull
    cw, ch = cwh[..., 0], cwh[..., 1]
    if GIoU:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    c2 = cw**2 + ch**2 + eps  # convex diagonal squared
    rho2 = (((g1[..., 0] + g2[..., 0]) - (p1[..., 0] + p2[..., 0])) ** 2
            + ((g1[..., 1] + g2[..., 1]) - (p1[..., 1] + p2[..., 1])) ** 2) / 4
    if DIoU:
        return iou - rho2 / c2
    # CIoU
    v = (4 / math.pi**2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


def wasserstein_similarity(pred, target, eps: float = 1e-7, constant: float = 12.8):
    """exp(-sqrt(W2)/C) NWD similarity between xyxy boxes (reference metrics.py:539-565).

    Used by the fork's BboxLoss as 0.5*CIoU-loss + 0.5*(1 - NWD). Note the
    reference adds eps only to heights; reproduced for parity.
    """
    w1 = pred[..., 2] - pred[..., 0]
    h1 = pred[..., 3] - pred[..., 1] + eps
    w2 = target[..., 2] - target[..., 0]
    h2 = target[..., 3] - target[..., 1] + eps
    cx1 = pred[..., 0] + w1 / 2
    cy1 = pred[..., 1] + h1 / 2
    cx2 = target[..., 0] + w2 / 2
    cy2 = target[..., 1] + h2 / 2
    center_d = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2 + eps
    wh_d = ((w1 - w2) ** 2 + (h1 - h2) ** 2) / 4
    return jnp.exp(-jnp.sqrt(center_d + wh_d) / constant)


def _obb_covariance(obb):
    """Gaussian covariance terms (a, b, c) of xywhr boxes
    (reference metrics.py _get_covariance_matrix)."""
    w = obb[..., 2]
    h = obb[..., 3]
    r = obb[..., 4]
    a = (w**2) / 12.0
    b = (h**2) / 12.0
    cos = jnp.cos(r)
    sin = jnp.sin(r)
    return (
        a * cos**2 + b * sin**2,
        a * sin**2 + b * cos**2,
        (a - b) * cos * sin,
    )


def probiou(obb1, obb2, CIoU: bool = False, eps: float = 1e-7):
    """Probabilistic IoU between oriented boxes xywhr (reference metrics.py:804,
    arXiv:2106.06072): 1 - Hellinger distance of the box Gaussians."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _obb_covariance(obb1)
    a2, b2, c2 = _obb_covariance(obb2)

    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    t3 = 0.5 * jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0, None)
                        * jnp.clip(a2 * b2 - c2**2, 0, None)) + eps)
        + eps
    )
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1.0 - hd
    if CIoU:
        w1, h1 = obb1[..., 2], obb1[..., 3]
        w2, h2 = obb2[..., 2], obb2[..., 3]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def batch_probiou(obb1, obb2, eps: float = 1e-7):
    """Pairwise probiou (N,5) x (M,5) -> (N,M) (reference metrics.py batch_probiou)."""
    return probiou(obb1[:, None, :], obb2[None, :, :], eps=eps)


def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU matrix between (N, 4) and (M, 4) xyxy boxes -> (N, M)."""
    a1 = box1[:, None, :2]  # (N,1,2)
    a2 = box1[:, None, 2:4]
    b1 = box2[None, :, :2]  # (1,M,2)
    b2 = box2[None, :, 2:4]
    inter_wh = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area1 = jnp.prod(box1[:, 2:4] - box1[:, :2], axis=-1)[:, None]
    area2 = jnp.prod(box2[:, 2:4] - box2[:, :2], axis=-1)[None, :]
    return inter / (area1 + area2 - inter + eps)
