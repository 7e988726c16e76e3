"""Small numpy geometry helpers for host-side metric accumulation."""

from __future__ import annotations

import numpy as np


def box_iou_np(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Pairwise IoU of (N,4) x (M,4) xyxy boxes -> (N,M)."""
    a1, a2 = box1[:, None, :2], box1[:, None, 2:4]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:4]
    inter = np.clip(np.minimum(a2, b2) - np.maximum(a1, b1), 0, None).prod(-1)
    area1 = np.prod(box1[:, 2:4] - box1[:, :2], -1)[:, None]
    area2 = np.prod(box2[:, 2:4] - box2[:, :2], -1)[None, :]
    return inter / (area1 + area2 - inter + eps)


def _obb_cov_np(rb: np.ndarray):
    """Gaussian covariance terms of xywhr boxes (ops/iou.py:_obb_covariance)."""
    a = rb[..., 2] ** 2 / 12.0
    b = rb[..., 3] ** 2 / 12.0
    c, s = np.cos(rb[..., 4]), np.sin(rb[..., 4])
    return a * c**2 + b * s**2, a * s**2 + b * c**2, (a - b) * c * s


def probiou_np(rb1: np.ndarray, rb2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Pairwise probabilistic IoU of (N,5) x (M,5) xywhr boxes -> (N,M)
    (numpy port of ops/iou.py:probiou for host-side OBB matching)."""
    r1, r2 = rb1[:, None, :], rb2[None, :, :]
    x1, y1, x2, y2 = r1[..., 0], r1[..., 1], r2[..., 0], r2[..., 1]
    a1, b1, c1 = _obb_cov_np(r1)
    a2, b2, c2 = _obb_cov_np(r2)
    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    t3 = 0.5 * np.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * np.sqrt(np.clip(a1 * b1 - c1**2, 0, None)
                       * np.clip(a2 * b2 - c2**2, 0, None)) + eps)
        + eps
    )
    bd = np.clip(t1 + t2 + t3, eps, 100.0)
    return 1.0 - np.sqrt(1.0 - np.exp(-bd) + eps)


def kpt_iou_np(gt_kpts: np.ndarray, pred_kpts: np.ndarray, area: np.ndarray,
               sigmas: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """OKS between (N,K,3) gt and (M,K,2+) predicted keypoints -> (N,M)
    (numpy port of reference utils/metrics.py kpt_iou). area: (N,) gt box
    areas; scale-invariant, so any uniformly-scaled coordinate frame works."""
    d = ((gt_kpts[:, None, :, 0] - pred_kpts[None, :, :, 0]) ** 2
         + (gt_kpts[:, None, :, 1] - pred_kpts[None, :, :, 1]) ** 2)  # (N,M,K)
    mask = (gt_kpts[:, None, :, 2] > 0).astype(np.float64)
    e = d / (2 * sigmas[None, None]) ** 2 / (area[:, None, None] + eps) / 2
    return (np.exp(-e) * mask).sum(-1) / (mask.sum(-1) + eps)
