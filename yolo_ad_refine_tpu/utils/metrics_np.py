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
