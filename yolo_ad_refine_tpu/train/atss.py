"""ATSS assigner — the fork's selectable alternative to TAL.

Parity surface: reference utils/atss.py:396-549 (ATSSAssigner) +
generate_anchors:52 (grid cell anchors of size grid_cell_size*stride) +
bbox_overlaps:118. Selected in the reference by editing loss.py:383; here via
DetectionLoss(assigner='atss').

Adaptive sample selection: per GT, the topk closest anchor centers per level
are candidates; the IoU threshold is mean+std of candidate IoUs; positives
are candidates above threshold with centers inside the GT. Fully batched and
masked for jit (fixed max_boxes padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.iou import bbox_iou
from yolo_ad_refine_tpu.train.tal import AssignResult


def generate_cell_anchors(feat_shapes, strides, grid_cell_size: float = 5.0,
                          offset: float = 0.5):
    """Per-level cell anchor boxes (A, 4) xyxy + per-level anchor counts."""
    anchors = []
    counts = []
    for (h, w), s in zip(feat_shapes, strides):
        half = grid_cell_size * s * 0.5
        sx = (jnp.arange(w, dtype=jnp.float32) + offset) * s
        sy = (jnp.arange(h, dtype=jnp.float32) + offset) * s
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        centers = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
        anchors.append(jnp.concatenate([centers - half, centers + half], axis=-1))
        counts.append(h * w)
    return jnp.concatenate(anchors), counts


class ATSSAssigner:
    """Adaptive training sample selection (jit-safe)."""

    def __init__(self, topk: int = 9, num_classes: int = 80, eps: float = 1e-9):
        self.topk = topk
        self.nc = num_classes
        self.eps = eps

    def __call__(self, anchors, counts, gt_labels, gt_bboxes, mask_gt, pd_bboxes) -> AssignResult:
        """
        Args:
            anchors: (A, 4) xyxy cell anchors (generate_cell_anchors).
            counts: python list of per-level anchor counts.
            gt_labels: (B, N, 1); gt_bboxes: (B, N, 4) xyxy px; mask_gt (B, N, 1).
            pd_bboxes: (B, A, 4) decoded predictions (used for soft target scores).
        """
        b, n = gt_bboxes.shape[:2]
        a = anchors.shape[0]
        mask_gt_b = mask_gt[..., 0] > 0

        ious = bbox_iou(gt_bboxes[:, :, None, :], anchors[None, None], xywh=False)  # (B,N,A)
        anchor_centers = (anchors[:, :2] + anchors[:, 2:]) / 2  # (A,2)
        gt_centers = (gt_bboxes[..., :2] + gt_bboxes[..., 2:]) / 2  # (B,N,2)
        dist = jnp.linalg.norm(
            gt_centers[:, :, None, :] - anchor_centers[None, None], axis=-1
        )  # (B,N,A)

        # per-level topk closest candidates
        is_candidate = jnp.zeros((b, n, a), bool)
        start = 0
        for c in counts:
            k = min(self.topk, c)
            seg = dist[:, :, start : start + c]
            _, idx = jax.lax.top_k(-seg, k)
            onehot = jnp.sum(jax.nn.one_hot(idx, c, dtype=jnp.int32), axis=-2) > 0
            is_candidate = is_candidate.at[:, :, start : start + c].set(onehot)
            start += c

        cand_ious = jnp.where(is_candidate, ious, 0.0)
        n_cand = jnp.maximum(jnp.sum(is_candidate, axis=-1, keepdims=True), 1)
        mean_iou = jnp.sum(cand_ious, axis=-1, keepdims=True) / n_cand
        var = jnp.sum(jnp.where(is_candidate, (ious - mean_iou) ** 2, 0.0), axis=-1,
                      keepdims=True) / n_cand
        thresh = mean_iou + jnp.sqrt(var)

        # center inside gt
        lt = gt_bboxes[..., None, :2]
        rb = gt_bboxes[..., None, 2:4]
        inside = jnp.min(
            jnp.concatenate([anchor_centers[None, None] - lt, rb - anchor_centers[None, None]],
                            axis=-1), axis=-1,
        ) > self.eps

        mask_pos = (is_candidate & (ious >= thresh) & inside
                    & mask_gt_b[..., None]).astype(jnp.float32)

        # conflicts -> max IoU (same as TAL)
        fg_counts = jnp.sum(mask_pos, axis=-2)
        is_max = jax.nn.one_hot(jnp.argmax(jnp.where(mask_gt_b[..., None], ious, -1.0), axis=1),
                                n, dtype=jnp.float32).transpose(0, 2, 1)
        mask_pos = jnp.where(fg_counts[:, None, :] > 1, is_max, mask_pos)
        fg_mask = jnp.sum(mask_pos, axis=-2) > 0
        target_gt_idx = jnp.argmax(mask_pos, axis=-2).astype(jnp.int32)

        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, self.nc - 1)
        target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
        target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
        # soft scores: one-hot scaled by IoU of the prediction with its target
        pred_iou = jnp.clip(
            bbox_iou(pd_bboxes, target_bboxes, xywh=False), 0.0, None
        )
        target_scores = jax.nn.one_hot(target_labels, self.nc, dtype=jnp.float32)
        target_scores = target_scores * (pred_iou * fg_mask)[..., None]
        target_labels = jnp.where(fg_mask, target_labels, self.nc)
        return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)