"""Task-Aligned Assigner (TOOD/TAL), fully batched and masked for jit.

Parity surface: reference ultralytics/utils/tal.py:13-266 TaskAlignedAssigner
with the fork's configuration topk=10, alpha=0.5, beta=6.0 (loss.py:379).

The reference is already dense (B, max_boxes, A) tensors with masking — this
is a 1:1 functional translation. Dynamic-count GT lists become fixed
(B, max_boxes) padded arrays with a validity mask, so the assigner jits into
the training step. Tie-breaking matches the reference:

- candidate anchors must be strictly inside the GT box (eps margin),
- topk=10 per GT by score^alpha * CIoU^beta, duplicate indices dropped,
- anchors claimed by multiple GTs resolved by max CIoU overlap,
- target scores normalized per-GT by max-metric x max-overlap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.iou import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4) xyxy (same units as inputs)
    target_scores: jnp.ndarray  # (B, A, nc) soft targets
    fg_mask: jnp.ndarray        # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32


def select_candidates_in_gts(anc_points, gt_bboxes, eps: float = 1e-9):
    """Anchors strictly inside GT boxes. anc (A,2), gt (B,N,4) -> (B,N,A)."""
    lt = gt_bboxes[..., None, :2]  # (B,N,1,2)
    rb = gt_bboxes[..., None, 2:4]
    deltas = jnp.concatenate([anc_points[None, None] - lt, rb - anc_points[None, None]], axis=-1)
    return jnp.min(deltas, axis=-1) > eps  # (B,N,A)


def _select_topk_candidates_sort(metrics, topk: int, topk_mask):
    """Per-GT topk anchor mask with duplicate-drop (reference tal.py:127-160).

    Literal translation: lax.top_k (a sort on TPU) + a (B,N,topk,A) one-hot
    count. Kept as the reference formulation for the equivalence test; the
    shipping path below selects the same mask without the sort or the
    rank-4 materialization.
    """
    a = metrics.shape[-1]
    topk_metrics, topk_idxs = jax.lax.top_k(metrics, topk)  # (B,N,topk)
    topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
    count = jnp.sum(jax.nn.one_hot(topk_idxs, a, dtype=jnp.int32), axis=-2)  # (B,N,A)
    count = jnp.where(count > 1, 0, count)  # drop duplicate-hit anchors
    return count.astype(metrics.dtype)


def _select_topk_candidates(metrics, topk: int, topk_mask):
    """Per-GT topk anchor mask, TPU formulation (parity: reference
    tal.py:127-160, equivalence proven in tests/test_loss.py).

    lax.top_k lowers to a full per-row sort on TPU (A=8400 here) and the
    reference's duplicate-drop needs a (B,N,topk,A) one-hot — together they
    dominate assigner time. topk=10 iterations of argmax+mask select the
    identical anchor set with O(topk*B*N*A) elementwise work and no rank-4
    temporary:

    - within a valid row, top_k indices are always distinct, so the
      duplicate-drop only ever fires on rows zeroed by topk_mask (their
      indices collapse to 0 with count=topk>1) — equivalent to masking the
      whole row, which is what the final ``where`` does;
    - tie order among equal metrics can differ from the sort, but ties only
      occur at metric 0 (anchors outside the GT), and the caller multiplies
      by the inside-GT validity mask which zeroes those either way.
    """
    sel = jnp.zeros(metrics.shape, bool)
    m = metrics
    neg = jnp.asarray(-jnp.inf, metrics.dtype)
    for _ in range(topk):  # static unroll: lets XLA fuse the masked maxes
        i = jnp.argmax(m, axis=-1)  # (B,N), lowest index on ties like topk
        hit = jax.nn.one_hot(i, metrics.shape[-1], dtype=bool)
        sel = sel | hit
        m = jnp.where(hit, neg, m)
    row_valid = topk_mask[..., :1] if topk_mask.ndim == metrics.ndim else topk_mask
    return jnp.where(row_valid, sel, False).astype(metrics.dtype)


class TaskAlignedAssigner:
    """Functional TAL assigner; call under jit."""

    def __init__(self, topk: int = 10, num_classes: int = 80, alpha: float = 0.5,
                 beta: float = 6.0, eps: float = 1e-9):
        self.topk = topk
        self.nc = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt) -> AssignResult:
        """
        Args (all image-pixel units):
            pd_scores: (B, A, nc) sigmoided class scores (stop-gradient'd by caller)
            pd_bboxes: (B, A, 4) decoded xyxy
            anc_points: (A, 2) anchor centers
            gt_labels: (B, N, 1) class ids (padded rows arbitrary)
            gt_bboxes: (B, N, 4) xyxy (padded rows zero)
            mask_gt:   (B, N, 1) 1.0 for valid GT rows
        """
        b, a = pd_scores.shape[:2]
        n = gt_bboxes.shape[1]
        if n == 0:
            return AssignResult(
                jnp.full((b, a), self.nc, jnp.int32),
                jnp.zeros((b, a, 4), pd_bboxes.dtype),
                jnp.zeros((b, a, self.nc), pd_scores.dtype),
                jnp.zeros((b, a), bool),
                jnp.zeros((b, a), jnp.int32),
            )

        mask_gt_b = mask_gt[..., 0] > 0  # (B,N)
        mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes, self.eps)  # (B,N,A)
        valid = mask_in_gts & mask_gt_b[..., None]

        # box metrics (reference tal.py:96-125)
        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, self.nc - 1)  # (B,N)
        bbox_scores = jnp.take_along_axis(
            pd_scores.transpose(0, 2, 1), labels[:, :, None], axis=1
        )  # (B,N,A): score of each anchor for the gt's class
        bbox_scores = jnp.where(valid, bbox_scores, 0.0)
        overlaps = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True)
        overlaps = jnp.where(valid, jnp.clip(overlaps, 0.0, None), 0.0)
        align_metric = bbox_scores**self.alpha * overlaps**self.beta

        mask_topk = _select_topk_candidates(
            align_metric, min(self.topk, a), jnp.broadcast_to(mask_gt_b[..., None], (b, n, self.topk))
        )
        mask_pos = mask_topk * valid.astype(align_metric.dtype)  # (B,N,A)

        # resolve multi-GT anchors by max overlap (reference tal.py:221-241)
        fg_counts = jnp.sum(mask_pos, axis=-2)  # (B,A)
        max_overlap_gt = jnp.argmax(overlaps, axis=1)  # (B,A)
        is_max = jax.nn.one_hot(max_overlap_gt, n, dtype=mask_pos.dtype).transpose(0, 2, 1)
        mask_pos = jnp.where((fg_counts[:, None, :] > 1), is_max, mask_pos)
        fg_mask = jnp.sum(mask_pos, axis=-2) > 0  # (B,A)
        target_gt_idx = jnp.argmax(mask_pos, axis=-2).astype(jnp.int32)  # (B,A)

        # gather targets (reference tal.py:243-266)
        target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)  # (B,A)
        target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)  # (B,A,4)
        target_scores = jax.nn.one_hot(target_labels, self.nc, dtype=pd_scores.dtype)
        target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)
        target_labels = jnp.where(fg_mask, target_labels, self.nc)

        # normalize (reference tal.py:82-86)
        align_metric = align_metric * mask_pos
        pos_align = jnp.max(align_metric, axis=-1, keepdims=True)  # (B,N,1)
        pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
        norm = jnp.max(align_metric * pos_overlaps / (pos_align + self.eps), axis=-2)  # (B,A)
        target_scores = target_scores * norm[..., None]

        return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)
