"""OBB task loss (parity: reference utils/loss.py v8OBBLoss +
tal.py RotatedTaskAlignedAssigner + RotatedBboxLoss).

Rotated detection: TAL with probiou overlaps and point-in-rotated-box
candidates; box loss = 1 - probiou; DFL on the axis-aligned distance targets.
GT comes as (B, N, 5) xywhr pixels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.nn.head import dist2rbox
from yolo_ad_refine_tpu.ops.anchors import bbox2dist, make_anchors
from yolo_ad_refine_tpu.ops.boxes import xywh2xyxy
from yolo_ad_refine_tpu.ops.iou import probiou
from yolo_ad_refine_tpu.train.loss import bce_with_logits, dfl_loss
from yolo_ad_refine_tpu.train.tal import AssignResult, TaskAlignedAssigner, _select_topk_candidates


def select_candidates_in_rotated_gts(anc_points, gt_bboxes, eps: float = 1e-9):
    """Anchor centers inside rotated GT boxes (reference tal.py
    RotatedTaskAlignedAssigner.select_candidates_in_gts): corner-vector test.

    anc (A, 2); gt (B, N, 5) xywhr -> (B, N, A) bool.
    """
    cx, cy, w, h, r = (gt_bboxes[..., i] for i in range(5))
    cos, sin = jnp.cos(r), jnp.sin(r)
    # half-extent vectors
    vec1 = jnp.stack([w / 2 * cos, w / 2 * sin], axis=-1)  # (B,N,2)
    vec2 = jnp.stack([-h / 2 * sin, h / 2 * cos], axis=-1)
    ctr = jnp.stack([cx, cy], axis=-1)
    a = ctr - vec1 - vec2  # corner
    b = ctr + vec1 - vec2
    d = ctr - vec1 + vec2
    ap = anc_points[None, None] - a[..., None, :]  # (B,N,A,2)
    ab = (b - a)[..., None, :]
    ad = (d - a)[..., None, :]
    norm_ab = jnp.sum(ab * ab, axis=-1)
    norm_ad = jnp.sum(ad * ad, axis=-1)
    ap_dot_ab = jnp.sum(ap * ab, axis=-1)
    ap_dot_ad = jnp.sum(ap * ad, axis=-1)
    return (
        (ap_dot_ab >= eps) & (ap_dot_ab <= norm_ab) & (ap_dot_ad >= eps) & (ap_dot_ad <= norm_ad)
    )


class RotatedTaskAlignedAssigner(TaskAlignedAssigner):
    """TAL with probiou overlaps and rotated candidate test."""

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        """pd_bboxes/gt_bboxes are (.., 5) xywhr in pixels."""
        b, a = pd_scores.shape[:2]
        n = gt_bboxes.shape[1]
        mask_gt_b = mask_gt[..., 0] > 0
        valid = select_candidates_in_rotated_gts(anc_points, gt_bboxes) & mask_gt_b[..., None]

        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, self.nc - 1)
        bbox_scores = jnp.take_along_axis(pd_scores.transpose(0, 2, 1), labels[:, :, None], axis=1)
        bbox_scores = jnp.where(valid, bbox_scores, 0.0)
        overlaps = probiou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :])
        overlaps = jnp.where(valid, jnp.clip(overlaps, 0.0, None), 0.0)
        align_metric = bbox_scores**self.alpha * overlaps**self.beta

        mask_topk = _select_topk_candidates(
            align_metric, min(self.topk, a),
            jnp.broadcast_to(mask_gt_b[..., None], (b, n, self.topk)),
        )
        mask_pos = mask_topk * valid.astype(align_metric.dtype)
        fg_counts = jnp.sum(mask_pos, axis=-2)
        is_max = jax.nn.one_hot(jnp.argmax(overlaps, axis=1), n,
                                dtype=mask_pos.dtype).transpose(0, 2, 1)
        mask_pos = jnp.where(fg_counts[:, None, :] > 1, is_max, mask_pos)
        fg_mask = jnp.sum(mask_pos, axis=-2) > 0
        target_gt_idx = jnp.argmax(mask_pos, axis=-2).astype(jnp.int32)

        target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
        target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
        target_scores = jax.nn.one_hot(target_labels, self.nc, dtype=pd_scores.dtype)
        target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)
        target_labels = jnp.where(fg_mask, target_labels, self.nc)

        align_metric = align_metric * mask_pos
        pos_align = jnp.max(align_metric, axis=-1, keepdims=True)
        pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
        norm = jnp.max(align_metric * pos_overlaps / (pos_align + self.eps), axis=-2)
        target_scores = target_scores * norm[..., None]
        return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)


class OBBLossOutputs(NamedTuple):
    total: jnp.ndarray
    components: jnp.ndarray  # (3,) [box, cls, dfl]


class OBBLoss:
    """v8OBBLoss: probiou box loss + BCE cls + DFL (reference loss.py v8OBBLoss)."""

    def __init__(self, nc: int, strides, reg_max: int = 16,
                 box_gain: float = 7.5, cls_gain: float = 0.5, dfl_gain: float = 1.5):
        self.nc = nc
        self.strides = tuple(strides)
        self.reg_max = reg_max
        self.no = nc + reg_max * 4
        self.gains = (box_gain, cls_gain, dfl_gain)
        self.assigner = RotatedTaskAlignedAssigner(topk=10, num_classes=nc, alpha=0.5, beta=6.0)

    def __call__(self, preds, gt_labels, gt_rboxes, mask_gt) -> OBBLossOutputs:
        """preds = (feats, angle) — the OBB head's train output;
        gt_rboxes (B, N, 5) xywhr px."""
        feats, pred_angle = preds
        b = feats[0].shape[0]
        rm4 = self.reg_max * 4
        flat = [f.reshape(b, -1, self.no).astype(jnp.float32) for f in feats]
        x = jnp.concatenate(flat, axis=1)
        pred_distri, pred_scores = x[..., :rm4], x[..., rm4:]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(shapes, self.strides, 0.5)

        dist = pred_distri.reshape(b, -1, 4, self.reg_max)
        dist = jnp.einsum("banr,r->ban", jax.nn.softmax(dist, axis=-1),
                          jnp.arange(self.reg_max, dtype=jnp.float32))
        angle = pred_angle.astype(jnp.float32)[..., 0]
        pred_rboxes = jnp.concatenate(
            [dist2rbox(dist, angle, anchor_points[None]), angle[..., None]], axis=-1
        )  # (B, A, 5) grid units + angle

        scale5 = jnp.concatenate([stride_tensor, stride_tensor, jnp.ones_like(stride_tensor[..., :1])], -1)
        assign = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(
                jnp.concatenate([pred_rboxes[..., :4] * stride_tensor[None], angle[..., None]], -1)
            ),
            anchor_points * stride_tensor,
            gt_labels, gt_rboxes.astype(jnp.float32), mask_gt.astype(jnp.float32),
        )
        target_scores_sum = jnp.maximum(jnp.sum(assign.target_scores), 1.0)

        bce = bce_with_logits(pred_scores, assign.target_scores)
        loss_cls = jnp.sum(bce) / target_scores_sum

        tb = assign.target_bboxes
        tb_g = jnp.concatenate([tb[..., :4] / stride_tensor[None], tb[..., 4:]], -1)
        weight = jnp.sum(assign.target_scores, axis=-1) * assign.fg_mask
        iou = probiou(pred_rboxes, tb_g)
        loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

        target_ltrb = bbox2dist(anchor_points[None], xywh2xyxy(tb_g[..., :4]), self.reg_max - 1)
        ldfl = dfl_loss(pred_distri.reshape(b, -1, 4, self.reg_max), target_ltrb, self.reg_max)
        loss_dfl = jnp.sum(ldfl * weight) / target_scores_sum

        comps = jnp.stack([loss_box * self.gains[0], loss_cls * self.gains[1],
                           loss_dfl * self.gains[2]])
        return OBBLossOutputs(jnp.sum(comps) * b, jax.lax.stop_gradient(comps))