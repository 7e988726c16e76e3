"""Detection training loss — the fork-modified v8DetectionLoss.

Parity surface: reference ultralytics/utils/loss.py
- SlideLoss:18-42 — IoU-adaptive reweighting of per-element BCE
- BboxLoss:264-311 — CIoU loss mixed 50/50 with NWD similarity
  (nwd_loss=True, iou_ratio=0.5), plus DFL cross-entropy:238-261
- v8DetectionLoss:355-520 — TAL assignment (topk=10, alpha=0.5, beta=6.0),
  auto_iou = mean CIoU over foreground pairs feeding SlideLoss, gains
  box=7.5 / cls=0.5 / dfl=1.5 (cfg/default.yaml:97-99), returns
  (loss.sum()*batch_size, detached components).

Everything is fixed-shape: GT comes as padded (B, max_boxes) arrays with a
validity mask, so the whole loss jits into the train step. Loss math runs in
float32 regardless of the model compute dtype.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from yolo_ad_refine_tpu.ops.iou import bbox_iou, wasserstein_similarity
from yolo_ad_refine_tpu.train.tal import TaskAlignedAssigner


class LossOutputs(NamedTuple):
    total: jnp.ndarray       # scalar: loss.sum() * batch_size (reference loss.py:424)
    components: jnp.ndarray  # (3,) detached [box, cls, dfl] (already gain-scaled)


def bce_with_logits(logits, targets):
    """Per-element binary cross-entropy with logits (torch BCEWithLogitsLoss none)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def slide_weight(targets, auto_iou):
    """SlideLoss modulating weight (reference loss.py:24-37).

    Piecewise over the *target score*: 1 below auto_iou-0.1,
    e^(1-auto_iou) inside the band, e^(-(t-1)) above auto_iou.
    """
    auto_iou = jnp.maximum(auto_iou, 0.2)
    b1 = (targets <= auto_iou - 0.1).astype(targets.dtype)
    b2 = ((targets > auto_iou - 0.1) & (targets < auto_iou)).astype(targets.dtype)
    b3 = (targets >= auto_iou).astype(targets.dtype)
    a2 = jnp.exp(1.0 - auto_iou)
    a3 = jnp.exp(-(targets - 1.0))
    return 1.0 * b1 + a2 * b2 + a3 * b3


def dfl_loss(pred_dist, target, reg_max: int = 16):
    """Distribution focal loss on the two adjacent bins (reference loss.py:238-261).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous in
    [0, reg_max-1). Returns (...,) mean over the 4 coords.

    The two-bin cross-entropy -(wl*logp[tl] + wr*logp[tl+1]) is computed
    gather-free as -sum_r logp_r * max(0, 1 - |t - r|): the hat weights are
    exactly (wl, wr) at (tl, tr) and 0 elsewhere. TPU gathers run at scalar
    index rate, so the two take_along_axis picks over (B, A, 4) cost more
    than the whole rest of the loss; the hat sum is dense VPU work
    (equivalence asserted in tests/test_loss.py, A/B in
    benchmarks/bench_loss_post.py).
    """
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    bins = jnp.arange(reg_max, dtype=target.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(target[..., None] - bins))
    return jnp.mean(-jnp.sum(logp * w, axis=-1), axis=-1)


def _dfl_loss_gather(pred_dist, target, reg_max: int = 16):
    """Literal two-gather DFL (the reference's torch formulation); kept for
    the equivalence test against the shipping hat-weight version."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
    return jnp.mean(ce_l * wl + ce_r * wr, axis=-1)


class DetectionLoss:
    """Fork-modified v8 detection loss; pure function of (feats, targets)."""

    def __init__(self, nc: int, strides, reg_max: int = 16, tal_topk: int = 10,
                 box_gain: float = 7.5, cls_gain: float = 0.5, dfl_gain: float = 1.5,
                 nwd_ratio: float = 0.5, use_slide_loss: bool = True, assigner: str = "tal"):
        self.nc = nc
        self.strides = tuple(strides)
        self.reg_max = reg_max
        self.no = nc + reg_max * 4
        self.gains = (box_gain, cls_gain, dfl_gain)
        self.nwd_ratio = nwd_ratio
        self.use_slide_loss = use_slide_loss
        self.assigner_kind = assigner
        self.assigner = TaskAlignedAssigner(topk=tal_topk, num_classes=nc, alpha=0.5, beta=6.0)
        if assigner == "atss":
            from yolo_ad_refine_tpu.train.atss import ATSSAssigner

            self.atss = ATSSAssigner(topk=9, num_classes=nc)
        elif assigner != "tal":
            raise ValueError(f"assigner must be 'tal' or 'atss', got {assigner}")

    def __call__(self, feats, gt_labels, gt_bboxes, mask_gt) -> LossOutputs:
        """
        Args:
            feats: per-level NHWC maps (B, H, W, 4*reg_max + nc) — the head's
                train-mode output.
            gt_labels: (B, N, 1) float/int class ids
            gt_bboxes: (B, N, 4) xyxy in input-image pixels (padded rows 0)
            mask_gt:   (B, N, 1) validity
        """
        b = feats[0].shape[0]
        rm4 = self.reg_max * 4
        flat = [f.reshape(b, -1, self.no).astype(jnp.float32) for f in feats]
        x = jnp.concatenate(flat, axis=1)  # (B, A, no)
        pred_distri, pred_scores = x[..., :rm4], x[..., rm4:]

        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(shapes, self.strides, 0.5)

        # decode predicted boxes in grid units (reference loss.py:410-416)
        dist = pred_distri.reshape(b, -1, 4, self.reg_max)
        dist = jnp.einsum(
            "banr,r->ban", jax.nn.softmax(dist, axis=-1),
            jnp.arange(self.reg_max, dtype=jnp.float32),
        )
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)  # (B, A, 4) grid units

        gt_bboxes = gt_bboxes.astype(jnp.float32)
        mask_gt = mask_gt.astype(jnp.float32)

        if self.assigner_kind == "atss":
            from yolo_ad_refine_tpu.train.atss import generate_cell_anchors

            cell_anchors, counts = generate_cell_anchors(shapes, self.strides)
            assign = self.atss(
                cell_anchors, counts, gt_labels, gt_bboxes, mask_gt,
                jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            )
        else:
            assign = self.assigner(
                jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
                jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
                anchor_points * stride_tensor,
                gt_labels,
                gt_bboxes,
                mask_gt,
            )
        target_bboxes, target_scores, fg_mask = assign.target_bboxes, assign.target_scores, assign.fg_mask
        target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

        # --- bbox + dfl losses (grid units; reference loss.py:290-311,496-500)
        target_bboxes_g = target_bboxes / stride_tensor[None]
        weight = jnp.sum(target_scores, axis=-1) * fg_mask  # (B, A)
        iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)  # (B, A)
        loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum
        nwd = wasserstein_similarity(pred_bboxes, target_bboxes_g)
        loss_nwd = jnp.sum((1.0 - nwd) * weight) / target_scores_sum
        loss_box = self.nwd_ratio * loss_box + (1.0 - self.nwd_ratio) * loss_nwd

        target_ltrb = bbox2dist(anchor_points[None], target_bboxes_g, self.reg_max - 1)
        ldfl = dfl_loss(pred_distri.reshape(b, -1, 4, self.reg_max), target_ltrb, self.reg_max)
        loss_dfl = jnp.sum(ldfl * weight) / target_scores_sum

        # --- cls loss: SlideLoss-modulated BCE (reference loss.py:510-515)
        bce = bce_with_logits(pred_scores, target_scores)
        if self.use_slide_loss:
            n_fg = jnp.maximum(jnp.sum(fg_mask), 1.0)
            auto_iou = jnp.where(
                jnp.sum(fg_mask) > 0,
                jnp.sum(jax.lax.stop_gradient(iou) * fg_mask) / n_fg,
                -1.0,
            )
            bce = bce * slide_weight(target_scores, auto_iou)
        loss_cls = jnp.sum(bce) / target_scores_sum

        comps = jnp.stack(
            [loss_box * self.gains[0], loss_cls * self.gains[1], loss_dfl * self.gains[2]]
        )
        return LossOutputs(jnp.sum(comps) * b, jax.lax.stop_gradient(comps))


class E2EDetectLoss:
    """YOLOv10 dual-assignment loss (reference utils/loss.py E2EDetectLoss):
    the one2many branch trains with TAL topk=10, the gradient-detached
    one2one branch with topk=1 (consistent dual assignment, arXiv:2405.14458).
    Totals and components are the sums of both branches."""

    def __init__(self, nc: int, strides, **kw):
        self.one2many = DetectionLoss(nc, strides, tal_topk=10, **kw)
        self.one2one = DetectionLoss(nc, strides, tal_topk=1, **kw)

    def __call__(self, preds, gt_labels, gt_bboxes, mask_gt) -> LossOutputs:
        """preds = {'one2many': feats, 'one2one': feats} — the v10Detect
        head's train output (eval returns the same dict as its 2nd value)."""
        m = self.one2many(preds["one2many"], gt_labels, gt_bboxes, mask_gt)
        o = self.one2one(preds["one2one"], gt_labels, gt_bboxes, mask_gt)
        return LossOutputs(m.total + o.total, m.components + o.components)
