"""Pose task loss (parity: reference utils/loss.py v8PoseLoss + KeypointLoss).

Detection losses (TAL on boxes) + OKS-style keypoint location loss over
foreground anchors + keypoint-visibility BCE. Fixed-shape jit strategy as in
segment.py: top-max_fg anchors gathered per image.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.anchors import dist2bbox, make_anchors
from yolo_ad_refine_tpu.train.loss import DetectionLoss, bce_with_logits

# COCO 17-keypoint OKS sigmas (reference utils/metrics.py OKS_SIGMA)
OKS_SIGMA = np.array([
    0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62,
    1.07, 1.07, 0.87, 0.87, 0.89, 0.89,
]) / 10.0


class PoseLossOutputs(NamedTuple):
    total: jnp.ndarray
    components: jnp.ndarray  # (5,) [box, kpt_loc, kpt_vis, cls, dfl]


def keypoint_loss(pred_kpts, gt_kpts, kpt_mask, area, sigmas):
    """OKS-style distance loss (reference loss.py:338-352 KeypointLoss)."""
    d = (pred_kpts[..., 0] - gt_kpts[..., 0]) ** 2 + (pred_kpts[..., 1] - gt_kpts[..., 1]) ** 2
    factor = kpt_mask.shape[-1] / (jnp.sum(kpt_mask != 0, axis=-1) + 1e-9)  # (K,)
    e = d / ((2 * sigmas) ** 2 * (area + 1e-9) * 2)
    return jnp.mean(factor[..., None] * ((1 - jnp.exp(-e)) * kpt_mask))


class PoseLoss:
    """Detection loss + keypoint losses for the Pose head."""

    def __init__(self, nc: int, strides, kpt_shape=(17, 3), reg_max: int = 16,
                 max_fg: int = 64, box_gain: float = 7.5, cls_gain: float = 0.5,
                 dfl_gain: float = 1.5, pose_gain: float = 12.0, kobj_gain: float = 1.0):
        self.det = DetectionLoss(nc=nc, strides=strides, reg_max=reg_max,
                                 box_gain=box_gain, cls_gain=cls_gain, dfl_gain=dfl_gain)
        self.kpt_shape = tuple(kpt_shape)
        self.max_fg = max_fg
        self.pose_gain = pose_gain
        self.kobj_gain = kobj_gain
        nk = kpt_shape[0]
        self.sigmas = (
            jnp.asarray(OKS_SIGMA) if tuple(kpt_shape) == (17, 3) else jnp.ones(nk) / nk
        )

    def __call__(self, preds, gt_labels, gt_bboxes, mask_gt, gt_kpts) -> PoseLossOutputs:
        """
        Args:
            preds: (feats, kpt) — the Pose head's train output; kpt (B, A, nk).
            gt_kpts: (B, N, K, 3) keypoints in input pixels (x, y, visibility),
                padded rows zero.
        """
        feats, pred_kpts_raw = preds
        det_out = self.det(feats, gt_labels, gt_bboxes, mask_gt)

        b = feats[0].shape[0]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(shapes, self.det.strides, 0.5)
        k_n, ndim = self.kpt_shape

        # decode predicted keypoints to pixels (reference Pose.kpts_decode)
        kp = pred_kpts_raw.astype(jnp.float32).reshape(b, -1, k_n, ndim)
        xy = (kp[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)) * stride_tensor[None, :, None, :]

        # re-run assignment (XLA CSEs against the det loss's identical subgraph)
        rm4 = self.det.reg_max * 4
        flat = [f.reshape(b, -1, self.det.no).astype(jnp.float32) for f in feats]
        x = jnp.concatenate(flat, axis=1)
        pred_distri, pred_scores = x[..., :rm4], x[..., rm4:]
        dist = pred_distri.reshape(b, -1, 4, self.det.reg_max)
        dist = jnp.einsum("banr,r->ban", jax.nn.softmax(dist, axis=-1),
                          jnp.arange(self.det.reg_max, dtype=jnp.float32))
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)
        assign = self.det.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_labels, gt_bboxes.astype(jnp.float32), mask_gt.astype(jnp.float32),
        )

        def per_image(args):
            fg, gt_idx, tboxes, pxy, pvis_raw, kpts_i = args
            k = min(self.max_fg, fg.shape[0])
            _, sel = jax.lax.top_k(fg.astype(jnp.float32), k)
            valid = jnp.take(fg, sel).astype(jnp.float32)
            gti = jnp.take(gt_idx, sel)
            boxes = jnp.take(tboxes, sel, axis=0)
            area = jnp.clip((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-9, None)
            pk_xy = jnp.take(pxy, sel, axis=0)  # (k, K, 2)
            pk_vis = jnp.take(pvis_raw, sel, axis=0)  # (k, K) logits (ndim==3)
            gk = jnp.take(kpts_i, gti, axis=0)  # (k, K, 3)
            kpt_mask = (gk[..., 2] > 0).astype(jnp.float32) * valid[:, None]
            loc = keypoint_loss(pk_xy, gk[..., :2], kpt_mask, area[:, None], self.sigmas)
            if ndim == 3:
                vis = jnp.mean(bce_with_logits(pk_vis, kpt_mask) * valid[:, None])
            else:
                vis = jnp.zeros(())
            return loc, vis

        vis_raw = kp[..., 2] if ndim == 3 else jnp.zeros_like(kp[..., 0])
        loc_l, vis_l = jax.lax.map(
            per_image,
            (assign.fg_mask, assign.target_gt_idx, assign.target_bboxes, xy, vis_raw,
             gt_kpts.astype(jnp.float32)),
        )
        kpt_loc = jnp.mean(loc_l) * self.pose_gain
        kpt_vis = jnp.mean(vis_l) * self.kobj_gain

        comps = jnp.stack([
            det_out.components[0], jax.lax.stop_gradient(kpt_loc),
            jax.lax.stop_gradient(kpt_vis), det_out.components[1], det_out.components[2],
        ])
        total = det_out.total + (kpt_loc + kpt_vis) * b
        return PoseLossOutputs(total, comps)