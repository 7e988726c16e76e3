"""Segmentation task: loss, trainer wiring, mask utilities.

Parity surface: reference utils/loss.py v8SegmentationLoss (detection losses
+ per-foreground-anchor mask BCE, box-cropped and area-normalized, with
overlap-encoded GT index masks) and models/yolo/segment/. Fixed-shape jit
strategy: instead of boolean-indexing foreground anchors (dynamic), the top
``max_fg`` anchors by foreground-ness are gathered per image and masked —
identical math, static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.anchors import make_anchors
from yolo_ad_refine_tpu.train.loss import DetectionLoss, LossOutputs, bce_with_logits


def crop_mask_weights(h: int, w: int, boxes):
    """Binary crop window per box. boxes: (K, 4) xyxy in mask coords -> (K, h, w)."""
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x1, y1, x2, y2 = (boxes[:, i][:, None, None] for i in range(4))
    return ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)).astype(jnp.float32)


class SegLossOutputs(NamedTuple):
    total: jnp.ndarray
    components: jnp.ndarray  # (4,) [box, seg, cls, dfl] gain-scaled


class SegmentationLoss:
    """Detection loss + mask BCE over foreground anchors."""

    def __init__(self, nc: int, strides, reg_max: int = 16, max_fg: int = 128,
                 box_gain: float = 7.5, cls_gain: float = 0.5, dfl_gain: float = 1.5,
                 nwd_ratio: float = 0.5):
        self.det = DetectionLoss(nc=nc, strides=strides, reg_max=reg_max,
                                 box_gain=box_gain, cls_gain=cls_gain, dfl_gain=dfl_gain,
                                 nwd_ratio=nwd_ratio)
        self.max_fg = max_fg
        self.box_gain = box_gain

    def __call__(self, preds, gt_labels, gt_bboxes, mask_gt, index_masks) -> SegLossOutputs:
        """
        Args:
            preds: (feats, mc, proto) — the Segment head's train output.
            index_masks: (B, mh, mw) int32 instance-index masks (0=background,
                i+1 = GT row i), the reference's overlap_mask encoding.
        """
        feats, mc, proto = preds
        det_out: LossOutputs = self.det(feats, gt_labels, gt_bboxes, mask_gt)

        # re-run the assignment pieces we need (cheap; XLA CSEs the dup work)
        b = feats[0].shape[0]
        rm4 = self.det.reg_max * 4
        flat = [f.reshape(b, -1, self.det.no).astype(jnp.float32) for f in feats]
        x = jnp.concatenate(flat, axis=1)
        pred_distri, pred_scores = x[..., :rm4], x[..., rm4:]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(shapes, self.det.strides, 0.5)
        dist = pred_distri.reshape(b, -1, 4, self.det.reg_max)
        dist = jnp.einsum("banr,r->ban", jax.nn.softmax(dist, axis=-1),
                          jnp.arange(self.det.reg_max, dtype=jnp.float32))
        from yolo_ad_refine_tpu.ops.anchors import dist2bbox

        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)
        assign = self.det.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_labels, gt_bboxes.astype(jnp.float32), mask_gt.astype(jnp.float32),
        )

        mh, mw = proto.shape[1], proto.shape[2]
        imgsz_h = shapes[0][0] * self.det.strides[0]
        imgsz_w = shapes[0][1] * self.det.strides[0]

        def per_image(args):
            fg, gt_idx, tboxes, mc_i, proto_i, idx_mask = args
            k = min(self.max_fg, fg.shape[0])
            score = fg.astype(jnp.float32)
            _, sel = jax.lax.top_k(score, k)  # indices of (up to) K fg anchors
            valid = jnp.take(fg, sel)
            gti = jnp.take(gt_idx, sel)
            boxes = jnp.take(tboxes, sel, axis=0)  # xyxy px
            coeffs = jnp.take(mc_i, sel, axis=0)  # (K, nm)

            gt_masks = (idx_mask[None] == (gti[:, None, None] + 1)).astype(jnp.float32)
            pred = jnp.einsum("kn,hwn->khw", coeffs.astype(jnp.float32),
                              proto_i.astype(jnp.float32))
            bce = bce_with_logits(pred, gt_masks)
            scale = jnp.asarray([mw / imgsz_w, mh / imgsz_h, mw / imgsz_w, mh / imgsz_h])
            mboxes = boxes * scale
            crop = crop_mask_weights(mh, mw, mboxes)
            area = jnp.clip(
                (boxes[:, 2] - boxes[:, 0]) / imgsz_w * (boxes[:, 3] - boxes[:, 1]) / imgsz_h,
                1e-4, None,
            )
            per_anchor = jnp.mean(bce * crop, axis=(1, 2)) / area
            return jnp.sum(per_anchor * valid.astype(jnp.float32))

        seg_losses = jax.lax.map(
            per_image,
            (assign.fg_mask, assign.target_gt_idx, assign.target_bboxes, mc, proto, index_masks),
        )
        n_fg = jnp.maximum(jnp.sum(assign.fg_mask), 1.0)
        seg_loss = jnp.sum(seg_losses) / n_fg * self.box_gain

        comps = jnp.stack([
            det_out.components[0], jax.lax.stop_gradient(seg_loss),
            det_out.components[1], det_out.components[2],
        ])
        total = det_out.total + seg_loss * b
        return SegLossOutputs(total, comps)


# ---------------------------------------------------------------------------
# polygon utilities (dataset side, host numpy/cv2)
# ---------------------------------------------------------------------------


def polygons_to_index_mask(polygons: list[np.ndarray], shape: tuple[int, int]) -> np.ndarray:
    """Render instance polygons (pixel coords) into an int32 index mask
    (reference data/utils.py polygons2masks_overlap: larger instances first,
    later = higher index wins on overlap)."""
    import cv2

    h, w = shape
    mask = np.zeros((h, w), np.int32)
    areas = []
    for poly in polygons:
        m = np.zeros((h, w), np.uint8)
        cv2.fillPoly(m, [poly.astype(np.int32).reshape(-1, 2)], 1)
        areas.append(m.sum())
    order = np.argsort(-np.asarray(areas)) if areas else []
    for rank_idx in order:
        m = np.zeros((h, w), np.uint8)
        cv2.fillPoly(m, [polygons[rank_idx].astype(np.int32).reshape(-1, 2)], 1)
        mask[m > 0] = rank_idx + 1
    return mask
