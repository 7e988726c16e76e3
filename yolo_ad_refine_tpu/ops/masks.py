"""Instance-mask postprocessing (parity: reference utils/ops.py process_mask,
crop_mask, scale_masks).

Turns NMS-surviving mask coefficients + prototypes into per-detection binary
masks: sigmoid(coeffs @ proto), cropped to the (downscaled) box, upsampled to
the input size. Pure jnp; jit-safe on fixed (max_det,) shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_mask(masks, boxes):
    """Zero mask pixels outside each box. masks (K, h, w); boxes (K, 4) xyxy
    in mask coords (reference ops.py crop_mask)."""
    k, h, w = masks.shape
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x1, y1, x2, y2 = (boxes[:, i][:, None, None] for i in range(4))
    inside = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
    return masks * inside.astype(masks.dtype)


def mask_iou_matrix(proto, coeffs, boxes_xyxy, img_hw, gt_index_mask, max_gt: int):
    """Per-image mask IoU between predicted and GT instance masks, computed
    at prototype resolution without materializing the full batch of masks.

    Args:
        proto: (mh, mw, nm); coeffs: (K, nm); boxes_xyxy: (K, 4) input px.
        gt_index_mask: (mh, mw) int32 overlap-encoded GT instances.
        max_gt: static number of GT rows.

    Returns (max_gt, K) IoU matrix.
    """
    mh, mw, _ = proto.shape
    pred = process_mask(proto, coeffs, boxes_xyxy, img_hw, upsample=False) > 0.5  # (K, mh, mw)
    pred_f = pred.reshape(pred.shape[0], -1).astype(jnp.float32)  # (K, P)
    gt = (
        gt_index_mask[None] == (jnp.arange(1, max_gt + 1, dtype=jnp.int32)[:, None, None])
    ).reshape(max_gt, -1).astype(jnp.float32)  # (G, P)
    inter = gt @ pred_f.T  # (G, K)
    union = gt.sum(-1, keepdims=True) + pred_f.sum(-1)[None] - inter
    return inter / (union + 1e-7)


def process_mask(proto, coeffs, boxes_xyxy, img_hw, upsample: bool = True):
    """Build binary masks for detections (reference ops.py process_mask).

    Args:
        proto: (mh, mw, nm) prototypes (one image).
        coeffs: (K, nm) mask coefficients of the kept detections.
        boxes_xyxy: (K, 4) boxes in input-image pixels.
        img_hw: (H, W) input size.

    Returns (K, H, W) float masks in [0, 1] if upsample else (K, mh, mw).
    """
    mh, mw, nm = proto.shape
    ih, iw = img_hw
    masks = jax.nn.sigmoid(
        jnp.einsum("kn,hwn->khw", coeffs.astype(jnp.float32), proto.astype(jnp.float32))
    )
    scale = jnp.asarray([mw / iw, mh / ih, mw / iw, mh / ih], jnp.float32)
    masks = crop_mask(masks, boxes_xyxy * scale)
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), method="bilinear")
    return masks
