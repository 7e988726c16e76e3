"""Fixed-shape, jit-safe non-maximum suppression.

Capability parity with reference ultralytics/utils/ops.py:163 which relies on
``torchvision.ops.nms`` (a C++/CUDA kernel). TPUs have no dynamic-shape NMS
op, so this implements the same semantics (confidence filter -> class-offset
boxes -> greedy IoU suppression -> max_det) with static shapes:

- candidates are reduced to the top ``max_nms`` scores (reference sorts and
  truncates at 30000; detections beyond that are equally dropped there),
- greedy suppression runs as a ``lax.fori_loop`` over the sorted candidates,
- output is a fixed (max_det, 6) tensor plus a valid-count, compacted with a
  scatter (invalid rows are zero).

Everything jits and vmaps over the batch; no host sync inside.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.boxes import xywh2xyxy


def _suppress(boxes, scores, iou_thres, conf_thres):
    """Greedy NMS over score-sorted candidates. boxes (K,4) xyxy (already
    class-offset), scores (K,) descending. Returns keep mask (K,) bool."""
    k = boxes.shape[0]
    area = jnp.prod(jnp.clip(boxes[:, 2:4] - boxes[:, :2], 0, None), axis=-1)

    def body(i, state):
        alive, keep = state
        cur_valid = alive[i] & (scores[i] > conf_thres)
        # IoU of candidate i against everyone
        lt = jnp.maximum(boxes[i, :2], boxes[:, :2])
        rb = jnp.minimum(boxes[i, 2:4], boxes[:, 2:4])
        inter = jnp.prod(jnp.clip(rb - lt, 0, None), axis=-1)
        iou = inter / (area[i] + area - inter + 1e-7)
        # later (lower-score) candidates overlapping i die; i itself survives
        idx = jnp.arange(k)
        kill = cur_valid & (idx > i) & (iou > iou_thres)
        alive = alive & ~kill
        keep = keep.at[i].set(cur_valid)
        return alive, keep

    alive0 = jnp.ones((k,), dtype=bool)
    keep0 = jnp.zeros((k,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, k, body, (alive0, keep0))
    return keep


def _suppress_rotated(rboxes, scores, iou_thres, conf_thres):
    """Greedy rotated NMS via probiou (reference utils/ops.py nms_rotated,
    called for OBB at ops.py:296). rboxes (K, 5) xywhr, centers already
    class-offset; scores (K,) descending. Returns keep mask (K,) bool."""
    from yolo_ad_refine_tpu.ops.iou import probiou

    k = rboxes.shape[0]

    def body(i, state):
        alive, keep = state
        cur_valid = alive[i] & (scores[i] > conf_thres)
        iou = probiou(rboxes[i][None], rboxes)  # (K,)
        idx = jnp.arange(k)
        kill = cur_valid & (idx > i) & (iou > iou_thres)
        alive = alive & ~kill
        keep = keep.at[i].set(cur_valid)
        return alive, keep

    alive0 = jnp.ones((k,), dtype=bool)
    keep0 = jnp.zeros((k,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, k, body, (alive0, keep0))
    return keep


def _suppress_auto(boxes, scores, iou_thres, conf_thres, use_pallas):
    """Dispatch to the Pallas VMEM-resident kernel on TPU (ops/nms_pallas.py),
    else the lax loop. use_pallas=None -> auto by backend."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from yolo_ad_refine_tpu.ops.nms_pallas import suppress_pallas

        return suppress_pallas(boxes, scores, iou_thres, conf_thres)
    return _suppress(boxes, scores, iou_thres, conf_thres)


def _suppress_rotated_auto(rboxes, scores, iou_thres, conf_thres, use_pallas):
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from yolo_ad_refine_tpu.ops.nms_pallas import suppress_rotated_pallas

        return suppress_rotated_pallas(rboxes, scores, iou_thres, conf_thres)
    return _suppress_rotated(rboxes, scores, iou_thres, conf_thres)


def _nms_single(pred, extra, conf_thres, iou_thres, max_det, max_nms, max_wh, multi_label,
                agnostic, nc, use_pallas=None, rotated=False):
    """NMS for one image. pred: (N, 4+nc) with xywh + per-class scores;
    extra: (N, E) per-anchor features carried through (mask coeffs, angles)."""
    boxes_xywh = pred[:, :4]
    scores_all = pred[:, 4 : 4 + nc]  # (N, nc)
    n = scores_all.shape[0]

    if multi_label and nc > 1:
        flat = scores_all.reshape(-1)  # (N*nc,)
        flat = jnp.where(flat > conf_thres, flat, -1.0)
        k = min(max_nms, flat.shape[0])
        top_scores, top_idx = jax.lax.top_k(flat, k)
        anchor_idx = top_idx // nc
        cls_idx = (top_idx % nc).astype(jnp.float32)
    else:
        conf = jnp.max(scores_all, axis=-1)  # (N,)
        cls = jnp.argmax(scores_all, axis=-1).astype(jnp.float32)
        conf = jnp.where(conf > conf_thres, conf, -1.0)
        k = min(max_nms, n)
        top_scores, anchor_idx = jax.lax.top_k(conf, k)
        cls_idx = cls[anchor_idx]

    offset = jnp.zeros_like(cls_idx) if agnostic else cls_idx * max_wh
    if rotated:
        # rotated boxes: keep xywh rows, suppress via probiou with the angle
        # carried in the first extra column (reference ops.py:279-299)
        cand_boxes = boxes_xywh[anchor_idx]  # (K,4) xywh
        angle = extra[anchor_idx][:, :1]  # (K,1)
        rb = jnp.concatenate([cand_boxes[:, :2] + offset[:, None], cand_boxes[:, 2:4],
                              angle], axis=-1)
        keep = _suppress_rotated_auto(rb, top_scores, iou_thres, conf_thres, use_pallas)
    else:
        cand_boxes = xywh2xyxy(boxes_xywh[anchor_idx])  # (K,4)
        keep = _suppress_auto(cand_boxes + offset[:, None], top_scores, iou_thres,
                              conf_thres, use_pallas)

    # compact kept rows (already score-sorted) into a fixed (max_det, 6) output
    rows = jnp.concatenate([cand_boxes, top_scores[:, None], cls_idx[:, None]], axis=-1)
    rank = jnp.cumsum(keep) - 1
    dst = jnp.where(keep & (rank < max_det), rank, max_det)
    out = jnp.zeros((max_det + 1, 6), dtype=rows.dtype).at[dst].set(rows, mode="drop")[:max_det]
    n_valid = jnp.minimum(jnp.sum(keep), max_det).astype(jnp.int32)
    extra_rows = extra[anchor_idx]  # (K, E)
    extra_out = jnp.zeros((max_det + 1, extra.shape[-1]), dtype=extra.dtype).at[dst].set(
        extra_rows, mode="drop"
    )[:max_det]
    return out, n_valid, extra_out


@partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms", "max_wh", "multi_label", "agnostic", "nc", "use_pallas", "rotated"),
)
def non_max_suppression(
    prediction,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 2048,
    max_wh: float = 7680.0,
    multi_label: bool = False,
    agnostic: bool = False,
    nc: int = 80,
    use_pallas: bool | None = None,
    rotated: bool = False,
):
    """Batched fixed-shape NMS.

    Args:
        prediction: (B, N, 4+nc[+E]) — xywh boxes + sigmoided class scores
            (channels-last; the transpose of the reference's (B, 4+nc, N)).
            Columns beyond 4+nc (mask coefficients, angles) are carried
            through and returned gathered per detection.

    Returns:
        detections: (B, max_det, 6) rows of (x1, y1, x2, y2, conf, cls);
            rows beyond the per-image count are zero.
        counts: (B,) int32 number of valid detections per image.
        extras: (B, max_det, E) carried columns (E=0 when none given).
    """
    pred = prediction[..., : 4 + nc]
    extra = prediction[..., 4 + nc :]
    fn = partial(
        _nms_single,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        max_det=max_det,
        max_nms=max_nms,
        max_wh=max_wh,
        multi_label=multi_label,
        agnostic=agnostic,
        nc=nc,
        use_pallas=use_pallas,
        rotated=rotated,
    )
    det, cnt, extras = jax.vmap(fn)(pred, extra)
    return det, cnt, extras
