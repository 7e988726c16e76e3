"""Pallas TPU kernel for the greedy NMS suppression loop.

The suppression pass (reference: torchvision.ops.nms C++/CUDA kernel, called
from ultralytics/utils/ops.py:163) is the only sequential part of NMS. The
XLA fallback in ops/nms.py runs it as a ``lax.fori_loop`` with a
dynamic-slice + dynamic-update-slice per iteration; this kernel keeps every
candidate vector resident in VMEM for the whole loop and uses no dynamic
memory access at all:

- candidates (score-sorted, K of them) are laid out as (K/128, 128) f32
  tiles — whole-K elementwise ops are a handful of vector registers,
- the current candidate's coords/score are extracted with an iota one-hot
  multiply + full reduction (pure VPU; no lane-dynamic indexing, which TPU
  does not support),
- alive/keep masks are f32 0/1 vectors carried as ``fori_loop`` state.

Semantics are identical to ops/nms.py:_suppress (same greedy order, same
IoU epsilon), verified by tests/test_nms_pallas.py in interpret mode and on
device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANES = 128


def _suppress_kernel(boxes_ref, scores_ref, keep_ref, *, iou_thres, conf_thres):
    """boxes_ref: (4, R, 128) xyxy planes; scores_ref: (R, 128) descending;
    keep_ref: (R, 128) f32 out (1.0 = kept)."""
    x1 = boxes_ref[0]
    y1 = boxes_ref[1]
    x2 = boxes_ref[2]
    y2 = boxes_ref[3]
    scores = scores_ref[:]
    r = scores.shape[0]
    k = r * LANES

    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    # flat candidate index for each (row, lane) slot, row-major to match the
    # caller's reshape of the score-sorted (K,) vectors (int32: Mosaic iota
    # must be integer-typed)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    idx = row * LANES + col

    def body(i, state):
        alive, keep = state
        onehot = (idx == i).astype(jnp.float32)
        # scalar extraction of candidate i via one-hot reduction (VPU-only)
        cx1 = jnp.sum(x1 * onehot)
        cy1 = jnp.sum(y1 * onehot)
        cx2 = jnp.sum(x2 * onehot)
        cy2 = jnp.sum(y2 * onehot)
        cs = jnp.sum(scores * onehot)
        carea = jnp.sum(area * onehot)
        calive = jnp.sum(alive * onehot)

        cur_valid = jnp.where((calive > 0.5) & (cs > conf_thres), 1.0, 0.0)
        # IoU of candidate i against every slot
        iw = jnp.maximum(jnp.minimum(cx2, x2) - jnp.maximum(cx1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(cy2, y2) - jnp.maximum(cy1, y1), 0.0)
        inter = iw * ih
        iou = inter / (carea + area - inter + 1e-7)
        # later (lower-score) overlapping candidates die; i itself survives
        kill = jnp.where((idx > i) & (iou > iou_thres), cur_valid, 0.0)
        alive = alive * (1.0 - kill)
        keep = keep + onehot * cur_valid
        return alive, keep

    alive0 = jnp.ones((r, LANES), jnp.float32)
    keep0 = jnp.zeros((r, LANES), jnp.float32)
    _, keep = jax.lax.fori_loop(0, k, body, (alive0, keep0))
    keep_ref[:] = keep


def _suppress_rotated_kernel(planes_ref, scores_ref, keep_ref, *, iou_thres, conf_thres):
    """Rotated greedy NMS via probiou, same structure as _suppress_kernel.
    planes_ref: (6, R, 128) = [x, y, cov_a, cov_b, cov_c, sqrt-term] of the
    candidate Gaussians (precomputed by the wrapper); scores descending."""
    eps = 1e-7
    x = planes_ref[0]
    y = planes_ref[1]
    a = planes_ref[2]
    b = planes_ref[3]
    c = planes_ref[4]
    sq = planes_ref[5]  # clip(a*b - c^2, 0)
    scores = scores_ref[:]
    r = scores.shape[0]
    k = r * LANES

    row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    idx = row * LANES + col

    def body(i, state):
        alive, keep = state
        onehot = (idx == i).astype(jnp.float32)
        x1 = jnp.sum(x * onehot)
        y1 = jnp.sum(y * onehot)
        a1 = jnp.sum(a * onehot)
        b1 = jnp.sum(b * onehot)
        c1 = jnp.sum(c * onehot)
        sq1 = jnp.sum(sq * onehot)
        cs = jnp.sum(scores * onehot)
        calive = jnp.sum(alive * onehot)
        cur_valid = jnp.where((calive > 0.5) & (cs > conf_thres), 1.0, 0.0)

        # probiou of candidate i vs every slot (ops/iou.py:probiou math)
        ab_sum = (a1 + a) * (b1 + b) - (c1 + c) ** 2
        denom = ab_sum + eps
        t1 = ((a1 + a) * (y1 - y) ** 2 + (b1 + b) * (x1 - x) ** 2) / denom * 0.25
        t2 = ((c1 + c) * (x - x1) * (y1 - y)) / denom * 0.5
        t3 = 0.5 * jnp.log(ab_sum / (4.0 * jnp.sqrt(sq1 * sq) + eps) + eps)
        bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
        iou = 1.0 - jnp.sqrt(1.0 - jnp.exp(-bd) + eps)

        kill = jnp.where((idx > i) & (iou > iou_thres), cur_valid, 0.0)
        alive = alive * (1.0 - kill)
        keep = keep + onehot * cur_valid
        return alive, keep

    alive0 = jnp.ones((r, LANES), jnp.float32)
    keep0 = jnp.zeros((r, LANES), jnp.float32)
    _, keep = jax.lax.fori_loop(0, k, body, (alive0, keep0))
    keep_ref[:] = keep


@functools.partial(jax.jit, static_argnames=("iou_thres", "conf_thres", "interpret"))
def suppress_rotated_pallas(rboxes, scores, iou_thres: float, conf_thres: float,
                            interpret: bool = False):
    """Rotated greedy NMS keep-mask via the Pallas probiou kernel.

    Args:
        rboxes: (K, 5) xywhr, centers already class-offset, descending-score
            order.
    Returns keep (K,) bool, identical to ops.nms._suppress_rotated.
    """
    from jax.experimental import pallas as pl

    k = rboxes.shape[0]
    pad = (-k) % LANES
    if pad:
        dead = jnp.zeros((pad, 5), rboxes.dtype).at[:, 2:4].set(1.0)  # unit
        rboxes = jnp.concatenate([rboxes, dead])  # boxes far from everything
        scores = jnp.concatenate([scores, jnp.full((pad,), -1.0, scores.dtype)])
    kp = k + pad
    r = kp // LANES
    rb = rboxes.astype(jnp.float32)
    w2, h2 = rb[:, 2] ** 2 / 12.0, rb[:, 3] ** 2 / 12.0
    cos, sin = jnp.cos(rb[:, 4]), jnp.sin(rb[:, 4])
    a = w2 * cos**2 + h2 * sin**2
    b = w2 * sin**2 + h2 * cos**2
    c = (w2 - h2) * cos * sin
    sq = jnp.clip(a * b - c**2, 0.0, None)
    planes = jnp.stack([rb[:, 0], rb[:, 1], a, b, c, sq]).reshape(6, r, LANES)
    sc = scores.astype(jnp.float32).reshape(r, LANES)
    keep = pl.pallas_call(
        functools.partial(_suppress_rotated_kernel, iou_thres=iou_thres,
                          conf_thres=conf_thres),
        out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.float32),
        interpret=interpret,
    )(planes, sc)
    return keep.reshape(kp)[:k] > 0.5


@functools.partial(jax.jit, static_argnames=("iou_thres", "conf_thres", "interpret"))
def suppress_pallas(boxes, scores, iou_thres: float, conf_thres: float,
                    interpret: bool = False):
    """Greedy NMS keep-mask via the Pallas kernel.

    Args:
        boxes: (K, 4) xyxy, already class-offset, in descending-score order.
        scores: (K,) descending.
    Returns:
        keep: (K,) bool, identical to ops.nms._suppress.
    """
    from jax.experimental import pallas as pl

    k = boxes.shape[0]
    pad = (-k) % LANES  # pad the tail with dead candidates (score -1 never
    if pad:             # passes conf, empty boxes never overlap)
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
        scores = jnp.concatenate([scores, jnp.full((pad,), -1.0, scores.dtype)])
    kp = k + pad
    r = kp // LANES
    planes = boxes.astype(jnp.float32).T.reshape(4, r, LANES)
    sc = scores.astype(jnp.float32).reshape(r, LANES)
    keep = pl.pallas_call(
        functools.partial(_suppress_kernel, iou_thres=iou_thres, conf_thres=conf_thres),
        out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.float32),
        interpret=interpret,
    )(planes, sc)
    return keep.reshape(kp)[:k] > 0.5
