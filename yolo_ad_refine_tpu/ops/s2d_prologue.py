"""Blocked space-to-depth rewrite of the shallow stage (rows 0-4, inference).

Round-4 extension of ops/s2d_stem.py (which rewrites rows 0-1 only).
Motivation: chained-truth attribution (benchmarks/bench_body.py) puts the
flagship's rows 0-3 at **9.7 of the 14.9 ms** bs32/640 body forward against
a ~0.9 ms unpadded-HBM floor. The cause is layout, not FLOPs: these rows
run at C = 16/32/64 of the TPU's 128 vector lanes, so XLA moves mostly
lane-padding through HBM and tiles matmuls with 1/8-1/2-empty N.

The fix keeps the shallow stage in a space-to-depth(2) **blocked layout**
(B, H/2, W/2, 4C), phase-major (channel = (2*dy+dx)*C + c), where
C_eff = 4C fills the lanes, and rewrites each conv as an EXACT scattered-
weight equivalent on the blocked grid:

- 1x1 conv C->C'        == 1x1 conv 4C->4C' with W' = kron(I4, W)
  (4x FLOPs, all zeros-structured — free in an HBM-bound stage)
- 3x3 s1 conv C->C'     == 3x3 block conv 4C->4C': output phase (a,b)
  tap (u,v) reads input row 2I + (a+u-1): block row offset
  U = floor((a+u-1)/2), in-block phase du = (a+u-1) % 2  (4x FLOPs)
- 3x3 s2 conv C->C' (blocked in AND out) == 3x3 stride-1... see
  k3s2_block_map: out-grid phase a at out-block I reads in-grid rows
  2(2I+a) + u - 1 => in-block row 2I + U, U = floor((2a+u-1)/2) in
  {-1,0,1} — a 3x3 stride-2 conv on the block grid (4x FLOPs)

BatchNorm (eval = affine) folds into weights + a per-phase-tiled bias and
SiLU is elementwise in any channel order, so the rewrite is mathematically
identical to the module path (same argument as ops/s2d_stem.py; bf16
re-rounding of w*gamma only — the reference's own fuse() does the same,
ultralytics/nn/tasks.py:203).

Covered pattern (flagship AND stock yolo11 backbones, rows 0-4):
    0 Conv(c1, 3, 2)  1 Conv(c2, 3, 2)  2 C3k2(c3, c3k=False)
    3 Conv(c4, 3, 2)  4 C3k2(c5, c3k=False)
Rows 0-1 reuse the existing stem-pair rewrite; rows 2-4 run blocked; the
result un-blocks to row 4's exact output and the graph continues at row 5.

Enabled via YAT_PROLOGUE = auto (default: on for TPU) | 1 | 0. When rows
2-4 don't match the pattern the model falls back to the stem-pair rewrite
(YAT_STEM_S2D) and then the plain module path.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from yolo_ad_refine_tpu.ops.s2d_stem import (
    _fold_bn,
    stem_pair_eligible,
    stem_pair_infer,
)

__all__ = ["prologue_eligible", "prologue_infer", "prologue_enabled",
           "prologue_train", "prologue_train_enabled"]


def prologue_enabled() -> bool:
    v = os.environ.get("YAT_PROLOGUE", "auto").lower()
    if v in ("1", "true", "on"):
        return True
    if v in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# scatter maps: indices into flat(W) + one trailing zero slot, built once
# per channel signature (lru_cache) and applied to the folded weights as a
# traced gather inside jit (tiny tensors).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def kron4_map(ci: int, co: int):
    z = ci * co
    G = np.full((1, 1, 4 * ci, 4 * co), z, np.int32)
    src = np.arange(ci * co, dtype=np.int32).reshape(ci, co)
    for p in range(4):
        G[0, 0, p * ci:(p + 1) * ci, p * co:(p + 1) * co] = src
    return G


@lru_cache(maxsize=32)
def k3s1_block_map(ci: int, co: int):
    z = 9 * ci * co
    G = np.full((3, 3, 4 * ci, 4 * co), z, np.int32)
    for a in range(2):
        for b in range(2):
            for u in range(3):
                for v in range(3):
                    ry, rx = a + u - 1, b + v - 1
                    U, du = ry // 2 + 1, ry % 2
                    V, dv = rx // 2 + 1, rx % 2
                    base = (u * 3 + v) * ci * co
                    blk = np.arange(ci * co, dtype=np.int32).reshape(ci, co) + base
                    G[U, V, (2 * du + dv) * ci:(2 * du + dv + 1) * ci,
                      (2 * a + b) * co:(2 * a + b + 1) * co] = blk
    return G


@lru_cache(maxsize=32)
def k3s2_block_map(ci: int, co: int):
    """3x3 s2 conv on the 2H grid, blocked (H-grid) in -> blocked (H/2-grid)
    out. Out phase (a,b) at out-block (I,J) is the conv at 2H-grid pixel
    (2*(2I+a), ...) reading rows 2(2I+a)+u-1 = 2(2I+U)+du with
    2U+du = 2a+u-1."""
    z = 9 * ci * co
    G = np.full((3, 3, 4 * ci, 4 * co), z, np.int32)
    for a in range(2):
        for b in range(2):
            for u in range(3):
                for v in range(3):
                    ry, rx = 2 * a + u - 1, 2 * b + v - 1
                    U, du = ry // 2 + 1, ry % 2
                    V, dv = rx // 2 + 1, rx % 2
                    base = (u * 3 + v) * ci * co
                    blk = np.arange(ci * co, dtype=np.int32).reshape(ci, co) + base
                    G[U, V, (2 * du + dv) * ci:(2 * du + dv + 1) * ci,
                      (2 * a + b) * co:(2 * a + b + 1) * co] = blk
    return G


def _scatter(w_flat, G, dtype):
    pad = jnp.zeros((1,), w_flat.dtype)
    return jnp.concatenate([w_flat.reshape(-1), pad])[G].astype(dtype)


# Differentiable blocked-weight builders. The eval path may use either
# form, but the TRAIN path must use these: the gather form's VJP is a
# scatter-add over the (3,3,4ci,4co) cotangent — the TPU scalar-scatter
# trap (docs/performance.md) a third time, measured +7 ms on the bs16
# train step. Static .at[].set block writes differentiate to slice reads.


def kron4_w(w):
    """(1,1,ci,co) -> (1,1,4ci,4co) block-diagonal (1x1 conv on 4 phases)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for p in range(4):
        out = out.at[0, 0, p * ci:(p + 1) * ci, p * co:(p + 1) * co].set(w[0, 0])
    return out


def k3s1_w(w):
    """(3,3,ci,co) -> (3,3,4ci,4co): 3x3 s1 conv in blocked layout."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for u in range(3):
                for v in range(3):
                    ry, rx = a + u - 1, b + v - 1
                    U, du = ry // 2 + 1, ry % 2
                    V, dv = rx // 2 + 1, rx % 2
                    out = out.at[
                        U, V, (2 * du + dv) * ci:(2 * du + dv + 1) * ci,
                        (2 * a + b) * co:(2 * a + b + 1) * co].set(w[u, v])
    return out


def k3s2_w(w):
    """(3,3,ci,co) -> (3,3,4ci,4co): 3x3 s2 conv, blocked in AND out."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for u in range(3):
                for v in range(3):
                    ry, rx = 2 * a + u - 1, 2 * b + v - 1
                    U, du = ry // 2 + 1, ry % 2
                    V, dv = rx // 2 + 1, rx % 2
                    out = out.at[
                        U, V, (2 * du + dv) * ci:(2 * du + dv + 1) * ci,
                        (2 * a + b) * co:(2 * a + b + 1) * co].set(w[u, v])
    return out


def b2d(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C) phase-major."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def d2b(x, C):
    """(B,h,w,4C) phase-major -> (B,2h,2w,C)."""
    B, h, w, _ = x.shape
    x = x.reshape(B, h, w, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * h, 2 * w, C)


# ---------------------------------------------------------------------------
# blocked primitives (eval-mode: BN folded, SiLU inline)
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _g1_mode() -> str:
    """kron(I4, W) 1x1 conv formulation. The block-diagonal structure is 4
    groups sharing W (1x FLOPs vs the 4x scattered dense form):

      scatter  dense 4C->4C' conv with kron(I4, W) weights (round-4)
      group    feature_group_count=4 conv — measured WORSE on TPU
               (pro 5.4 -> 8.8 ms; XLA's grouped lowering relayouts)
      mm       (B*h*w*4, C) @ (C, C') matmul with phase folded into M

    A/B'd on TPU (docs/performance.md round-5); default = best measured.
    """
    return os.environ.get("YAT_PROLOGUE_G1", "scatter").lower()


def _conv_bn_silu_blocked(x4, params, stats, G, dtype, *, stride=1, pad=1,
                          kind="k3"):
    """Blocked Conv+BN+SiLU from module params (conv/kernel + bn)."""
    w, b = _fold_bn(params["conv"]["kernel"], params["bn"], stats["bn"])
    b4 = jnp.tile(b, 4).astype(dtype)
    mode = _g1_mode()
    if kind == "1x1" and mode in ("group", "1", "on", "true"):
        wg = jnp.tile(w.astype(dtype), (1, 1, 1, 4))  # (1,1,ci,4co)
        y = jax.lax.conv_general_dilated(
            x4, wg, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=_DN, feature_group_count=4)
        return jax.nn.silu(y + b4)
    if kind == "1x1" and mode == "mm":
        Bb, h, ww, c4 = x4.shape
        ci = c4 // 4
        y = jnp.einsum("bhwpc,cd->bhwpd",
                       x4.reshape(Bb, h, ww, 4, ci),
                       w[0, 0].astype(dtype)).reshape(Bb, h, ww, -1)
        return jax.nn.silu(y + b4)
    w4 = _scatter(w, G, dtype)
    y = jax.lax.conv_general_dilated(
        x4, w4, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=_DN)
    return jax.nn.silu(y + b4)


def _phase_split(x4, splits):
    """Split blocked channels per phase: (B,h,w,4C) -> tuple of (B,h,w,4Ci)."""
    B, h, w, C4 = x4.shape
    C = C4 // 4
    x = x4.reshape(B, h, w, 4, C)
    out, o = [], 0
    for s in splits:
        out.append(x[..., o:o + s].reshape(B, h, w, 4 * s))
        o += s
    return tuple(out)


def _phase_concat(xs):
    """Concat blocked tensors per phase (inverse of _phase_split)."""
    B, h, w, _ = xs[0].shape
    parts = [x.reshape(B, h, w, 4, x.shape[-1] // 4) for x in xs]
    return jnp.concatenate(parts, axis=-1).reshape(B, h, w, -1)


def _c3k2_blocked(x4, params, stats, spec, dtype):
    """C3k2 (c3k=False == C2f semantics) entirely in blocked layout."""
    m = spec.module
    c = int(m.c2 * m.e)
    cv1 = params["cv1"]
    ci = x4.shape[-1] // 4
    y = _conv_bn_silu_blocked(x4, cv1, stats["cv1"], kron4_map(ci, 2 * c),
                              dtype, stride=1, pad=0, kind="1x1")
    a, b = _phase_split(y, (c, c))
    ys = [a, b]
    c_ = int(c * 0.5)  # C3k2(c3k=False) inner Bottleneck e=0.5 (nn/block.py)
    for i in range(m.n):
        bp, bs = params[f"m{i}"], stats[f"m{i}"]
        h = _conv_bn_silu_blocked(ys[-1], bp["cv1"], bs["cv1"],
                                  k3s1_block_map(c, c_), dtype)
        h = _conv_bn_silu_blocked(h, bp["cv2"], bs["cv2"],
                                  k3s1_block_map(c_, c), dtype)
        ys.append(ys[-1] + h if m.shortcut else h)
    cat = _phase_concat(ys)
    return _conv_bn_silu_blocked(cat, params["cv2"], stats["cv2"],
                                 kron4_map((2 + m.n) * c, m.c2), dtype,
                                 stride=1, pad=0, kind="1x1")


# ---------------------------------------------------------------------------
# eligibility + fused forward
# ---------------------------------------------------------------------------


def _is_plain_c3k2(m) -> bool:
    if type(m).__name__ != "C3k2":
        return False
    # c3k=True swaps Bottleneck for C3k inner blocks — not covered
    if getattr(m, "c3k", False):
        return False
    return getattr(m, "g", 1) == 1


def prologue_eligible(specs, save):
    """Match rows 0-4 = Conv,Conv,C3k2(c3k=False),Conv,C3k2(c3k=False) with
    rows 0-3 not in the savelist. Returns meta dict or None."""
    stem = stem_pair_eligible(specs, save)
    if stem is None or len(specs) < 6:
        return None
    if any(i in save for i in (1, 2, 3)):
        return None
    s2, s3, s4 = specs[2], specs[3], specs[4]
    if not (_is_plain_c3k2(s2.module) and _is_plain_c3k2(s4.module)):
        return None
    if s2.f != -1 or s3.f != -1 or s4.f != -1:
        return None
    m3 = s3.module
    if type(m3).__name__ != "Conv":
        return None
    if (getattr(m3, "k", None), getattr(m3, "s", None)) != (3, 2):
        return None
    if (getattr(m3, "g", 1), getattr(m3, "d", 1)) != (1, 1):
        return None
    if getattr(m3, "p", None) is not None or getattr(m3, "act", True) is not True:
        return None
    return {"stem": stem, "s2": s2, "s3": s3, "s4": s4}


def prologue_rows() -> int:
    """How many leading yaml rows the eval prologue covers (4 or 5).

    upto=4 unblocks after row 3 (module row 4 at the P3 grid is already
    lane-healthy) — measured 23.39 ms vs 22.69 for upto=5 on the flagship
    bs32/640, so the blocked row 4 stays the default; the knob remains
    for configs with wider row-4 channels."""
    v = os.environ.get("YAT_PROLOGUE_ROWS", "5")
    return 4 if v == "4" else 5


def prologue_infer(variables, x, dtype, meta, upto: int = 5):
    """Fused eval forward of yaml rows [0, upto); returns row upto-1's
    exact output for the graph to continue at start_at=upto."""
    p, s = variables["params"], variables["batch_stats"]
    y1 = stem_pair_infer(variables, x, dtype, meta["stem"])   # rows 0-1
    y = b2d(y1)                                               # (H/8, 4*c2)
    y = _c3k2_blocked(y, p["modules_2"], s["modules_2"], meta["s2"], dtype)
    m3 = meta["s3"].module
    ci3 = meta["s2"].module.c2
    y = _conv_bn_silu_blocked(y, p["modules_3"], s["modules_3"],
                              k3s2_block_map(ci3, m3.c2), dtype,
                              stride=2, pad=1)                # blocked s2
    if upto == 4:
        return d2b(y, m3.c2)
    y = _c3k2_blocked(y, p["modules_4"], s["modules_4"], meta["s4"], dtype)
    return d2b(y, meta["s4"].module.c2)


# ---------------------------------------------------------------------------
# train-mode blocked prologue: live BatchNorm with per-phase stat combination
# ---------------------------------------------------------------------------
#
# The eval prologue folds BN into weights; training needs true batch stats.
# In the phase-major blocked layout an original channel c occupies the 4
# phase-channels {p*C + c}, whose positions tile the original (B, H, W)
# exactly, so reducing over (B, h, w, phase) yields the SAME value set the
# module path reduces over — batch mean/var (two-pass, matching the
# repo's BatchNorm subclass) are identical up to fp summation order. The
# running-stat updates (momentum 0.97) are returned as a subtree for the
# train step to merge into the mutated batch_stats, and every op is plain
# jnp, so the VJPs run in the same lane-filled blocked layout — this is
# what makes the rewrite pay in the BACKWARD pass too (the eval-only
# prologue cannot help training; docs/performance.md round-4 attribution
# put the shallow-layout tax at a large share of the 19 ms body backward).


def prologue_train_enabled() -> bool:
    v = os.environ.get("YAT_PROLOGUE_TRAIN", "auto").lower()
    if v in ("1", "true", "on"):
        return True
    if v in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"


def _bn_silu_blocked_train(y, bn_params, bn_stats, dtype, eps=1e-3,
                           momentum=0.97):
    """Blocked train BatchNorm + SiLU; returns (out, new running stats).

    Works for any phase multiple ph = y.shape[-1] // C, including ph=1
    (plain layout)."""
    B, h, w, C4 = y.shape
    C = bn_params["scale"].shape[0]
    ph = C4 // C
    yr = y.reshape(B, h, w, ph, C).astype(jnp.float32)
    mean = jnp.mean(yr, axis=(0, 1, 2, 3))
    var = jnp.mean(jnp.square(yr - mean), axis=(0, 1, 2, 3))
    out = (yr - mean) * jax.lax.rsqrt(var + eps)
    out = out * bn_params["scale"] + bn_params["bias"]
    out = jax.nn.silu(out.reshape(B, h, w, C4).astype(dtype))
    new = {"mean": bn_stats["mean"] * momentum + mean * (1.0 - momentum),
           "var": bn_stats["var"] * momentum + var * (1.0 - momentum)}
    return out, new


def _conv_bn_silu_blocked_train(x4, params, stats, build, dtype, *, stride=1,
                                pad=1):
    w = params["conv"]["kernel"]
    mode = _g1_mode()
    if build is kron4_w and mode in ("group", "1", "on", "true"):
        # block-diagonal 1x1 == 4 weight-shared groups: 1x FLOPs fwd AND
        # bwd (dw differentiates to a slice-sum, no scatter)
        wg = jnp.tile(w.astype(dtype), (1, 1, 1, 4))
        y = jax.lax.conv_general_dilated(
            x4, wg, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=_DN, feature_group_count=4)
    elif build is kron4_w and mode == "mm":
        Bb, h, ww, c4 = x4.shape
        ci = c4 // 4
        y = jnp.einsum("bhwpc,cd->bhwpd",
                       x4.reshape(Bb, h, ww, 4, ci),
                       w[0, 0].astype(dtype)).reshape(Bb, h, ww, -1)
    else:
        w4 = build(w).astype(dtype)
        y = jax.lax.conv_general_dilated(
            x4, w4, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=_DN)
    out, new = _bn_silu_blocked_train(y, params["bn"], stats["bn"], dtype)
    return out, {"bn": new}


def _c3k2_blocked_train(x4, params, stats, spec, dtype):
    m = spec.module
    c = int(m.c2 * m.e)
    ci = x4.shape[-1] // 4
    new = {}
    y, new["cv1"] = _conv_bn_silu_blocked_train(
        x4, params["cv1"], stats["cv1"], kron4_w, dtype, stride=1, pad=0)
    a, b = _phase_split(y, (c, c))
    ys = [a, b]
    for i in range(m.n):
        bp, bs = params[f"m{i}"], stats[f"m{i}"]
        h, s1 = _conv_bn_silu_blocked_train(ys[-1], bp["cv1"], bs["cv1"],
                                            k3s1_w, dtype)
        h, s2 = _conv_bn_silu_blocked_train(h, bp["cv2"], bs["cv2"],
                                            k3s1_w, dtype)
        new[f"m{i}"] = {"cv1": s1, "cv2": s2}
        ys.append(ys[-1] + h if m.shortcut else h)
    cat = _phase_concat(ys)
    out, ncv2 = _conv_bn_silu_blocked_train(
        cat, params["cv2"], stats["cv2"], kron4_w, dtype, stride=1, pad=0)
    new["cv2"] = ncv2
    return out, new


def prologue_train(variables, x, dtype, meta):
    """Fused TRAIN forward of yaml rows 0-4. Returns (row-4 output, stats)
    where stats = {modules_i: batch_stats subtree} carries the updated BN
    running stats for the train step to merge (train/step.py)."""
    from yolo_ad_refine_tpu.ops.s2d_stem import stem0_w, stem1_w

    p, s = variables["params"], variables["batch_stats"]
    new = {}

    # rows 0-1 (s2d(4) stem pair), raw weights + live BN
    from yolo_ad_refine_tpu.ops.s2d_stem import s2d4_restack

    xs = s2d4_restack(x.astype(dtype))
    w0p = stem0_w(p["modules_0"]["conv"]["kernel"]).astype(dtype)
    w1p = stem1_w(p["modules_1"]["conv"]["kernel"]).astype(dtype)
    y = jax.lax.conv_general_dilated(xs, w0p, (1, 1), [(1, 0), (1, 0)],
                                     dimension_numbers=_DN)
    y, st0 = _bn_silu_blocked_train(y, p["modules_0"]["bn"],
                                    s["modules_0"]["bn"], dtype)
    new["modules_0"] = {"bn": st0}
    y = jax.lax.conv_general_dilated(y, w1p, (1, 1), [(1, 0), (1, 0)],
                                     dimension_numbers=_DN)
    y, st1 = _bn_silu_blocked_train(y, p["modules_1"]["bn"],
                                    s["modules_1"]["bn"], dtype)
    new["modules_1"] = {"bn": st1}

    # rows 2-4 blocked
    y = b2d(y)
    y, new["modules_2"] = _c3k2_blocked_train(
        y, p["modules_2"], s["modules_2"], meta["s2"], dtype)
    y, new["modules_3"] = _conv_bn_silu_blocked_train(
        y, p["modules_3"], s["modules_3"], k3s2_w, dtype, stride=2, pad=1)
    y, new["modules_4"] = _c3k2_blocked_train(
        y, p["modules_4"], s["modules_4"], meta["s4"], dtype)
    return d2b(y, meta["s4"].module.c2), new
