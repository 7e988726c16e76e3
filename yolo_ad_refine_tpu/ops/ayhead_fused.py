"""Lane-filling fused rewrite of the AYHead forward (train AND eval).

Motivation (round-4 attribution, benchmarks/bench_head.py): the AYHead is
~11.4 of the 26 ms bs32/640 flagship eval forward, of which only ~7.2 ms
is the DCN. The rest is ~14 small convs per level at C=64 — half the TPU's
128-lane boundary — plus the TaskDecomposition/CrossTaskInteraction
plumbing, so the MXU tiles run half-empty and every op pays full HBM
latency on an under-filled layout. In-session TPU A/B (bench_prologue
modes full vs fullhead): 26.2 -> 22.7 ms/batch.

This module computes the EXACT same function (reference head.py:1049-1252
forward semantics, same params, same float order up to zero-block matmul
terms) with the cls/reg twin branches packed into single 128-wide ops:

- cls_decomp + reg_decomp share their input ``feat``; with stacked_convs=1
  the layer-attention gate is a per-image positive SCALAR, so the pair is
  one 64->128 conv, two scalar gates, and ONE GroupNorm(32) over 128ch
  (group size 4 matches the module's GN(16) over each 64ch half exactly).
- CrossTaskInteraction's four 1x1 convs become one block-diagonal
  128->128 conv (c2r | r2c) + one scattered 256->128 conv (both gates).
  The zero off-blocks add exact zeros inside the MXU's f32 accumulator.
- rep_block_cls conv1 (on cls'), spatial offset conv (on feat) and the
  cls_prob 1x1 (on feat, embedded as a center-tap 3x3) fuse into one
  3x3 128->123 conv; rep conv2 + cls_prob 3x3 fuse into one 96->65.
- cv2 (reg) + cv3 (cls) become one block-diagonal 1x1 128->(64+nc).

Every op here is differentiable jnp (the VJPs are the same fused matmuls
run in reverse), so AYHead uses this path for training too; the
DCN (own custom-VJP kernel + GN) and CoordAtt (BatchNorm running stats)
stay as module calls so flax state collections keep working. GroupNorm
runs through the same flax layer as the module path, so normalization
numerics are identical. Enabled via YAT_HEAD_FUSED=auto (default: on for
TPU) | 1 | 0; parity: tests/test_head_fused.py (fwd fp32/bf16 + facade +
gradients).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.nn.common import silu

__all__ = ["ayhead_fused_enabled", "ayhead_fused_levels"]


def ayhead_fused_enabled() -> bool:
    v = os.environ.get("YAT_HEAD_FUSED", "auto").lower()
    if v in ("1", "true", "on"):
        return True
    if v in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"


def _conv(x, w, b=None, pad=0):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _gn(x, gp, groups, dtype):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype).apply(
        {"params": gp}, x)


def _gn_cat(x, gp_a, gp_b, dtype):
    """GN over a 128ch concat == per-half GN(16): group size stays 4."""
    gp = {"scale": jnp.concatenate([gp_a["scale"], gp_b["scale"]]),
          "bias": jnp.concatenate([gp_a["bias"], gp_b["bias"]])}
    return _gn(x, gp, 32, dtype)


def _la_gate(avg, lp, dtype):
    """TaskDecomposition layer-attention scalar (B,1,1,1); stacked_convs=1."""
    w = _conv(avg.astype(dtype), lp["la_conv1"]["kernel"], lp["la_conv1"]["bias"])
    w = _conv(nn.relu(w), lp["la_conv2"]["kernel"], lp["la_conv2"]["bias"])
    return nn.sigmoid(w)


def _pad_out(w, before, after):
    return jnp.pad(w, ((0, 0), (0, 0), (0, 0), (before, after)))


def ayhead_fused_levels(p, xs, train, dtype, dcn_fn, coord_fn, scales,
                        nc: int, reg_max: int, diag_fn=None):
    """Fused AYHead per-level forward. ``p`` is AYHead's param subtree;
    ``dcn_fn(x, offset, mask)`` and ``coord_fn(x)`` are the bound DyDCNv2 /
    CoordAtt module closures (train mode already folded in); ``scales`` are
    the per-level Scale params. Returns the per-level (B,H,W,4*reg_max+nc)
    output list (pre-decode)."""
    tc = p["share_conv_0"]["conv"]["kernel"].shape[-1]  # task_ch (64)

    # ---- fused weights (trace-time concats of small tensors) ----
    cp, rp = p["cls_decomp"], p["reg_decomp"]
    W_red = jnp.concatenate([cp["reduction_conv"]["kernel"],
                             rp["reduction_conv"]["kernel"]], axis=-1)

    ct = p["cross_task"]
    W_t = jnp.concatenate([_pad_out(ct["cls_to_reg"]["kernel"], 0, tc),
                           _pad_out(ct["reg_to_cls"]["kernel"], tc, 0)], axis=2)
    b_t = jnp.concatenate([ct["cls_to_reg"]["bias"], ct["reg_to_cls"]["bias"]])
    # gate conv over [cls, reg, c2r, r2c] (4*tc in) -> [cls_gate, reg_gate]
    cg, rg = ct["cls_gate"]["kernel"], ct["reg_gate"]["kernel"]  # (1,1,2tc,tc)
    W_g = jnp.concatenate([
        _pad_out(cg[:, :, :tc], 0, tc),    # cls_feat -> cls_gate
        _pad_out(rg[:, :, :tc], tc, 0),    # reg_feat -> reg_gate
        _pad_out(rg[:, :, tc:], tc, 0),    # c2r      -> reg_gate
        _pad_out(cg[:, :, tc:], 0, tc),    # r2c      -> cls_gate
    ], axis=2)
    b_g = jnp.concatenate([ct["cls_gate"]["bias"], ct["reg_gate"]["bias"]])

    rb = p["rep_block_cls"]
    off_w = p["spatial_conv_offset"]["kernel"]          # (3,3,tc,27)
    pr0_w = p["cls_prob_conv_0"]["kernel"]              # (1,1,tc,tc//2)
    pr0_3x3 = jnp.zeros((3, 3) + pr0_w.shape[2:], pr0_w.dtype).at[1, 1].set(pr0_w[0, 0])
    # X1 = [cls', feat] (2tc) -> [rep1 (tc) | offset (27) | prob0 (tc//2)]
    W_1 = jnp.concatenate([
        jnp.concatenate([rb["conv1"]["conv"]["kernel"],
                         jnp.zeros((3, 3, tc, 27 + tc // 2), jnp.float32)], axis=-1),
        jnp.concatenate([jnp.zeros((3, 3, tc, tc), jnp.float32), off_w, pr0_3x3],
                        axis=-1),
    ], axis=2)
    b_1 = jnp.concatenate([jnp.zeros((tc,), jnp.float32),
                           p["spatial_conv_offset"]["bias"],
                           p["cls_prob_conv_0"]["bias"]])
    # X2 = [rep1 (tc), prob_mid (tc//2)] -> [rep2 (tc) | prob (1)]
    pr1_w = p["cls_prob_conv_2"]["kernel"]              # (3,3,tc//2,1)
    W_2 = jnp.concatenate([
        jnp.concatenate([rb["conv2"]["conv"]["kernel"],
                         jnp.zeros((3, 3, tc, 1), jnp.float32)], axis=-1),
        jnp.concatenate([jnp.zeros((3, 3, tc // 2, tc), jnp.float32), pr1_w],
                        axis=-1),
    ], axis=2)
    b_2 = jnp.concatenate([jnp.zeros((tc,), jnp.float32),
                           p["cls_prob_conv_2"]["bias"]])
    # out: [reg_enh, cls_gated] -> [cv2 (4*reg_max) | cv3 (nc)]
    W_o = jnp.concatenate([_pad_out(p["cv2"]["kernel"], 0, nc),
                           _pad_out(p["cv3"]["kernel"], 4 * reg_max, 0)], axis=2)
    b_o = jnp.concatenate([p["cv2"]["bias"], p["cv3"]["bias"]])

    outputs = []
    for i, x in enumerate(xs):
        st = p[f"stems_{i}"]
        adapted = silu(_gn(_conv(x, st["conv"]["kernel"]), st["gn"], 16, dtype))
        s1 = p["share_conv_0"]
        feat = silu(_gn(_conv(adapted, s1["conv"]["kernel"], pad=1), s1["gn"], 16, dtype))
        s2 = p["share_conv_1"]
        feat = silu(_gn(_conv(feat, s2["conv"]["kernel"], pad=1), s2["gn"], 16, dtype))

        # fused TaskDecomposition pair
        avg = jnp.mean(feat, axis=(1, 2), keepdims=True)
        z = _conv(feat, W_red)
        gate = jnp.concatenate(
            [jnp.broadcast_to(_la_gate(avg, cp, dtype), avg.shape[:3] + (tc,)),
             jnp.broadcast_to(_la_gate(avg, rp, dtype), avg.shape[:3] + (tc,))],
            axis=-1)  # (B,1,1,2tc)
        cr = silu(_gn_cat(z * gate, cp["gn"], rp["gn"], dtype))

        # fused CrossTaskInteraction
        t = _conv(cr, W_t, b_t)
        g = nn.sigmoid(_conv(jnp.concatenate([cr, t], axis=-1), W_g, b_g))
        swap = jnp.concatenate([t[..., tc:], t[..., :tc]], axis=-1)
        cr = cr + swap * g
        cls_f = cr[..., :tc]

        # fused 3x3 #1: rep1 + offset/mask + cls_prob mid
        x1 = jnp.concatenate([cls_f, feat], axis=-1)
        y1 = _conv(x1, W_1, b_1, pad=1)
        rep1 = silu(_gn(y1[..., :tc], rb["conv1"]["gn"], 16, dtype))
        om = y1[..., tc:tc + 27]
        prob_mid = nn.relu(y1[..., tc + 27:])

        # fused 3x3 #2: rep2 + cls_prob out
        y2 = _conv(jnp.concatenate([rep1, prob_mid], axis=-1), W_2, b_2, pad=1)
        cls_enh = silu(_gn(y2[..., :tc], rb["conv2"]["gn"], 16, dtype)) + cls_f
        prob = nn.sigmoid(y2[..., tc:])

        # DCN + CoordAtt branch (module closures: custom-VJP kernel, GN,
        # BatchNorm state, offset diagnostic all live in the modules)
        offset, mask = om[..., :18], nn.sigmoid(om[..., 18:])
        if diag_fn is not None:
            diag_fn(offset)
        reg_enh = coord_fn(dcn_fn(cr[..., tc:], offset, mask))

        # fused outputs
        yo = _conv(jnp.concatenate([reg_enh, cls_enh * prob], axis=-1), W_o, b_o)
        reg_out = yo[..., :4 * reg_max] * scales[i].astype(yo.dtype)
        cls_out = yo[..., 4 * reg_max:]
        outputs.append(jnp.concatenate([reg_out, cls_out], axis=-1))
    return outputs
