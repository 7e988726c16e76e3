"""Attention module zoo, NHWC flax.

Parity surface: reference nn/modules/attention.py (1932 LoC) — the
"magic-modification" attention library the fork carries. In the reference it
is live only through the dead AYHead_Attention_Optimized variant; here the
most notable members are implemented so yaml experiments can use them as
channel-preserving attention rows (registered in models/parser.py alongside
CBAM): EMA (attention.py:24), SimAM (:53), TripletAttention (:661),
LSKBlock (:878), SEAttention (:896), ELA (:1747),
EfficientChannelAttention (:1880).

All are gates: __call__(x) -> x * attention, shapes preserved, NHWC.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.nn.common import BatchNorm

from yolo_ad_refine_tpu.nn.registry import register

Dtype = Any


@register
class EMA(nn.Module):
    """Efficient Multi-scale Attention (reference attention.py:24):
    grouped channel split, H/W strip pooling + 1x1, GroupNorm cross path,
    3x3 path, cross-covariance softmax weighting."""

    factor: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.factor
        cg = c // g
        assert cg > 0, (c, g)
        gx = x.reshape(b, h, w, g, cg).transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, cg)
        x_h = gx.mean(axis=2, keepdims=True)          # (bg, h, 1, cg)
        x_w = gx.mean(axis=1, keepdims=True)          # (bg, 1, w, cg)
        hw = jnp.concatenate([x_h[:, :, 0], x_w[:, 0]], axis=1)  # (bg, h+w, cg)
        hw = nn.Conv(cg, (1,), dtype=self.dtype, name="conv1x1")(hw)
        a_h = nn.sigmoid(hw[:, :h])[:, :, None, :]
        a_w = nn.sigmoid(hw[:, h:])[:, None, :, :]
        x1 = nn.GroupNorm(num_groups=cg, dtype=self.dtype, name="gn")(gx * a_h * a_w)
        x2 = nn.Conv(cg, (3, 3), padding=1, dtype=self.dtype, name="conv3x3")(gx)
        x11 = nn.softmax(x1.mean(axis=(1, 2)), axis=-1)[:, None, :]   # (bg, 1, cg)
        x12 = x2.reshape(b * g, h * w, cg)
        x21 = nn.softmax(x2.mean(axis=(1, 2)), axis=-1)[:, None, :]
        x22 = x1.reshape(b * g, h * w, cg)
        weights = (
            jnp.einsum("bic,bnc->bn", x11, x12) + jnp.einsum("bic,bnc->bn", x21, x22)
        ).reshape(b * g, h, w, 1)
        out = gx * nn.sigmoid(weights)
        return out.reshape(b, g, h, w, cg).transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)


@register
class SimAM(nn.Module):
    """Parameter-free energy attention (reference attention.py:53)."""

    e_lambda: float = 1e-4

    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        n = h * w - 1
        d = (x - x.mean(axis=(1, 2), keepdims=True)) ** 2
        y = d / (4 * (d.sum(axis=(1, 2), keepdims=True) / n + self.e_lambda)) + 0.5
        return x * nn.sigmoid(y)


class _AttentionGate(nn.Module):
    """ZPool (max+mean over 'channel') -> 7x7 conv+BN -> sigmoid gate."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        z = jnp.concatenate(
            [x.max(axis=-1, keepdims=True), x.mean(axis=-1, keepdims=True)], -1)
        z = nn.Conv(1, (7, 7), padding=3, use_bias=False, dtype=self.dtype,
                    name="conv")(z)
        z = BatchNorm(use_running_average=not train,
                         dtype=self.dtype, name="bn")(z)
        return x * nn.sigmoid(z)


@register
class TripletAttention(nn.Module):
    """Rotate-and-gate over the three axis pairings (reference :661)."""

    no_spatial: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NHWC: gate over C after rotating each axis into the gate position
        xp1 = x.transpose(0, 3, 2, 1)   # gate along H
        o1 = _AttentionGate(dtype=self.dtype, name="cw")(xp1, train).transpose(0, 3, 2, 1)
        xp2 = x.transpose(0, 1, 3, 2)   # gate along W
        o2 = _AttentionGate(dtype=self.dtype, name="hc")(xp2, train).transpose(0, 1, 3, 2)
        if self.no_spatial:
            return 0.5 * (o1 + o2)
        o3 = _AttentionGate(dtype=self.dtype, name="hw")(x, train)
        return (o1 + o2 + o3) / 3.0


@register
class LSKBlock(nn.Module):
    """Large-selective-kernel block (reference :852-894): dual depthwise
    receptive fields, avg/max squeeze selection, residual."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_1")(x)
        y = nn.gelu(y, approximate=False)
        a1 = nn.Conv(c, (5, 5), padding=2, feature_group_count=c,
                     dtype=self.dtype, name="conv0")(y)
        a2 = nn.Conv(c, (7, 7), padding=9, kernel_dilation=(3, 3),
                     feature_group_count=c, dtype=self.dtype,
                     name="conv_spatial")(a1)
        a1 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="conv1")(a1)
        a2 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="conv2")(a2)
        attn = jnp.concatenate([a1, a2], -1)
        agg = jnp.concatenate([attn.mean(-1, keepdims=True),
                               attn.max(-1, keepdims=True)], -1)
        sig = nn.sigmoid(nn.Conv(2, (7, 7), padding=3, dtype=self.dtype,
                                 name="conv_squeeze")(agg))
        sel = a1 * sig[..., :1] + a2 * sig[..., 1:]
        attn = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv")(sel)
        y = y * attn  # spatial gating of the projected features
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_2")(y) + x


@register
class SEAttention(nn.Module):
    """Squeeze-and-excitation (reference :896)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))
        y = nn.Dense(max(1, c // self.reduction), use_bias=False,
                     dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return x * nn.sigmoid(y)[:, None, None, :]


@register
class EfficientChannelAttention(nn.Module):
    """ECA: GAP -> adaptive-k Conv1d over channels -> sigmoid (reference
    :1880)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        t = int(abs((math.log2(c) + 1) / 2))
        k = t if t % 2 else t + 1
        y = x.mean(axis=(1, 2))[..., None]            # (B, C, 1)
        y = nn.Conv(1, (k,), padding=k // 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(y)  # conv over C axis
        return x * nn.sigmoid(y[..., 0])[:, None, None, :]
