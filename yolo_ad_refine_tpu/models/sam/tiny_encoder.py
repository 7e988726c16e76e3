"""TinyViT image encoder (Mobile-SAM), TPU-native flax.

Parity surface: reference models/sam/modules/tiny_encoder.py — PatchEmbed
(:62, two stride-2 Conv+BN), MBConv (:104, expand-dw-project with GELU and
residual), PatchMerging (:165, 1x1 -> dw 3x3 (stride 1 when out_dim in
{320,448,576}) -> 1x1), ConvLayer (:222), spatially-biased Attention (:363,
trainable per-head biases over unique |offset| classes), TinyViTBlock
(:492, windowed attention + 3x3 local depthwise conv + MLP), BasicLayer
(:650), TinyViT (:765) with the SAM 256-channel neck.

NHWC throughout; tokens are (B, N, C) as in the reference.
"""

from __future__ import annotations

import itertools
from typing import Any, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.nn.common import BatchNorm

from yolo_ad_refine_tpu.models.sam.modules import LayerNorm2d

Dtype = Any


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm (reference Conv2d_BN :24)."""

    out: int
    k: int = 1
    s: int = 1
    p: int = 0
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=self.p, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="c")(x)
        return BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class MBConv(nn.Module):
    """Reference :104 — 1x1 expand, 3x3 depthwise, 1x1 project, residual."""

    out: int
    expand_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(x.shape[-1] * self.expand_ratio)
        y = nn.gelu(ConvBN(hidden, 1, dtype=self.dtype, name="conv1")(x, train),
                    approximate=False)
        y = nn.gelu(ConvBN(hidden, 3, 1, 1, groups=hidden, dtype=self.dtype,
                           name="conv2")(y, train), approximate=False)
        y = ConvBN(self.out, 1, dtype=self.dtype, name="conv3")(y, train)
        return nn.gelu(x + y, approximate=False)


class PatchMerging(nn.Module):
    """Reference :165 — stride-1 dw when out_dim in {320, 448, 576}."""

    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = 1 if self.out in (320, 448, 576) else 2
        y = nn.gelu(ConvBN(self.out, 1, dtype=self.dtype, name="conv1")(x, train),
                    approximate=False)
        y = nn.gelu(ConvBN(self.out, 3, stride, 1, groups=self.out,
                           dtype=self.dtype, name="conv2")(y, train),
                    approximate=False)
        return ConvBN(self.out, 1, dtype=self.dtype, name="conv3")(y, train)


def _bias_idxs(resolution: Tuple[int, int]):
    points = list(itertools.product(range(resolution[0]), range(resolution[1])))
    offsets: dict = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


class BiasedAttention(nn.Module):
    """Reference :363 — LN, fused qkv, per-head trainable spatial biases."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        d = int(self.attn_ratio * self.key_dim)
        dh = d * self.num_heads
        nh_kd = self.key_dim * self.num_heads
        idxs, n_off = _bias_idxs(self.resolution)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_off), jnp.float32)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(dh + 2 * nh_kd, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, self.num_heads, -1)
        q = qkv[..., : self.key_dim].transpose(0, 2, 1, 3)
        k = qkv[..., self.key_dim : 2 * self.key_dim].transpose(0, 2, 1, 3)
        v = qkv[..., 2 * self.key_dim :].transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (self.key_dim**-0.5)
        attn = attn + biases[:, idxs].astype(attn.dtype)[None]
        attn = nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, dh)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)


class TinyViTBlock(nn.Module):
    """Reference :492 — windowed biased attention + local dw conv + MLP."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    local_conv_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = self.input_resolution
        b, hw, c = x.shape
        ws = self.window_size
        # reference TinyViTBlock :560: attn_ratio=1 (NOT Attention's default 4)
        attn = BiasedAttention(self.dim, self.dim // self.num_heads,
                               self.num_heads, 1.0, (ws, ws),
                               dtype=self.dtype, name="attn")
        res = x
        if h == ws and w == ws:
            x = attn(x)
        else:
            xi = x.reshape(b, h, w, c)
            pb, pr = (ws - h % ws) % ws, (ws - w % ws) % ws
            if pb or pr:
                xi = jnp.pad(xi, ((0, 0), (0, pb), (0, pr), (0, 0)))
            ph, pw = h + pb, w + pr
            nh, nw = ph // ws, pw // ws
            xi = xi.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            xi = xi.reshape(b * nh * nw, ws * ws, c)
            xi = attn(xi)
            xi = xi.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            xi = xi.reshape(b, ph, pw, c)[:, :h, :w]
            x = xi.reshape(b, hw, c)
        x = res + x
        # local conv on the spatial layout
        xs = x.reshape(b, h, w, c)
        xs = ConvBN(c, self.local_conv_size, 1, self.local_conv_size // 2,
                    groups=c, dtype=self.dtype, name="local_conv")(xs, train)
        x = xs.reshape(b, hw, c)
        # MLP (LN -> fc1 -> GELU -> fc2)
        y = nn.LayerNorm(dtype=self.dtype, name="mlp_norm")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class TinyViT(nn.Module):
    """Reference :765 with the SAM neck. __call__(img NHWC) -> (B, 64, 64, 256)."""

    img_size: int = 1024
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n0 = self.embed_dims[0]
        x = nn.gelu(ConvBN(n0 // 2, 3, 2, 1, dtype=self.dtype,
                           name="patch_embed_0")(x, train), approximate=False)
        x = ConvBN(n0, 3, 2, 1, dtype=self.dtype, name="patch_embed_1")(x, train)
        pr = self.img_size // 4

        # stage 0: MBConv layer + merge
        for j in range(self.depths[0]):
            x = MBConv(n0, dtype=self.dtype, name=f"layer0_block{j}")(x, train)
        x = PatchMerging(self.embed_dims[1], dtype=self.dtype,
                         name="layer0_downsample")(x, train)

        # stages 1..3: token blocks (+ merge except last)
        for i in range(1, len(self.depths)):
            r = pr // (2 ** (i - 1 if i == 3 else i))
            b = x.shape[0]
            x = x.reshape(b, r * r, x.shape[-1])
            for j in range(self.depths[i]):
                x = TinyViTBlock(self.embed_dims[i], (r, r),
                                 self.num_heads[i], self.window_sizes[i],
                                 self.mlp_ratio, dtype=self.dtype,
                                 name=f"layer{i}_block{j}")(x, train)
            x = x.reshape(b, r, r, self.embed_dims[i])
            if i < len(self.depths) - 1:
                x = PatchMerging(self.embed_dims[i + 1], dtype=self.dtype,
                                 name=f"layer{i}_downsample")(x, train)

        # classifier-head parameters (reference :829-831 norm_head + head,
        # num_classes=1000 in build_mobile_sam) — unused by SAM but present
        # in every torch checkpoint; declared for import/param parity
        c_last = self.embed_dims[-1]
        self.param("norm_head_scale", nn.initializers.ones, (c_last,), jnp.float32)
        self.param("norm_head_bias", nn.initializers.zeros, (c_last,), jnp.float32)
        self.param("head_kernel", nn.initializers.zeros, (c_last, 1000), jnp.float32)
        self.param("head_bias", nn.initializers.zeros, (1000,), jnp.float32)

        # SAM neck to 256ch (reference :834-852)
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="neck_2")(x)
        return LayerNorm2d(name="neck_3")(x)
