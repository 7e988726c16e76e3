"""Core convolution/normalization primitives (NHWC, flax.linen).

Parity surface: reference ultralytics/nn/modules/conv.py (Conv, DWConv,
Concat), head.py:607 (Conv_GN), block.py:63 (DFL) — rebuilt TPU-first:

- NHWC layout so convs lower to MXU-friendly XLA convolutions.
- Explicit symmetric padding replicating torch's ``autopad`` so spatial
  semantics match the reference exactly (flax 'SAME' differs at stride 2).
- BatchNorm uses the reference's eps=1e-3 / torch-momentum=0.03
  (flax momentum = 0.97).
- ``dtype`` is the compute dtype (bf16 on TPU); params stay float32.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.nn.registry import register

Dtype = Any


class BatchNorm(nn.BatchNorm):
    """flax BatchNorm with the reference's in-model semantics.

    Two departures from flax defaults, both required for cross-stack parity:

    - ``use_fast_variance=False``: flax's default computes E[x^2]-E[x]^2,
      which catastrophically cancels in f32 whenever the activation mean
      rivals its std — measured 6.6e-6 relative error vs torch per layer in
      train mode, compounding to ~5e-4 ten blocks deep. torch normalizes
      with the two-pass variance.
    - ``epsilon=1e-3`` / ``momentum=0.97``: the reference's
      ``initialize_weights`` (torch_utils.py:426-436) overrides EVERY
      ``nn.BatchNorm2d`` in a built model to eps=1e-3 / torch-momentum=0.03,
      regardless of what the module constructor asked for. Matching the
      constructor defaults instead produces a ~5e-4 eval-forward divergence
      per BN (Δeps/(2·var)). Modules that do NOT pass through
      initialize_weights (SAM family, BatchNorm1d equivalents) must pass
      explicit epsilon/momentum.
    """

    use_fast_variance: bool = False
    momentum: float = 0.97
    epsilon: float = 1e-3


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same'-shape padding for odd kernels, matching reference conv.py:20."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channels up to the nearest multiple (reference utils/ops.py make_divisible)."""
    return math.ceil(x / divisor) * divisor


def silu(x):
    return x * nn.sigmoid(x)


def hardswish(x):
    """x * relu6(x+3)/6 (torch nn.Hardswish)."""
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _resolve_act(act) -> Callable | None:
    if act is True:
        return silu
    if act in (False, None):
        return None
    return act


def conv2d(x, features, k, s=1, p=0, g=1, d=1, use_bias=True, dtype=jnp.float32, name=None):
    """Plain 2D conv with torch-style symmetric int padding."""
    return nn.Conv(
        features,
        (k, k),
        strides=(s, s),
        padding=[(p, p), (p, p)],
        feature_group_count=g,
        kernel_dilation=(d, d),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )(x)


@register
class Conv(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU (reference conv.py:27-56)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype, name="bn"
        )(x)
        fn = _resolve_act(self.act)
        return fn(x) if fn else x


@register
class DWConv(nn.Module):
    """Depth-wise Conv + BN + SiLU (reference conv.py:57)."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, g=g, d=self.d, act=self.act, dtype=self.dtype, name="dw")(
            x, train
        )


class ConvGN(nn.Module):
    """Conv2d(bias=False) + GroupNorm(16) + SiLU (reference head.py:607-624)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype, name="gn")(x)
        fn = _resolve_act(self.act)
        return fn(x) if fn else x


@register(name="nn.Conv2d")
class PlainConv2d(nn.Module):
    """Bare torch-style nn.Conv2d usable directly from yaml rows (bias=True, p=0)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv2d(x, self.c2, self.k, self.s, self.p, dtype=self.dtype, name="conv")


@register(name="nn.ConvTranspose2d")
class PlainConvTranspose2d(nn.Module):
    """torch nn.ConvTranspose2d(c2, k, s, p, output_padding) equivalent.

    Used by the flagship neck as an exact x2 learned upsample
    (z-yaml row: nn.ConvTranspose2d [head_channel, 3, 2, 1, 1]).
    Output size = (H-1)*s - 2p + k + op, realised via lax.conv_transpose
    padding (k-1-p, k-1-p+op) on the dilated input.
    """

    c2: int
    k: int = 3
    s: int = 2
    p: int = 1
    op: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        lo = self.k - 1 - self.p
        hi = self.k - 1 - self.p + self.op
        return nn.ConvTranspose(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(lo, hi), (lo, hi)],
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)


@register(name="nn.Upsample")
class Upsample(nn.Module):
    """Nearest/bilinear upsample (torch nn.Upsample [None, scale, mode])."""

    size: Any = None
    scale_factor: float = 2.0
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        if self.size is not None:
            nh, nw = self.size
        else:
            nh, nw = int(h * self.scale_factor), int(w * self.scale_factor)
        if self.mode == "nearest":
            f_h, f_w = nh // h, nw // w
            x = jnp.repeat(jnp.repeat(x, f_h, axis=1), f_w, axis=2)
            return x
        import jax

        return jax.image.resize(x, (b, nh, nw, c), method=self.mode)


@register
class Concat(nn.Module):
    """Concatenate a list of NHWC tensors along channels (reference conv.py Concat)."""

    dim: int = 1  # torch dim=1 (channels) == NHWC axis -1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return jnp.concatenate(xs, axis=-1)


def max_pool_same(x, k: int, s: int = 1):
    """MaxPool2d(k, stride, padding=k//2) torch-equivalent.

    Stride-1 pools run SEPARABLY ((k,1) then (1,k)) — exact for max, and
    2k taps instead of k^2: profile-guided (SPPF's three k=5 pools showed
    0.29 ms each at bs32 as monolithic 25-tap reduce-windows)."""
    p = k // 2
    if s == 1 and k > 2:
        y = nn.max_pool(x, (k, 1), strides=(1, 1), padding=[(p, p), (0, 0)])
        return nn.max_pool(y, (1, k), strides=(1, 1), padding=[(0, 0), (p, p)])
    return nn.max_pool(x, (k, k), strides=(s, s), padding=[(p, p), (p, p)])


def dfl_decode(x, reg_max: int = 16):
    """Distribution Focal Loss decode (reference block.py:63-83 DFL module).

    x: (..., 4*reg_max) logits -> (..., 4) expected distances via softmax
    expectation over the reg_max bins. The reference implements this as a
    frozen 1x1 conv; on TPU it is a fused softmax+dot.
    """
    shape = x.shape[:-1]
    x = x.reshape(*shape, 4, reg_max)
    x = nn.softmax(x.astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("...r,r->...", x, proj)
