"""Dynamic Snake Attention Network (DSAN) modules.

Parity surface: reference ultralytics/nn/modules/dsan.py (DSA:80, DSAN:98,
DSCNPair:48, Mlp:12, DWConv:139) and ops_dscn/modules/dscn.py (DSCNX:89,
DSCNY:194). The snake sampling op itself is ops/dscn.py (the TPU-native
replacement for the reference's CUDA extension). Dead in the reference's
active path (only tasks1.py routes to it) but part of its shipped surface;
registered here so yaml rows can use DSAN/DSA directly.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.nn.common import BatchNorm, conv2d
from yolo_ad_refine_tpu.nn.registry import register
from yolo_ad_refine_tpu.nn.tssa import gelu_exact
from yolo_ad_refine_tpu.ops.dscn import dscn_sample

Dtype = Any


def _conv1d_axis(x, c, k, axis, groups, dtype, name):
    """Depthwise (1,k) or (k,1) conv matching the reference dw_conv."""
    if axis == "x":
        kern, padding = (1, k), [(0, 0), ((k - 1) // 2, (k - 1) // 2)]
    else:
        kern, padding = (k, 1), [((k - 1) // 2, (k - 1) // 2), (0, 0)]
    return nn.Conv(c, kern, padding=padding, feature_group_count=groups,
                   dtype=dtype, name=name)(x)


class DSCN1D(nn.Module):
    """One snake-conv branch (reference dscn.py DSCNX:89 / DSCNY:194):
    offsets from dw_conv(off_x) -> LN -> GELU -> Linear; sampling by
    ops/dscn.py. DSCNX projects the input first; DSCNY does not."""

    channels: int
    kernel_size: int = 3
    dw_kernel_size: int | None = None
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 4
    offset_scale: float = 1.0
    axis: str = "x"
    with_proj: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, off_x, train: bool = False):
        c = self.channels
        dwk = self.dw_kernel_size or self.kernel_size
        y = nn.Dense(c, dtype=self.dtype, name="input_proj")(x) if self.with_proj else x

        o = _conv1d_axis(off_x, c, dwk, self.axis, c, self.dtype, "dw_conv_0")
        o = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="dw_conv_1")(o)
        o = gelu_exact(o)
        # reference zero-inits the offset head so the snake starts straight
        offset = nn.Dense(self.group * self.kernel_size,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          dtype=self.dtype, name="offset")(o)
        return dscn_sample(y, offset, self.kernel_size, self.axis,
                           self.stride, self.pad, self.dilation, self.group,
                           self.offset_scale)


class DSCNPair(nn.Module):
    """conv0 5x5 dw -> snake-x -> snake-y -> 1x1, gating the input
    (reference dsan.py:48-71)."""

    kernel_size: int = 7
    dw_kernel_size: int = 5
    pad: int = 3
    stride: int = 1
    dilation: int = 1
    group: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        u = x
        x = conv2d(x, c, 5, p=2, g=c, dtype=self.dtype, name="conv0")
        attn = DSCN1D(c, self.kernel_size, self.dw_kernel_size, self.stride,
                      self.pad, self.dilation, self.group, axis="x",
                      with_proj=True, dtype=self.dtype, name="dscn_x")(x, x, train)
        attn = DSCN1D(c, self.kernel_size, self.dw_kernel_size, self.stride,
                      self.pad, self.dilation, self.group, axis="y",
                      with_proj=False, dtype=self.dtype, name="dscn_y")(attn, x, train)
        attn = conv2d(attn, c, 1, dtype=self.dtype, name="conv")
        return u * attn


@register
class DSA(nn.Module):
    """1x1 -> GELU -> DSCNPair spatial gate -> 1x1 + residual
    (reference dsan.py:80-96)."""

    kernel_size: int = 7
    dw_kernel_size: int = 5
    stride: int = 1
    dilation: int = 1
    group: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        pad = (self.dilation * (self.kernel_size - 1)) // 2
        shortcut = x
        x = conv2d(x, c, 1, dtype=self.dtype, name="proj_1")
        x = gelu_exact(x)
        x = DSCNPair(self.kernel_size, self.dw_kernel_size, pad, self.stride,
                     self.dilation, self.group, dtype=self.dtype,
                     name="spatial_gating_unit")(x, train)
        x = conv2d(x, c, 1, dtype=self.dtype, name="proj_2")
        return x + shortcut


class Mlp(nn.Module):
    """1x1 -> DW3x3 -> GELU -> 1x1 (reference dsan.py:12-46)."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = conv2d(x, self.hidden, 1, dtype=self.dtype, name="fc1")
        y = conv2d(y, self.hidden, 3, p=1, g=self.hidden, dtype=self.dtype,
                   name="dwconv")
        y = gelu_exact(y)
        return conv2d(y, c, 1, dtype=self.dtype, name="fc2")


@register
class DSAN(nn.Module):
    """BN -> DSA (x layer_scale) + x; BN -> Mlp (x layer_scale) + x
    (reference dsan.py:98-137)."""

    kernel_size: int = 7
    dw_kernel_size: int = 5
    stride: int = 1
    dilation: int = 1
    group: int = 1
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-2), (c,), jnp.float32)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-2), (c,), jnp.float32)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype, name="norm1")(x)
        y = DSA(self.kernel_size, self.dw_kernel_size, self.stride,
                self.dilation, self.group, dtype=self.dtype, name="attn")(y, train)
        x = x + y * ls1.astype(x.dtype)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, train)
        return x + y * ls2.astype(x.dtype)
