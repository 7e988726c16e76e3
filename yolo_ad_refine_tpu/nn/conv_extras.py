"""Stock conv-family extras + YOLOv10 backbone blocks.

Parity surface: reference nn/modules/conv.py — Conv2:57, LightConv:83,
Focus:200, GhostConv:224, RepConv:244 (3x3 + 1x1 + optional identity-BN
branches; deploy-time structural fusion), ChannelAttention:280,
SpatialAttention:293, CBAM:309 — and nn/modules/block.py — SCDown:1084,
RepVGGDW:753, CIB:815, C2fCIB:854, PSA:967.

TPU-first notes: NHWC throughout; RepConv/Conv2/RepVGGDW keep their
multi-branch form in BOTH modes — the branches are mathematically equal to
the fused form and XLA's fuser handles the adds, so the torch deploy-time
re-parameterization (conv.py:173 fuse_convs) is a no-op here and exists only
as the weight-import transformation.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.nn.block import Attention, C2f
from yolo_ad_refine_tpu.nn.common import BatchNorm, Conv, DWConv, autopad, silu
from yolo_ad_refine_tpu.nn.registry import register

Dtype = Any


@register
class Conv2(nn.Module):
    """RepConv-lite: k x k conv + parallel 1x1, shared BN (reference conv.py:57)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, None, self.d)
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=[(pad, pad), (pad, pad)], feature_group_count=self.g,
                    kernel_dilation=(self.d, self.d), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        y = y + nn.Conv(self.c2, (1, 1), strides=(self.s, self.s), padding="VALID",
                        feature_group_count=self.g, use_bias=False,
                        dtype=self.dtype, name="cv2")(x)
        y = BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(y)
        return silu(y) if self.act is True else y


@register
class LightConv(nn.Module):
    """1x1 Conv (no act) + DWConv(ReLU) (reference conv.py:83)."""

    c2: int
    k: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return DWConv(self.c2, self.k, act=nn.relu, dtype=self.dtype, name="conv2")(x, train)


@register
class Focus(nn.Module):
    """Space-to-depth 2x2 + Conv (reference conv.py:200). Channel order of the
    four phases matches the torch cat: (h even w even, h odd w even,
    h even w odd, h odd w odd)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        return Conv(self.c2, self.k, self.s, p=self.p, g=self.g, act=self.act,
                    dtype=self.dtype, name="conv")(x, train)


@register
class GhostConv(nn.Module):
    """Primary conv + cheap 5x5 depthwise expansion (reference conv.py:224)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, g=self.g, act=self.act, dtype=self.dtype,
                 name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, g=c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


@register
class RepConv(nn.Module):
    """RepVGG block: 3x3 + 1x1 (+ identity BN) branches (reference conv.py:244).
    The torch deploy fusion (get_equivalent_kernel_bias) collapses the branches
    into one 3x3 conv; value-identical, so both modes run the branch form here."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True
    use_bn_identity: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.k == 3
        y = Conv(self.c2, 3, self.s, g=self.g, act=False, dtype=self.dtype,
                 name="conv1")(x, train)
        y = y + Conv(self.c2, 1, self.s, p=0, g=self.g, act=False, dtype=self.dtype,
                     name="conv2")(x, train)
        if self.use_bn_identity and x.shape[-1] == self.c2 and self.s == 1:
            y = y + BatchNorm(use_running_average=not train, momentum=0.97,
                                 epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return silu(y) if self.act is True else y


@register
class ChannelAttention(nn.Module):
    """GAP -> 1x1 conv -> sigmoid gate (reference conv.py:280)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = x.mean(axis=(1, 2), keepdims=True)
        a = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, name="fc")(a)
        return x * nn.sigmoid(a)


@register
class SpatialAttention(nn.Module):
    """[mean_c, max_c] -> 7x7 conv -> sigmoid gate (reference conv.py:293)."""

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.kernel_size in (3, 7)
        pad = 3 if self.kernel_size == 7 else 1
        s = jnp.concatenate(
            [x.mean(axis=-1, keepdims=True), x.max(axis=-1, keepdims=True)], axis=-1
        )
        a = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="cv1")(s)
        return x * nn.sigmoid(a)


@register
class CBAM(nn.Module):
    """Channel then spatial attention (reference conv.py:309)."""

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(dtype=self.dtype, name="channel_attention")(x, train)
        return SpatialAttention(self.kernel_size, dtype=self.dtype,
                                name="spatial_attention")(x, train)


# ---------------------------------------------------------------------------
# YOLOv10 backbone blocks (reference block.py)
# ---------------------------------------------------------------------------


@register
class SCDown(nn.Module):
    """1x1 channel mix + depthwise strided downsample (reference block.py:1084)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        return Conv(self.c2, self.k, self.s, g=self.c2, act=False, dtype=self.dtype,
                    name="cv2")(x, train)


@register
class RepVGGDW(nn.Module):
    """Depthwise 7x7 + 3x3 rep branches (reference block.py:753)."""

    ed: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.ed, 7, 1, p=3, g=self.ed, act=False, dtype=self.dtype,
                 name="conv")(x, train)
        y = y + Conv(self.ed, 3, 1, p=1, g=self.ed, act=False, dtype=self.dtype,
                     name="conv1")(x, train)
        return silu(y)


@register
class CIB(nn.Module):
    """Conditional identity block (reference block.py:815)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c1, 3, g=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = Conv(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = Conv(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = Conv(self.c2, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = Conv(self.c2, 3, g=self.c2, dtype=self.dtype, name="cv1_4")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


@register
class C2fCIB(C2f):
    """C2f whose inner blocks are CIBs (reference block.py:854)."""

    lk: bool = False

    def inner_block(self, c: int, i: int):
        return CIB(c, self.shortcut, e=1.0, lk=self.lk, dtype=self.dtype, name=f"m{i}")


@register
class PSA(nn.Module):
    """YOLOv10 position-sensitive attention block (reference block.py:967):
    split -> (attention residual, conv-FFN residual) on one half -> merge."""

    c2: int
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        assert c1 == self.c2
        c = int(c1 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(c, num_heads=max(1, c // 64), attn_ratio=0.5,
                          dtype=self.dtype, name="attn")(b, train)
        f = Conv(c * 2, 1, dtype=self.dtype, name="ffn_0")(b, train)
        f = Conv(c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        b = b + f
        return Conv(c1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )



# ---------------------------------------------------------------------------
# YOLOv9 GELAN blocks (reference block.py:569-679)
# ---------------------------------------------------------------------------


def _avg_pool_2x2_s1(x):
    """torch avg_pool2d(x, 2, 1, 0): window 2, stride 1, VALID, mean."""
    import jax.lax as lax

    s = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "VALID")
    return s / 4.0


class RepBottleneck(nn.Module):
    """Bottleneck whose first conv is a RepConv (reference block.py:569)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = RepConv(c_, 3, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class RepCSP(nn.Module):
    """C3 with RepBottleneck inner blocks (reference block.py:579)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = RepBottleneck(c_, self.shortcut, e=1.0, dtype=self.dtype,
                              name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


@register
class RepNCSPELAN4(nn.Module):
    """GELAN block: split + two RepCSP->Conv branches chained (block.py:589)."""

    c2: int
    c3: int
    c4: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.c3 // 2
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :half], y[..., half:]]
        b = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv2_0")(ys[-1], train)
        b = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2_1")(b, train)
        ys.append(b)
        c = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv3_0")(ys[-1], train)
        c = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3_1")(c, train)
        ys.append(c)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(
            jnp.concatenate(ys, axis=-1), train
        )


@register
class ELAN1(nn.Module):
    """Plain-conv ELAN variant (reference block.py:614, v9t/s)."""

    c2: int
    c3: int
    c4: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.c3 // 2
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :half], y[..., half:]]
        ys.append(Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2")(ys[-1], train))
        ys.append(Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3")(ys[-1], train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(
            jnp.concatenate(ys, axis=-1), train
        )


@register
class AConv(nn.Module):
    """avg-pool 2x2/s1 + strided conv downsample (reference block.py:627)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _avg_pool_2x2_s1(x)
        return Conv(self.c2, 3, 2, p=1, dtype=self.dtype, name="cv1")(x, train)


@register
class ADown(nn.Module):
    """Split downsample: strided conv half + maxpool half (block.py:641)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolo_ad_refine_tpu.nn.common import max_pool_same

        c = self.c2 // 2
        x = _avg_pool_2x2_s1(x)
        half = x.shape[-1] // 2
        x1 = Conv(c, 3, 2, p=1, dtype=self.dtype, name="cv1")(x[..., :half], train)
        x2 = max_pool_same(x[..., half:], 3, 2)
        x2 = Conv(c, 1, 1, p=0, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


@register
class SPPELAN(nn.Module):
    """SPP-ELAN: 3 chained maxpool(k) + concat (reference block.py:661)."""

    c2: int
    c3: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolo_ad_refine_tpu.nn.common import max_pool_same

        ys = [Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for _ in range(3):
            ys.append(max_pool_same(ys[-1], self.k, 1))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv5")(
            jnp.concatenate(ys, axis=-1), train
        )
