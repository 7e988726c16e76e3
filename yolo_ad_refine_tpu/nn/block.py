"""Backbone/neck building blocks (stock YOLO11 + fork-custom MLCA/HS-FPN set).

Parity surface (behavior, not code): reference ultralytics/nn/modules/block.py
- stock: Bottleneck:341, C2f:232, C3:256, C3k:742, C3k2:731, SPPF:177,
  Attention/PSABlock/C2PSA:874-1049
- fork-custom: ELA_HSFPN:1408, Multiply:1442, Add:1448, Fusion:1500,
  MLCA:1540, Bottleneck_MLCA:1586, C3k_MLCA/C3k2_MLCA:1596-1605

All modules are NHWC flax.linen with a ``dtype`` compute-dtype knob.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_ad_refine_tpu.nn.common import BatchNorm, Conv, max_pool_same, silu
from yolo_ad_refine_tpu.nn.registry import register

Dtype = Any


# ---------------------------------------------------------------------------
# stock blocks
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    """Standard residual bottleneck (reference block.py:341)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        # k entries may be ints (C3k/C2f style) or square tuples (C3's
        # ((1,1),(3,3)) — reference block.py:256); square kernels only
        k0, k1 = (k if isinstance(k, int) else k[0] for k in self.k)
        y = Conv(c_, k0, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, k1, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


@register
class C2f(nn.Module):
    """CSP bottleneck, 2 convolutions, n inner blocks (reference block.py:232)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    def inner_block(self, c: int, i: int):
        return Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(self.inner_block(c, i)(ys[-1], train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


@register
class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference block.py:256)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: tuple = ((1, 1), (3, 3))
    dtype: Dtype = jnp.float32

    def inner_block(self, c: int, i: int):
        return Bottleneck(c, self.shortcut, self.g, k=self.k, e=1.0, dtype=self.dtype, name=f"m{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = self.inner_block(c_, i)(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k(C3):
    """C3 with configurable inner kernel (reference block.py:742)."""

    kk: int = 3

    def inner_block(self, c: int, i: int):
        return Bottleneck(
            c, self.shortcut, self.g, k=(self.kk, self.kk), e=1.0, dtype=self.dtype, name=f"m{i}"
        )


@register
class C3k2(C2f):
    """C2f whose inner blocks are C3k(n=2) when c3k=True (reference block.py:731).

    yaml signature after parse: (c2, n, c3k, e, g, shortcut). Default
    shortcut=True matches the torch signature.
    """

    c3k: bool = False
    shortcut: bool = True

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")
        return Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5, dtype=self.dtype, name=f"m{i}")


@register
class SequentialBlocks(nn.Module):
    """Chain of adopted submodules — the parser's replacement for the
    reference's ``nn.Sequential(*(m(*args) for _ in range(n)))`` wrapping of
    repeated non-CSP rows (reference tasks.py:1095)."""

    blocks: tuple

    @nn.compact
    def __call__(self, x, train: bool = False):
        for b in self.blocks:
            x = b(x, train=train)
        return x


@register
class SPP(nn.Module):
    """Spatial pyramid pooling, parallel maxpools (reference block.py:146 SPP;
    used by the YOLOv3 zoo configs)."""

    c2: int
    k: tuple = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y] + [max_pool_same(y, k, 1) for k in self.k]
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


@register
class SPPF(nn.Module):
    """Spatial pyramid pooling fast: 3 chained maxpool(5) (reference block.py:177)."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for _ in range(3):
            ys.append(max_pool_same(ys[-1], self.k, 1))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class Attention(nn.Module):
    """YOLO11 area attention (reference block.py:874): qkv via 1x1 conv,
    key_dim = head_dim * attn_ratio, positional encoding = DW 3x3 on v."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        qkv = Conv(self.dim + nh_kd * 2, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, self.num_heads, key_dim * 2 + head_dim).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)  # (b, nh, n, ·)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        pe = Conv(self.dim, 3, 1, g=self.dim, act=False, dtype=self.dtype, name="pe")(
            v.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim), train
        )
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """Attention + conv-FFN block with residuals (reference block.py:963)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Attention(self.c, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = Conv(self.c * 2, 1, dtype=self.dtype, name="ffn_0")(x, train)
        f = Conv(self.c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        return x + f if self.shortcut else f


@register
class C2PSA(nn.Module):
    """Split + n PSABlocks + merge (reference block.py:1010)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    def inner_block(self, c: int, i: int):
        return PSABlock(c, 0.5, max(1, c // 64), dtype=self.dtype, name=f"m{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = self.inner_block(c, i)(b, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


# ---------------------------------------------------------------------------
# PPHGNetV2 blocks + RepConv family (RT-DETR backbone/neck; reference
# block.py:105 HGStem, :136 HGBlock, :283 RepC3; conv.py:83 LightConv,
# :173 RepConv)
# ---------------------------------------------------------------------------


@register
class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 convs + stride-1 maxpool with ceil padding."""

    cm: int
    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu = nn.relu
        x = Conv(self.cm, 3, 2, act=relu, dtype=self.dtype, name="stem1")(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm // 2, 2, 1, p=0, act=relu, dtype=self.dtype, name="stem2a")(x, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm, 2, 1, p=0, act=relu, dtype=self.dtype, name="stem2b")(x2, train)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([x1, x2], axis=-1)
        x = Conv(self.cm, 3, 2, act=relu, dtype=self.dtype, name="stem3")(x, train)
        return Conv(self.c2, 1, 1, act=relu, dtype=self.dtype, name="stem4")(x, train)


class LightConv(nn.Module):
    """1x1 conv (no act) + depthwise conv (reference conv.py:83)."""

    c2: int
    k: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return Conv(self.c2, self.k, g=self.c2, act=nn.relu, dtype=self.dtype, name="conv2")(y, train)


@register
class HGBlock(nn.Module):
    """PPHGNetV2 block: n chained (Light)Convs + squeeze/excite 1x1s."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu = nn.relu
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                ys.append(LightConv(self.cm, self.k, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
            else:
                ys.append(Conv(self.cm, self.k, act=relu, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        y = Conv(self.c2 // 2, 1, 1, act=relu, dtype=self.dtype, name="sc")(
            jnp.concatenate(ys, axis=-1), train
        )
        y = Conv(self.c2, 1, 1, act=relu, dtype=self.dtype, name="ec")(y, train)
        return y + x if self.shortcut and x.shape[-1] == self.c2 else y


class RepConv(nn.Module):
    """Train-form RepVGG conv: 3x3+BN and 1x1+BN branches summed then SiLU
    (reference conv.py:173 with its default bn=False — no identity-BN branch;
    deploy-time fusion is an export concern: XLA fuses at compile)."""

    c2: int
    k: int = 3
    s: int = 1
    identity_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = Conv(self.c2, self.k, self.s, act=False, dtype=self.dtype, name="conv1")(x, train)
        y2 = Conv(self.c2, 1, self.s, act=False, dtype=self.dtype, name="conv2")(x, train)
        y = y1 + y2
        if self.identity_bn and x.shape[-1] == self.c2 and self.s == 1:
            y = y + BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                                 dtype=self.dtype, name="bn")(x)
        return silu(y)


@register
class RepC3(nn.Module):
    """Rep C3 (reference block.py:283): RepConv stack + parallel 1x1, summed."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = RepConv(c_, dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = a + b
        if c_ != self.c2:
            y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)
        return y


# ---------------------------------------------------------------------------
# adaptive pooling helper (exact torch adaptive_avg_pool2d semantics)
# ---------------------------------------------------------------------------


def _adaptive_pool_matrix(size_in: int, size_out: int) -> np.ndarray:
    """(out, in) averaging matrix with torch's floor/ceil bin edges.

    Shapes are static under jit so this runs at trace time; pooling becomes a
    dense matmul, which maps cleanly onto the MXU.
    """
    m = np.zeros((size_out, size_in), dtype=np.float64)
    for i in range(size_out):
        s = (i * size_in) // size_out
        e = -(-((i + 1) * size_in) // size_out)  # ceil
        m[i, s:e] = 1.0 / (e - s)
    return m


def adaptive_avg_pool2d(x, out_hw):
    """NHWC adaptive average pool to (out_h, out_w), exact torch semantics."""
    _, h, w, _ = x.shape
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    mh = jnp.asarray(_adaptive_pool_matrix(h, oh), dtype=x.dtype)
    mw = jnp.asarray(_adaptive_pool_matrix(w, ow), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


def adaptive_max_pool2d(x, out_hw):
    """NHWC adaptive max pool, exact torch segment semantics. Static shapes
    let the (small) out_h x out_w slice grid unroll at trace time."""
    _, h, w, _ = x.shape
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw

    def seg(n, o, i):
        return (i * n) // o, -(-((i + 1) * n) // o)

    rows = []
    for i in range(oh):
        hs, he = seg(h, oh, i)
        cols = []
        for j in range(ow):
            ws, we = seg(w, ow, j)
            cols.append(jnp.max(x[:, hs:he, ws:we, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


# ---------------------------------------------------------------------------
# YOLO-World open-vocabulary blocks (reference block.py:418-523)
# ---------------------------------------------------------------------------


class MaxSigmoidAttnBlock(nn.Module):
    """Text-guided max-sigmoid spatial gate (reference block.py:418-450).

    Image embeddings score against every class text embedding; the max over
    classes, sigmoided per head, gates the 3x3-projected features."""

    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        b, h, w, c1 = x.shape
        hc = self.c2 // self.nh
        embed = (Conv(self.ec, 1, act=False, dtype=self.dtype, name="ec")(x, train)
                 if c1 != self.ec else x)
        g = nn.Dense(self.ec, dtype=jnp.float32, name="gl")(guide.astype(jnp.float32))
        g = g.reshape(g.shape[0], -1, self.nh, hc)          # (B, nc, nh, hc)
        e = embed.astype(jnp.float32).reshape(b, h, w, self.nh, hc)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", e, g)
        aw = jnp.max(aw, axis=-1) / (hc ** 0.5)             # (B, H, W, nh)
        bias = self.param("bias", nn.initializers.zeros, (self.nh,), jnp.float32)
        aw = nn.sigmoid(aw + bias)
        if self.scale:
            aw = aw * self.param("scale", nn.initializers.ones,
                                 (self.nh,), jnp.float32)
        y = Conv(self.c2, 3, act=False, dtype=self.dtype, name="proj_conv")(x, train)
        y = y.reshape(b, h, w, self.nh, hc) * aw[..., None].astype(y.dtype)
        return y.reshape(b, h, w, self.c2)


@register
class C2fAttn(nn.Module):
    """C2f with a trailing text-guided attn branch (reference block.py:453)."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0,
                                 dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        ys.append(MaxSigmoidAttnBlock(c, nh=self.nh, ec=self.ec, gc=self.gc,
                                      dtype=self.dtype, name="attn")(ys[-1], guide, train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), train)


@register
class ImagePoolingAttn(nn.Module):
    """Image-aware text refinement (reference block.py:480-523): pooled
    multi-scale patches attend into the text embeddings (residual)."""

    ec: int = 256
    ch: tuple = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, text, train: bool = False):
        bs = xs[0].shape[0]
        np_ = self.k * self.k
        feats = []
        for i, x in enumerate(xs):
            p = nn.Conv(self.ec, (1, 1), use_bias=True, dtype=jnp.float32,
                        name=f"projections_{i}")(x.astype(jnp.float32))
            feats.append(adaptive_max_pool2d(p, self.k).reshape(bs, np_, self.ec))
        xcat = jnp.concatenate(feats, axis=1)               # (B, nf*k^2, ec)
        text = text.astype(jnp.float32)
        q = nn.Dense(self.ec, name="query_1")(nn.LayerNorm(name="query_0")(text))
        kk = nn.Dense(self.ec, name="key_1")(nn.LayerNorm(name="key_0")(xcat))
        v = nn.Dense(self.ec, name="value_1")(nn.LayerNorm(name="value_0")(xcat))
        hc = self.ec // self.nh
        q = q.reshape(bs, -1, self.nh, hc)
        kk = kk.reshape(bs, -1, self.nh, hc)
        v = v.reshape(bs, -1, self.nh, hc)
        aw = nn.softmax(jnp.einsum("bnmc,bkmc->bmnk", q, kk) / (hc ** 0.5), axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(bs, -1, self.ec)
        out = nn.Dense(self.ct, name="proj")(out)
        if self.scale:
            out = out * self.param("scale", nn.initializers.zeros, (1,), jnp.float32)
        return out + text


# ---------------------------------------------------------------------------
# fork-custom: MLCA attention family
# ---------------------------------------------------------------------------


class MLCA(nn.Module):
    """Mixed Local Channel Attention (reference block.py:1540-1584).

    Local 5x5 + global adaptive pools, each passed through an ECA-style
    Conv1d(1,1,k) over the channel sequence, sigmoids mixed 50/50, unpooled
    back to (H, W) by adaptive averaging, multiplied into x.
    """

    local_size: int = 5
    gamma: int = 2
    b: int = 1
    local_weight: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bsz, h, w, c = x.shape
        t = int(abs(math.log2(c) + self.b) / self.gamma)
        k = t if t % 2 else t + 1
        ls = self.local_size

        local = adaptive_avg_pool2d(x, ls)  # (b, ls, ls, c)
        glob = jnp.mean(local, axis=(1, 2), keepdims=True)  # (b, 1, 1, c)

        # ECA convs: 1-channel 1D conv over a channel-major sequence
        conv_local = nn.Conv(1, (k,), padding=[((k - 1) // 2, (k - 1) // 2)], use_bias=False,
                             dtype=self.dtype, name="conv_local")
        conv_global = nn.Conv(1, (k,), padding=[((k - 1) // 2, (k - 1) // 2)], use_bias=False,
                              dtype=self.dtype, name="conv")

        # local: (b, ls, ls, c) -> sequence (b, ls*ls*c, 1); matches the torch
        # (b, 1, ls*ls*c) layout where channel index varies fastest.
        seq_local = local.reshape(bsz, ls * ls * c, 1)
        y_local = conv_local(seq_local).reshape(bsz, ls, ls, c)
        # global: (b, c) -> (b, c, 1)
        seq_global = glob.reshape(bsz, c, 1)
        y_global = conv_global(seq_global).reshape(bsz, 1, 1, c)

        att_local = nn.sigmoid(y_local)
        # Reference block.py:1576-1581 un-pools the global branch through
        # `y_global.view(b,-1).transpose(-1,-2).unsqueeze(-1)` -> shape
        # (c, b, 1), which adaptive_avg_pool2d reads as (C=c, H=b, W=1):
        # spatial row i of the 5x5 attention gets the mean of BATCH segment i
        # (a batch-mixing artifact of the upstream code; for b=1 it reduces
        # to a plain broadcast). Reproduced exactly — training parity means
        # matching the reference's dynamics, artifact included.
        sig = nn.sigmoid(y_global).reshape(bsz, c)
        seg = jnp.asarray(_adaptive_pool_matrix(bsz, ls), x.dtype)  # (ls, b)
        att_g = jnp.einsum("ib,bc->ic", seg, sig)                   # (ls, c)
        att_global = jnp.broadcast_to(att_g[None, :, None, :], att_local.shape)
        att = att_global * (1 - self.local_weight) + att_local * self.local_weight
        att = adaptive_avg_pool2d(att, (h, w))
        return x * att


class BottleneckMLCA(nn.Module):
    """Bottleneck with MLCA after cv2 (reference block.py:1586)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        y = MLCA(dtype=self.dtype, name="attention")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C3kMLCA(C3k):
    """C3k with MLCA bottlenecks at e=1.0 (reference block.py:1596)."""

    def inner_block(self, c: int, i: int):
        return BottleneckMLCA(
            c, self.shortcut, self.g, k=(self.kk, self.kk), e=1.0, dtype=self.dtype, name=f"m{i}"
        )


@register(name="C3k2_MLCA")
class C3k2MLCA(C3k2):
    """C3k2 with MLCA bottlenecks (reference block.py:1601); flagship layers 6/8/19/26."""

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3kMLCA(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")
        return BottleneckMLCA(c, self.shortcut, self.g, k=(3, 3), e=0.5, dtype=self.dtype, name=f"m{i}")


# ---------------------------------------------------------------------------
# fork-custom: HS-FPN gating + fusion nodes
# ---------------------------------------------------------------------------


@register(name="ELA_HSFPN")
class ELAHSFPN(nn.Module):
    """Efficient Local Attention for HS-FPN (reference block.py:1408-1424).

    Per-axis adaptive average pools through a shared Conv1d(k=7) + GroupNorm(16)
    + sigmoid over H and W; returns x*a_h*a_w (flag=True) or the raw attention
    map a_h*a_w (flag=False, used to gate a sibling branch via Multiply).
    """

    flag: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # names mirror the torch Sequential (conv1x1.0 = Conv1d, conv1x1.1 = GN)
        conv = nn.Conv(c, (7,), padding=[(3, 3)], use_bias=True, dtype=self.dtype,
                       name="conv1x1_0")
        gn = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype, name="conv1x1_1")

        pool_h = jnp.mean(x, axis=2)  # (b, h, c) — avg over W
        pool_w = jnp.mean(x, axis=1)  # (b, w, c) — avg over H
        a_h = nn.sigmoid(gn(conv(pool_h)))[:, :, None, :]  # (b, h, 1, c)
        a_w = nn.sigmoid(gn(conv(pool_w)))[:, None, :, :]  # (b, 1, w, c)
        return x * a_h * a_w if self.flag else a_h * a_w


@register
class Multiply(nn.Module):
    """Elementwise product over a 2-input list (reference block.py:1442)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return xs[0] * xs[1]


@register
class Add(nn.Module):
    """Elementwise sum over an input list (reference block.py:1448)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        out = xs[0]
        for x in xs[1:]:
            out = out + x
        return out


def _interp_matrix_align_corners(size_in: int, size_out: int) -> np.ndarray:
    """(out, in) bilinear interpolation matrix, align_corners=True.

    src(i) = i * (in-1)/(out-1); static shapes -> built at trace time, so
    upsampling becomes two dense matmuls riding the MXU (like the adaptive
    pool above) instead of a gather.
    """
    m = np.zeros((size_out, size_in), dtype=np.float64)
    if size_out == 1:
        m[0, 0] = 1.0
        return m
    scale = (size_in - 1) / (size_out - 1)
    for i in range(size_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, size_in - 1)
        f = src - lo
        m[i, lo] += 1.0 - f
        m[i, hi] += f
    return m


def resize_bilinear_align_corners(x, out_hw):
    """NHWC bilinear resize with torch align_corners=True semantics."""
    _, h, w, _ = x.shape
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(_interp_matrix_align_corners(h, oh), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix_align_corners(w, ow), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


@register
class GSConv(nn.Module):
    """Slim-neck GSConv (reference block.py:1457-1479): half the channels via
    a dense conv, the other half via a cheap 5x5 depthwise over them, then a
    pairwise channel shuffle (out[j*c_+i] = cat[2i+j])."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        x1 = Conv(c_, self.k, self.s, self.p, self.g, self.d,
                  dtype=self.dtype, name="cv1")(x, train)
        x2 = Conv(c_, 5, 1, None, c_, self.d, dtype=self.dtype,
                  name="cv2")(x1, train)
        y = jnp.concatenate([x1, x2], axis=-1)
        b, h, w, n = y.shape
        # de-interleave shuffle: out channel j*(n//2)+i <- y channel 2i+j
        y = y.reshape(b, h, w, n // 2, 2)
        y = jnp.swapaxes(y, -1, -2)
        return y.reshape(b, h, w, n)


class SDI(nn.Module):
    """Selective Dimension Interaction fusion (reference block.py:1481-1498,
    from U-Net v2): every input is GSConv-projected to the first input's
    channel count, resampled to its spatial size (adaptive-avg down,
    align_corners-bilinear up), and the results are multiplied."""

    channels: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        th, tw = xs[0].shape[1], xs[0].shape[2]
        ans = None
        for i, x in enumerate(xs):
            if x.shape[2] > tw:
                x = adaptive_avg_pool2d(x, (th, tw))
            elif x.shape[2] < tw:
                x = resize_bilinear_align_corners(x, (th, tw))
            y = GSConv(self.channels[0], dtype=self.dtype,
                       name=f"convs_{i}")(x, train)
            ans = y if ans is None else ans * y
        return ans


@register
class Fusion(nn.Module):
    """Multi-input fusion node (reference block.py:1500-1537).

    Modes: 'weight' (1x1 convs + sum), 'adaptive' (softmax gate), 'concat',
    'bifpn' (learnable ReLU-normalized weights — the flagship mode), 'SDI'
    (GSConv-projected multiplicative fusion).
    """

    inc_list: tuple
    fusion: str = "bifpn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        mode = self.fusion
        assert mode in ("weight", "adaptive", "concat", "bifpn", "SDI"), f"unsupported fusion {mode}"
        if mode == "SDI":
            return SDI(tuple(self.inc_list), dtype=self.dtype, name="SDI")(xs, train)
        if mode in ("weight", "adaptive"):
            xs = [
                Conv(c, 1, dtype=self.dtype, name=f"fusion_conv{i}")(x, train)
                for i, (x, c) in enumerate(zip(xs, self.inc_list))
            ]
        if mode == "weight":
            return sum(xs[1:], xs[0])
        if mode == "adaptive":
            gate = Conv(len(xs), 1, dtype=self.dtype, name="fusion_adaptive")(
                jnp.concatenate(xs, axis=-1), train
            )
            gate = nn.softmax(gate, axis=-1)
            return sum(gate[..., i : i + 1] * xs[i] for i in range(len(xs)))
        if mode == "concat":
            return jnp.concatenate(xs, axis=-1)
        # bifpn
        w = self.param("fusion_weight", nn.initializers.ones, (len(xs),), jnp.float32)
        w = nn.relu(w)
        w = w / (jnp.sum(w) + 1e-4)
        w = w.astype(xs[0].dtype)
        return sum(w[i] * xs[i] for i in range(len(xs)))
