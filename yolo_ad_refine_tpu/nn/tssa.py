"""Token-Statistics Self-Attention family + frequency-domain FFN + adapters.

Parity surface (behavior): reference ultralytics/nn/modules/block.py
- DynamicTanh:1624, AttentionTSSA:1646 (ToST linear attention),
  TSSAlock_DYT_Mona_EDFFN:1685, C2TSSA_DYT_Mona_EDFFN:1705
- EDFFN:2376 (8x8-patch rFFT filter, fp32-forced)
- CrossScaleAttentionTSSA:2417, AdaptiveDynamicTanh:2493,
  ProgressiveFeatureFusion:2579, ProgressiveTSSA_Fusion:2632,
  C2PTSSA (=C2ProgressiveTSSA_Fusion):2700
- Mona/MonaOp: reference ultralytics/nn/modules/mona.py:12-65

TPU notes: all attention here is linear in token count (the fork's strategy
for small objects); the EDFFN FFT is computed in float32 (matching the
reference's explicit .float() cast) and the rest runs in the compute dtype.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.nn.block import C2PSA, adaptive_avg_pool2d
from yolo_ad_refine_tpu.nn.common import BatchNorm, conv2d
from yolo_ad_refine_tpu.nn.registry import register

Dtype = Any


def gelu_exact(x):
    """Exact (erf) GELU — torch F.gelu default (flax defaults to tanh approx)."""
    return jax.nn.gelu(x, approximate=False)


class DynamicTanh(nn.Module):
    """Norm-free normalization tanh(alpha*x)*w + b (reference block.py:1624)."""

    alpha_init: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.constant(self.alpha_init), (1,), jnp.float32)
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (jnp.tanh(alpha.astype(x.dtype) * x) * w.astype(x.dtype) + b.astype(x.dtype))


class AttentionTSSA(nn.Module):
    """Token Statistics Self-Attention, O(N) in tokens (reference block.py:1646).

    Faithful to the fork's variant: qkv is a single shared Linear, weights are
    L2-normalized over the token axis, and Pi is softmaxed over the *head*
    axis (the fork's nn.Softmax(dim=1) on a (b, h, n) tensor).
    """

    dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (b, n, c) tokens
        b, n, c = x.shape
        h = self.num_heads
        d = self.dim // h
        w = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="qkv")(x)
        w = w.reshape(b, n, h, d).transpose(0, 2, 1, 3)  # (b, h, n, d)

        temp = self.param("temp", nn.initializers.ones, (h, 1), jnp.float32)
        w32 = w.astype(jnp.float32)
        w_normed = w32 / (jnp.linalg.norm(w32, axis=-2, keepdims=True) + 1e-12)
        w_sq = w_normed**2
        logits = jnp.sum(w_sq, axis=-1) * temp  # (b, h, n)
        pi = nn.softmax(logits, axis=1)  # softmax over heads — fork semantics
        pi_norm = pi / (jnp.sum(pi, axis=-1, keepdims=True) + 1e-8)
        dots = jnp.einsum("bhn,bhnd->bhd", pi_norm, w32**2)[:, :, None, :]  # (b, h, 1, d)
        attn = 1.0 / (1.0 + dots)
        out = -(w32 * pi[..., None]) * attn
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim).astype(x.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out_0")(out)


class MonaOp(nn.Module):
    """Multi-kernel depthwise mixer (reference mona.py:12-33)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y1 = conv2d(x, c, 3, p=1, g=c, dtype=self.dtype, name="conv1")
        y2 = conv2d(x, c, 5, p=2, g=c, dtype=self.dtype, name="conv2")
        y3 = conv2d(x, c, 7, p=3, g=c, dtype=self.dtype, name="conv3")
        x = (y1 + y2 + y3) / 3.0 + x
        return x + conv2d(x, c, 1, dtype=self.dtype, name="projector")


class Mona(nn.Module):
    """Multi-cognitive visual adapter (reference mona.py:36-65)."""

    dtype: Dtype = jnp.float32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        identity = x
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (c,), jnp.float32)
        gammax = self.param("gammax", nn.initializers.ones, (c,), jnp.float32)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x) * gamma.astype(
            x.dtype
        ) + x * gammax.astype(x.dtype)
        y = conv2d(y, 64, 1, dtype=self.dtype, name="project1")
        y = MonaOp(dtype=self.dtype, name="adapter_conv")(y, train)
        y = gelu_exact(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = conv2d(y, c, 1, dtype=self.dtype, name="project2")
        return identity + y


@_lru_cache(maxsize=4)
def _edffn_linear_basis(ps: int):
    """G[p, k, q] = irfft2(e_k * rfft2(delta_q))[p] over ps x ps patches:
    the constant (real) basis that makes the EDFFN frequency filter a plain
    contraction (see YAT_EDFFN_FFT=linear). Built by composing the actual
    numpy ops, so it is exact by construction."""
    import numpy as _np

    p = ps * ps
    kk = ps * (ps // 2 + 1)
    deltas = _np.eye(p, dtype=_np.float64).reshape(p, ps, ps)
    spec = _np.fft.rfft2(deltas)                       # (P, ps, ps//2+1)
    spec = spec.reshape(p, kk)
    g = _np.empty((p, kk, p), _np.float32)
    for k in range(kk):
        masked = _np.zeros_like(spec)
        masked[:, k] = spec[:, k]
        out = _np.fft.irfft2(masked.reshape(p, ps, ps // 2 + 1),
                             s=(ps, ps))               # (P_in, ps, ps)
        g[:, k, :] = out.reshape(p, p).T.astype(_np.float32)
    return g


class EDFFN(nn.Module):
    """Frequency-domain FFN from EVSSM (reference block.py:2376-2415).

    1x1 expand (2x factor, doubled for the gate) -> depthwise 3x3 -> chunked
    GELU gate -> 1x1 project -> reflect-pad to 8-multiples -> per-8x8-patch
    rfft2 * learnable real filter -> irfft2 -> crop. FFT runs in float32
    (reference forces .float()), result cast back to the input dtype.
    """

    dim: int
    ffn_expansion_factor: float = 2.0
    patch_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_dtype = x.dtype
        hidden = int(self.dim * self.ffn_expansion_factor)
        y = conv2d(x, hidden * 2, 1, use_bias=False, dtype=self.dtype, name="project_in")
        y = conv2d(y, hidden * 2, 3, p=1, g=hidden * 2, use_bias=False, dtype=self.dtype, name="dwconv")
        y1, y2 = jnp.split(y, 2, axis=-1)
        y = gelu_exact(y1) * y2
        y = conv2d(y, self.dim, 1, use_bias=False, dtype=self.dtype, name="project_out")

        b, h, w, c = y.shape
        ps = self.patch_size
        h_n = (ps - h % ps) % ps
        w_n = (ps - w % ps) % ps
        yp = jnp.pad(y, ((0, 0), (0, h_n), (0, w_n), (0, 0)), mode="reflect")
        hp, wp = h + h_n, w + w_n
        # Patch layout: keep arrays <= 5-D AND the FFT axes trailing.
        # jnp.fft over interior axes inserts its own transposes — a 6-D one
        # (original layout) and a complex one (irfft2 input), neither of
        # which TFLite can legalize (flagship int8 export). With the patch
        # axes last, rfft2/irfft2 emit no transposes; the two remaining
        # transposes are 5-D real. Same math, different memory walk.
        patches = yp.reshape(b * (hp // ps), ps, wp // ps, ps, c)
        patches = patches.transpose(0, 2, 4, 1, 3)  # (b*gh, gw, c, ps, ps)
        fft_param = self.param(
            "fft", nn.initializers.ones, (ps, ps // 2 + 1, c), jnp.float32
        )
        import os

        if os.environ.get("YAT_EDFFN_FFT") == "linear":
            # TFLite-exportable formulation: irfft2 . diag(f) . rfft2 is
            # BILINEAR in (patch, filter), so it equals a contraction with a
            # precomputed constant basis G[p, k, q] = irfft2(e_k * rfft2(
            # delta_q))[p] — no FFT op in the graph (vhlo.fft does not
            # legalize to TFLite). ~100x the FLOPs of the FFT on an 8x8
            # patch, negligible at export batch sizes; exact same math
            # (asserted by tests/test_edffn_linear.py).
            g = jnp.asarray(_edffn_linear_basis(ps))          # (P, K, P)
            pv = patches.astype(jnp.float32).reshape(
                patches.shape[0], patches.shape[1], c, ps * ps)
            fk = fft_param.reshape(ps * (ps // 2 + 1), c)     # (K, C)
            a = jnp.einsum("ngcq,pkq->ngckp", pv, g)
            out = jnp.einsum("ngckp,kc->ngcp", a, fk)
            patches = out.reshape(patches.shape[0], patches.shape[1], c,
                                  ps, ps)
        else:
            f = jnp.fft.rfft2(patches.astype(jnp.float32), axes=(-2, -1))
            # f: (b*gh, gw, c, ps, ps//2+1); broadcasts over (b*gh, gw)
            f = f * fft_param.transpose(2, 0, 1)[None, None]
            patches = jnp.fft.irfft2(f, s=(ps, ps), axes=(-2, -1))
        patches = patches.transpose(0, 3, 1, 4, 2)  # (b*gh, ps, gw, ps, c)
        yp = patches.reshape(b, hp, wp, c)
        return yp[:, :h, :w, :].astype(x_dtype)


class TSSAlockDyTMonaEDFFN(nn.Module):
    """PSABlock variant: DyT->TSSA residual->Mona->DyT->EDFFN residual->Mona
    (reference block.py:1685-1703). Used by C2TSSA_DYT_Mona_EDFFN (697 ablation)."""

    c: int
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        tokens = DynamicTanh(dtype=self.dtype, name="dyt1")(x, train).reshape(b, h * w, c)
        a = AttentionTSSA(c, self.num_heads, dtype=self.dtype, name="attn")(tokens, train)
        a = a.reshape(b, h, w, c)
        x = x + a if self.shortcut else a
        x = Mona(dtype=self.dtype, name="mona1")(x, train)
        f = EDFFN(c, 2, dtype=self.dtype, name="ffn")(
            DynamicTanh(dtype=self.dtype, name="dyt2")(x, train), train
        )
        x = x + f if self.shortcut else f
        return Mona(dtype=self.dtype, name="mona2")(x, train)


@register(name="C2TSSA_DYT_Mona_EDFFN")
class C2TSSADyTMonaEDFFN(C2PSA):
    """C2PSA wrapper around TSSAlock blocks (reference block.py:1705)."""

    def inner_block(self, c: int, i: int):
        return TSSAlockDyTMonaEDFFN(c, num_heads=c // 64, dtype=self.dtype, name=f"m{i}")


class CrossScaleAttentionTSSA(nn.Module):
    """TSSA at scales [1,2,4] fused by multi-head attention (reference block.py:2417-2491)."""

    dim: int
    num_heads: int = 8
    scales: tuple = (1, 2, 4)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (b, h, w, c) — returns tokens (b, h*w, c) like the reference
        b, h, w, c = x.shape
        nh = self.num_heads
        d = self.dim // nh
        temps = self.param("temps", nn.initializers.ones, (len(self.scales), nh, 1), jnp.float32)
        outs = []
        for i, scale in enumerate(self.scales):
            if scale > 1:
                xs = adaptive_avg_pool2d(x, (h // scale, w // scale))
                xs = jax.image.resize(xs, (b, h, w, c), method="bilinear")
                tokens = xs.reshape(b, h * w, c)
            else:
                tokens = x.reshape(b, h * w, c)
            qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype,
                           name=f"qkv_projections_{i}")(tokens)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, -1, nh, d).transpose(0, 2, 1, 3).astype(jnp.float32)
            k = k.reshape(b, -1, nh, d).transpose(0, 2, 1, 3).astype(jnp.float32)
            v = v.reshape(b, -1, nh, d).transpose(0, 2, 1, 3).astype(jnp.float32)
            q_normed = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
            pi = nn.softmax(jnp.sum(q_normed**2, axis=-1) * temps[i], axis=-1)  # over tokens
            dots = jnp.einsum("bhn,bhnd->bhd", pi, k**2)[:, :, None, :]
            attn = 1.0 / (1.0 + dots)
            out = -(v * pi[..., None]) * attn
            out = out.transpose(0, 2, 1, 3).reshape(b, h * w, self.dim).astype(x.dtype)
            outs.append(out)

        if len(outs) > 1:
            stacked = jnp.concatenate(outs, axis=1)  # (b, ns*n, c)
            fused = nn.MultiHeadDotProductAttention(
                num_heads=nh, qkv_features=self.dim, out_features=self.dim,
                dtype=self.dtype, name="cross_scale_fusion",
            )(stacked, stacked)
            fused = fused.reshape(b, len(outs), h * w, c).mean(axis=1)
        else:
            fused = outs[0]
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out_0")(fused)


class AdaptiveDynamicTanh(nn.Module):
    """Multi-scale DyT with SE-style importance gating (reference block.py:2493)."""

    num_scales: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ns = self.num_scales
        alphas = self.param(
            "alphas", lambda k: jnp.linspace(0.3, 1.0, ns).astype(jnp.float32), )
        scale_w = self.param("scale_weights", nn.initializers.constant(1.0 / ns), (ns,), jnp.float32)
        del scale_w  # present in the reference's state dict but unused in forward
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        # names mirror the torch Sequential indices (importance_gate.1 / .3)
        g = conv2d(gap, c // 4, 1, dtype=self.dtype, name="importance_gate_1")
        g = nn.relu(g)
        g = conv2d(g, ns, 1, dtype=self.dtype, name="importance_gate_3")
        importance = nn.softmax(g, axis=-1)  # (b, 1, 1, ns)

        out = 0.0
        for i in range(ns):
            out = out + jnp.tanh(alphas[i].astype(x.dtype) * x) * importance[..., i : i + 1]
        return out * weight.astype(x.dtype) + bias.astype(x.dtype)


class ProgressiveFeatureFusion(nn.Module):
    """3-stage depthwise/channel-mix refinement with learned stage weights
    (reference block.py:2579-2630)."""

    num_stages: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        stage_att = self.param(
            "stage_attention", nn.initializers.constant(1.0 / self.num_stages),
            (self.num_stages,), jnp.float32,
        )
        outs = []
        current = x
        for i in range(self.num_stages):
            p = conv2d(current, c, 3, p=1, g=c, dtype=self.dtype, name=f"stages_{i}_conv")
            p = BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"stages_{i}_norm")(p)
            p = gelu_exact(p)
            ch_mix = conv2d(p, c, 1, dtype=self.dtype, name=f"stages_{i}_channel_mix")
            sp_mix = conv2d(p, c, 7, p=3, g=c, dtype=self.dtype, name=f"stages_{i}_spatial_mix")
            out = ch_mix + sp_mix + current
            outs.append(out)
            if i < self.num_stages - 1:
                fused = jnp.concatenate([current, out], axis=-1)
                current = conv2d(fused, c, 1, dtype=self.dtype, name=f"stage_fusion_{i}")
        final = sum(stage_att[i].astype(x.dtype) * outs[i] for i in range(self.num_stages))
        return final + x


class ProgressiveTSSAFusion(nn.Module):
    """The C2PTSSA inner block (reference block.py:2632-2698):
    PFF -> AdaptiveDyT -> CrossScaleTSSA (x learnable 0.1 residual)
    -> PFF -> AdaptiveDyT -> EDFFN (x learnable 0.1 residual)."""

    c: int
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        identity = x
        rw1 = self.param("residual_weight1", nn.initializers.constant(0.1), (), jnp.float32)
        rw2 = self.param("residual_weight2", nn.initializers.constant(0.1), (), jnp.float32)

        x = ProgressiveFeatureFusion(dtype=self.dtype, name="progressive_fusion1")(x, train)
        y = AdaptiveDynamicTanh(dtype=self.dtype, name="dyt1")(x, train)
        attn = CrossScaleAttentionTSSA(c, self.num_heads, dtype=self.dtype, name="attn")(y, train)
        attn = attn.reshape(b, h, w, c)
        x = identity + attn * rw1.astype(x.dtype) if self.shortcut else attn

        x = ProgressiveFeatureFusion(dtype=self.dtype, name="progressive_fusion2")(x, train)
        y = AdaptiveDynamicTanh(dtype=self.dtype, name="dyt2")(x, train)
        f = EDFFN(c, 2, dtype=self.dtype, name="ffn")(y, train)
        return x + f * rw2.astype(x.dtype) if self.shortcut else f


@register(name="C2PTSSA", aliases=("C2ProgressiveTSSA_Fusion",))
class C2PTSSA(C2PSA):
    """Flagship layer-10 module (reference block.py:2700-2710)."""

    def inner_block(self, c: int, i: int):
        return ProgressiveTSSAFusion(c, num_heads=max(1, c // 64), dtype=self.dtype, name=f"m{i}")


# ---------------------------------------------------------------------------
# C2SFA ablation family (reference block.py:2049-2374)
# ---------------------------------------------------------------------------


class SEBlock(nn.Module):
    """Squeeze-and-Excitation gate (reference block.py:2049-2064)."""

    r: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = conv2d(g, int(c / self.r), 1, use_bias=False, dtype=self.dtype, name="fc0")
        g = nn.relu(g)
        g = conv2d(g, c, 1, use_bias=False, dtype=self.dtype, name="fc1")
        return x * nn.sigmoid(g)


class StandardFFN(nn.Module):
    """1x1 expand -> GELU -> 1x1 project (reference block.py:2066-2078)."""

    expansion: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = conv2d(x, int(c * self.expansion), 1, use_bias=False, dtype=self.dtype, name="cv1")
        y = gelu_exact(y)
        return conv2d(y, c, 1, use_bias=False, dtype=self.dtype, name="cv2")


class SimpleFeatureProcessor(nn.Module):
    """GroupNorm -> DW3x3 -> GELU -> PW1x1 (reference block.py:2080-2096)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.GroupNorm(num_groups=max(1, c // 32), epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = conv2d(y, c, 3, p=1, g=c, dtype=self.dtype, name="conv_dw")
        y = gelu_exact(y)
        return conv2d(y, c, 1, dtype=self.dtype, name="conv_pw")


class ProgressiveTSSAFusion0(nn.Module):
    """The C2SFA inner block (reference block.py:2152-2215): SFP -> SE gate
    (x0.1 residual) then SFP -> FFN (x0.1 residual)."""

    c: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        rw1 = self.param("residual_weight1", nn.initializers.constant(0.1), (), jnp.float32)
        rw2 = self.param("residual_weight2", nn.initializers.constant(0.1), (), jnp.float32)
        y = SimpleFeatureProcessor(dtype=self.dtype, name="pre_attn_block")(x, train)
        y = SEBlock(dtype=self.dtype, name="attn")(y, train)
        x = x + y * rw1.astype(x.dtype) if self.shortcut else y
        y = SimpleFeatureProcessor(dtype=self.dtype, name="pre_ffn_block")(x, train)
        y = StandardFFN(dtype=self.dtype, name="ffn")(y, train)
        return x + y * rw2.astype(x.dtype) if self.shortcut else y


@register(name="C2SFA")
class C2SFA(C2PSA):
    """C2PSA with ProgressiveTSSA_Fusion0 blocks (reference block.py:2358-2374)."""

    def inner_block(self, c: int, i: int):
        return ProgressiveTSSAFusion0(c, dtype=self.dtype, name=f"m{i}")


# ---------------------------------------------------------------------------
# Remaining ablation variants (dead in the reference's active path but part
# of its shipped module surface): PSABlock_EDFFN/C2PSA_EDFFN (block.py:1612,
# 1618), HierarchicalMona (1782), AdaptiveTSSA_Enhanced (1901) /
# C2AdaptiveTSSA_Enhanced (2033), ProgressiveFeatureFusion1 (2206, identical
# body to ProgressiveFeatureFusion), ProgressiveTSSA_Fusion1 (2285) /
# C2ProgressiveTSSA_Fusion1 (2339).
# ---------------------------------------------------------------------------


class PSABlockEDFFN(nn.Module):
    """PSABlock whose conv-FFN is replaced by EDFFN (reference block.py:1612)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolo_ad_refine_tpu.nn.block import Attention

        a = Attention(self.c, self.num_heads, self.attn_ratio,
                      dtype=self.dtype, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = EDFFN(self.c, 2, dtype=self.dtype, name="ffn")(x, train)
        return x + f if self.shortcut else f


@register(name="C2PSA_EDFFN")
class C2PSAEDFFN(C2PSA):
    """C2PSA with PSABlock_EDFFN blocks (reference block.py:1618)."""

    def inner_block(self, c: int, i: int):
        return PSABlockEDFFN(c, 0.5, max(1, c // 64), dtype=self.dtype, name=f"m{i}")


class HierarchicalMona(nn.Module):
    """Multi-level Mona adapter pyramid (reference block.py:1782-1899):
    each level projects down (halving channels, floor 32), runs MonaOp,
    projects back up + channel LayerNorm; levels chained by concat+1x1
    fusion, combined by learned per-level weights, gated by a tiny gamma."""

    hierarchy_levels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        final_w = self.param(
            "final_weights",
            nn.initializers.constant(1.0 / self.hierarchy_levels),
            (self.hierarchy_levels,), jnp.float32)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (c,), jnp.float32)

        identity = x
        outs = []
        current = x
        for lv in range(self.hierarchy_levels):
            next_dim = max(32, c // (2 ** lv))
            y = conv2d(current, next_dim, 1, dtype=self.dtype,
                       name=f"level_processors_{lv}_project_down")
            y = MonaOp(dtype=self.dtype, name=f"level_processors_{lv}_mona_op")(y, train)
            y = conv2d(y, c, 1, dtype=self.dtype,
                       name=f"level_processors_{lv}_project_up")
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"level_processors_{lv}_norm")(y)
            outs.append(y)
            if lv < self.hierarchy_levels - 1:
                fused = jnp.concatenate([current, y], axis=-1)
                current = conv2d(fused, c, 1, dtype=self.dtype,
                                 name=f"level_fusion_{lv}")
        weighted = sum(final_w[i].astype(x.dtype) * outs[i] for i in range(len(outs)))
        return identity + weighted * gamma.astype(x.dtype)


class AdaptiveTSSAEnhanced(nn.Module):
    """AdaptiveDyT + cross-scale TSSA + HierarchicalMona + gated EDFFN
    (reference block.py:1901-2031)."""

    c: int
    num_heads: int = 4
    shortcut: bool = True
    scales: tuple = (1, 2, 4)
    hierarchy_levels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        y = AdaptiveDynamicTanh(len(self.scales), dtype=self.dtype, name="dyt1")(x, train)
        attn = CrossScaleAttentionTSSA(
            c, self.num_heads, self.scales, dtype=self.dtype, name="attn")(y, train)
        attn = attn.reshape(b, h, w, c)
        x = x + attn if self.shortcut else attn

        x = HierarchicalMona(self.hierarchy_levels, dtype=self.dtype, name="mona1")(x, train)

        y = AdaptiveDynamicTanh(len(self.scales), dtype=self.dtype, name="dyt2")(x, train)
        f = EDFFN(c, 2, dtype=self.dtype, name="ffn")(y, train)
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = conv2d(gap, c // 4, 1, dtype=self.dtype, name="feature_gate_1")
        g = nn.relu(g)
        g = conv2d(g, c, 1, dtype=self.dtype, name="feature_gate_3")
        f = f * nn.sigmoid(g)
        x = x + f if self.shortcut else f

        return HierarchicalMona(self.hierarchy_levels, dtype=self.dtype, name="mona2")(x, train)


@register(name="C2AdaptiveTSSA_Enhanced")
class C2AdaptiveTSSAEnhanced(C2PSA):
    """C2PSA with AdaptiveTSSA_Enhanced blocks (reference block.py:2033-2047)."""

    def inner_block(self, c: int, i: int):
        return AdaptiveTSSAEnhanced(c, num_heads=max(1, c // 64),
                                    dtype=self.dtype, name=f"m{i}")


# Identical module body to ProgressiveFeatureFusion (the reference keeps a
# verbatim duplicate at block.py:2206 for the _Fusion1 family).
ProgressiveFeatureFusion1 = ProgressiveFeatureFusion


class ProgressiveTSSAFusion1(nn.Module):
    """PTSSA variant with GroupNorm attention input and a 4x EDFFN
    (reference block.py:2285-2336)."""

    c: int
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        rw1 = self.param("res_w1", nn.initializers.constant(0.1), (), jnp.float32)
        rw2 = self.param("res_w2", nn.initializers.constant(0.1), (), jnp.float32)

        res1 = x
        x = ProgressiveFeatureFusion1(dtype=self.dtype, name="feature_enhancement1")(x, train)
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="attn_norm")(x)
        attn = CrossScaleAttentionTSSA(
            c, self.num_heads, dtype=self.dtype, name="attn")(y, train)
        attn = attn.reshape(b, h, w, c)
        x = res1 + attn * rw1.astype(x.dtype) if self.shortcut else attn

        res2 = x
        x = ProgressiveFeatureFusion1(dtype=self.dtype, name="feature_enhancement2")(x, train)
        f = EDFFN(c, 4, dtype=self.dtype, name="ffn")(x, train)
        return res2 + f * rw2.astype(x.dtype) if self.shortcut else f


@register(name="C2ProgressiveTSSA_Fusion1")
class C2ProgressiveTSSAFusion1(C2PSA):
    """C2PSA with ProgressiveTSSA_Fusion1 blocks, 32-ch heads
    (reference block.py:2339-2357)."""

    def inner_block(self, c: int, i: int):
        return ProgressiveTSSAFusion1(c, num_heads=max(1, c // 32),
                                      dtype=self.dtype, name=f"m{i}")
