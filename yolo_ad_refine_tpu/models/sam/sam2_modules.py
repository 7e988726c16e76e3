"""SAM2 building blocks: Hiera trunk, FPN neck, memory attention/encoder,
and the SAM2 mask decoder.

Parity surface (torch reference):
- Hiera / FpnNeck / ImageEncoder / MemoryEncoder: models/sam/modules/encoders.py:378-794
- MultiScaleBlock / RoPEAttention / PositionEmbeddingSine / CXBlock / Fuser /
  MaskDownSampler: models/sam/modules/blocks.py
- MemoryAttention(Layer): models/sam/modules/memory_attention.py
- SAM2MaskDecoder: models/sam/modules/decoders.py:176-518
- rotary helpers: models/sam/modules/utils.py:74-123

TPU-native choices: NHWC layouts end to end; batch-first sequences (the
reference's seq-first transposes disappear); rotary encoding as real
cos/sin pair rotation instead of complex views; fixed-shape memory banks
with additive masking instead of python-length concatenation (see sam2.py).
Stochastic depth is omitted (every shipped build uses drop_path_rate=0).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.models.sam.modules import (
    MLP,
    LayerNorm2d,
    MLPBlock,
    window_partition,
    window_unpartition,
)

Dtype = Any


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------


def position_embedding_sine(h: int, w: int, dim: int = 256,
                            temperature: int = 10000) -> jnp.ndarray:
    """Sine PE over a (h, w) grid -> (h, w, dim). Reference blocks.py:698
    (normalize=True, scale=2*pi, channel order [pos_y, pos_x])."""
    npf = dim // 2
    scale = 2 * math.pi
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w)) / (h + 1e-6) * scale
    x = jnp.broadcast_to(x, (h, w)) / (w + 1e-6) * scale
    dim_t = jnp.arange(npf, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   -1).reshape(h, w, -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   -1).reshape(h, w, -1)
    return jnp.concatenate([py, px], -1)


def get_1d_sine_pe(pos, dim: int, temperature: float = 10000.0):
    """1D sine PE for scalar positions (reference utils.py:63-71)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], -1)


def axial_rope_angles(head_dim: int, end_x: int, end_y: int,
                      theta: float = 10000.0) -> jnp.ndarray:
    """Axial RoPE angles for an (end_y, end_x) grid -> (N, head_dim//2)
    (reference utils.py:74-92; row-major t: x = t % end_x, y = t // end_x)."""
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 4,
                                        dtype=jnp.float32)[:quarter] / head_dim))
    t = jnp.arange(end_x * end_y, dtype=jnp.float32)
    tx = t % end_x
    ty = jnp.floor(t / end_x)
    return jnp.concatenate([tx[:, None] * freqs[None], ty[:, None] * freqs[None]], -1)


def apply_rotary(x, angles):
    """Rotate interleaved pairs of the last dim by `angles` (N, d/2).
    x (B, H, N, d). Matches torch's complex-view formulation."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    cos = jnp.cos(angles)[None, None]
    sin = jnp.sin(angles)[None, None]
    re = xr[..., 0] * cos - xr[..., 1] * sin
    im = xr[..., 0] * sin + xr[..., 1] * cos
    return jnp.stack([re, im], -1).reshape(x.shape)


# ---------------------------------------------------------------------------
# Hiera trunk
# ---------------------------------------------------------------------------


class MultiScaleAttention(nn.Module):
    """Windowless multi-scale attention with optional q-pooling
    (reference blocks.py:503-580)."""

    dim_out: int
    num_heads: int
    q_stride: Tuple[int, int] | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        nh = self.num_heads
        hd = self.dim_out // nh
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_stride:
            sy, sx = self.q_stride
            q = q.reshape(b, h, w, nh * hd)
            q = nn.max_pool(q, (sy, sx), strides=(sy, sx))
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, nh, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, -1)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed attention + optional stage-change q-pool
    (reference blocks.py:583-695)."""

    dim: int
    dim_out: int
    num_heads: int
    q_stride: Tuple[int, int] | None = None
    window_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
            if self.q_stride:
                shortcut = nn.max_pool(shortcut, self.q_stride,
                                       strides=self.q_stride)

        ws = self.window_size
        h, w = x.shape[1:3]
        if ws > 0:
            x, pad_hw = window_partition(x, ws)

        x = MultiScaleAttention(self.dim_out, self.num_heads,
                                q_stride=self.q_stride, dtype=self.dtype,
                                name="attn")(x)
        if self.q_stride:
            ws = ws // self.q_stride[0]
            h, w = shortcut.shape[1:3]
            pad_h = (ws - h % ws) % ws if ws else 0
            pad_w = (ws - w % ws) % ws if ws else 0
            pad_hw = (h + pad_h, w + pad_w)
        if self.window_size > 0:
            x = window_unpartition(x, ws, pad_hw, (h, w))

        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLPBlock(int(self.dim_out * self.mlp_ratio), act="gelu",
                     dtype=self.dtype, name="mlp")(y)
        return x + y


class Hiera(nn.Module):
    """Hierarchical ViT trunk (reference encoders.py:645-794). Returns one
    NHWC feature map per stage, highest resolution first."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (2, 3, 16, 3)
    q_pool: int = 3
    q_stride: Tuple[int, int] = (2, 2)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    global_att_blocks: Sequence[int] = (12, 16, 20)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        depth = sum(self.stages)
        stage_ends = [sum(self.stages[:i]) - 1
                      for i in range(1, len(self.stages) + 1)]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]

        x = nn.Conv(self.embed_dim, (7, 7), strides=(4, 4),
                    padding=[(3, 3), (3, 3)], dtype=self.dtype,
                    name="patch_embed")(x)
        h, w = x.shape[1:3]

        # windowed positional embedding (abs bkg interpolated + tiled window)
        bkg = self.param("pos_embed", nn.initializers.zeros,
                         (1, *self.window_pos_embed_bkg_spatial_size,
                          self.embed_dim))
        win = self.param("pos_embed_window", nn.initializers.zeros,
                         (1, self.window_spec[0], self.window_spec[0],
                          self.embed_dim))
        pe = jax.image.resize(bkg, (1, h, w, self.embed_dim), method="bicubic")
        pe = pe + jnp.tile(win, (1, h // win.shape[1], w // win.shape[2], 1))
        x = x + pe

        outputs = []
        dim = self.embed_dim
        heads = self.num_heads
        cur_stage = 1
        for i in range(depth):
            dim_out = dim
            window_size = self.window_spec[cur_stage - 1]
            if self.global_att_blocks and i in self.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim=dim, dim_out=dim_out, num_heads=heads,
                q_stride=self.q_stride if i in q_pool_blocks else None,
                window_size=window_size, dtype=self.dtype,
                name=f"blocks_{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs


class FpnNeck(nn.Module):
    """FPN neck without output convs; nearest top-down on levels 2,3
    (reference encoders.py:501-642). Input: Hiera outputs hi-res first;
    returns ([features], [pos]) hi-res first, each (B, H, W, d_model)."""

    d_model: int = 256
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)
    fpn_top_down_levels: Sequence[int] = (2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            # convs[n - i] consumes backbone_channel_list[n - i] == xs[i]
            lat = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                          name=f"convs_{n - i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                b, ph, pw, c = prev.shape
                td = jax.image.resize(prev.astype(jnp.float32),
                                      (b, ph * 2, pw * 2, c), method="nearest")
                prev = lat + td.astype(lat.dtype)
            else:
                prev = lat
            out[i] = prev
            pos[i] = position_embedding_sine(
                prev.shape[1], prev.shape[2], self.d_model).astype(prev.dtype)
        return out, pos


class ImageEncoder(nn.Module):
    """Hiera trunk + FPN neck, scalp=1 (reference encoders.py:446-498)."""

    trunk: Hiera
    neck: FpnNeck
    scalp: int = 1

    def __call__(self, x):
        feats, pos = self.neck(self.trunk(x))
        if self.scalp > 0:
            feats, pos = feats[: -self.scalp], pos[: -self.scalp]
        return {"vision_features": feats[-1], "vision_pos_enc": pos,
                "backbone_fpn": feats}


# ---------------------------------------------------------------------------
# memory encoder
# ---------------------------------------------------------------------------


class CXBlock(nn.Module):
    """ConvNeXt block (reference blocks.py:114-205)."""

    dim: int
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        p = self.padding
        x = nn.Conv(self.dim, (self.kernel_size, self.kernel_size),
                    padding=[(p, p), (p, p)], feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = LayerNorm2d(name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init_value),
                           (self.dim,))
        return inp + gamma * x


class MaskDownSampler(nn.Module):
    """Downsample a (B, H, W, 1) mask by total_stride with channel expansion
    (reference blocks.py:54-111)."""

    embed_dim: int = 256
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    total_stride: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        chans = 1
        p = self.padding
        for i in range(num_layers):
            chans = chans * self.stride ** 2
            x = nn.Conv(chans, (self.kernel_size, self.kernel_size),
                        strides=(self.stride, self.stride),
                        padding=[(p, p), (p, p)], dtype=self.dtype,
                        name=f"encoder_{i}")(x)
            x = LayerNorm2d(name=f"norm_{i}")(x)
            x = nn.gelu(x, approximate=False)
        return nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class MemoryEncoder(nn.Module):
    """Fuse pixel features with a predicted mask into a memory map
    (reference encoders.py:378-443). Returns (features, pos) NHWC."""

    out_dim: int = 64
    in_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, masks, skip_mask_sigmoid: bool = False):
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        masks = MaskDownSampler(embed_dim=self.in_dim, dtype=self.dtype,
                                name="mask_downsampler")(masks)
        x = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype,
                    name="pix_feat_proj")(pix_feat)
        x = x + masks
        for i in range(2):
            x = CXBlock(self.in_dim, dtype=self.dtype, name=f"fuser_{i}")(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                        name="out_proj")(x)
        pos = position_embedding_sine(x.shape[1], x.shape[2],
                                      self.out_dim).astype(x.dtype)
        return x, jnp.broadcast_to(pos[None], x.shape)


# ---------------------------------------------------------------------------
# memory attention
# ---------------------------------------------------------------------------


class RoPEAttention(nn.Module):
    """Attention with axial rotary PE on a square token grid
    (reference blocks.py:405-485). Batch-first (B, N, C)."""

    embedding_dim: int = 256
    num_heads: int = 1
    kv_in_dim: int | None = None
    rope_k_repeat: bool = False
    rope_theta: float = 10000.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0, k_mask=None):
        """num_k_exclude_rope: trailing k tokens (object pointers) skipped by
        RoPE. k_mask (B, M) True=valid adds -inf to masked logits."""
        nh = self.num_heads
        d = self.embedding_dim
        hd = d // nh
        qp = nn.Dense(d, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(d, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(d, dtype=self.dtype, name="v_proj")(v)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qp), heads(kp), heads(vp)
        n_q = qh.shape[2]
        side = int(round(math.sqrt(n_q)))
        angles = axial_rope_angles(hd, side, side, self.rope_theta)
        qh = apply_rotary(qh, angles)
        num_k_rope = kh.shape[2] - num_k_exclude_rope
        if num_k_rope > 0:
            k_angles = angles
            if self.rope_k_repeat and num_k_rope != n_q:
                reps = num_k_rope // n_q
                k_angles = jnp.tile(angles, (reps, 1))
            k_rot = apply_rotary(kh[:, :, :num_k_rope], k_angles)
            kh = jnp.concatenate([k_rot, kh[:, :, num_k_rope:]], 2)

        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / math.sqrt(hd)
        if k_mask is not None:
            attn = jnp.where(k_mask[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], n_q, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    """RoPE self-attn + RoPE cross-attn to memory + FFN
    (reference memory_attention.py:12-137). Pre-norm, batch-first."""

    d_model: int = 256
    dim_feedforward: int = 2048
    mem_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, num_k_exclude_rope: int = 0,
                 k_mask=None):
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        t2 = RoPEAttention(self.d_model, 1, dtype=self.dtype,
                           name="self_attn")(t2, t2, t2)
        tgt = tgt + t2
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        t2 = RoPEAttention(self.d_model, 1, kv_in_dim=self.mem_dim,
                           rope_k_repeat=True, dtype=self.dtype,
                           name="cross_attn_image")(
            t2, memory + pos, memory,
            num_k_exclude_rope=num_k_exclude_rope, k_mask=k_mask)
        tgt = tgt + t2
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt)
        t2 = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                      name="linear1")(t2)
        t2 = nn.relu(t2)
        t2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(t2)
        return tgt + t2


class MemoryAttention(nn.Module):
    """Stack of memory attention layers (reference memory_attention.py:140)."""

    d_model: int = 256
    num_layers: int = 4
    mem_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, curr, memory, curr_pos, memory_pos,
                 num_obj_ptr_tokens: int = 0, k_mask=None):
        out = curr + 0.1 * curr_pos      # pos_enc_at_input
        for i in range(self.num_layers):
            out = MemoryAttentionLayer(
                self.d_model, mem_dim=self.mem_dim, dtype=self.dtype,
                name=f"layers_{i}")(out, memory, memory_pos, curr_pos,
                                    num_k_exclude_rope=num_obj_ptr_tokens,
                                    k_mask=k_mask)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(out)


# ---------------------------------------------------------------------------
# SAM2 mask decoder
# ---------------------------------------------------------------------------


class SAM2MaskDecoder(nn.Module):
    """MaskDecoder + object score token + high-res skip features + dynamic
    multimask stability fallback (reference decoders.py:176-518)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = True
    iou_prediction_use_sigmoid: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    pred_obj_scores: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool, high_res_features=None):
        """image_embeddings (B, H, W, C); image_pe (H, W, C); sparse (B,N,C);
        dense (B, H, W, C); high_res_features [(B,4H,4W,C/8),(B,2H,2W,C/4)].
        Returns (masks (B,k,4H,4W), iou (B,k), sam_tokens (B,k',C),
        obj_score_logits (B,1))."""
        from yolo_ad_refine_tpu.models.sam.modules import TwoWayTransformer

        td = self.transformer_dim
        nm = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, td), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nm, td), jnp.float32)
        obj_token = self.param("obj_score_token", nn.initializers.normal(1.0),
                               (1, td), jnp.float32) if self.pred_obj_scores \
            else jnp.zeros((0, td), jnp.float32)
        s = 1 if self.pred_obj_scores else 0
        b = sparse_prompt.shape[0]
        out_tokens = jnp.concatenate([obj_token, iou_token, mask_tokens], 0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (b, s + 1 + nm, td)),
             sparse_prompt.astype(jnp.float32)], 1)

        src = image_embeddings + dense_prompt
        pos = jnp.broadcast_to(image_pe[None], (b, *image_pe.shape))
        hs, src = TwoWayTransformer(
            embedding_dim=td, dtype=self.dtype, name="transformer")(
            src.astype(self.dtype), pos.astype(self.dtype),
            tokens.astype(self.dtype))
        iou_tok = hs[:, s]
        mask_toks = hs[:, s + 1 : s + 1 + nm]

        h, w = image_embeddings.shape[1:3]
        src = src.reshape(b, h, w, td)
        up = nn.ConvTranspose(td // 4, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="upscale_0")(src)
        if self.use_high_res_features:
            up = up + high_res_features[1]
        up = LayerNorm2d(name="upscale_1")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(td // 8, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="upscale_2")(up)
        if self.use_high_res_features:
            up = up + high_res_features[0]
        up = nn.gelu(up, approximate=False)

        hyper = jnp.stack([
            MLP(td, td // 8, 3, dtype=self.dtype, name=f"hyper_{i}")(
                mask_toks[:, i]) for i in range(nm)
        ], axis=1)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper.astype(jnp.float32),
                           up.astype(jnp.float32))
        iou_pred = MLP(self.iou_head_hidden_dim, nm, self.iou_head_depth,
                       dtype=self.dtype, name="iou_prediction_head")(
            iou_tok.astype(jnp.float32))
        if self.iou_prediction_use_sigmoid:
            iou_pred = jax.nn.sigmoid(iou_pred)

        if self.pred_obj_scores:
            obj_logits = MLP(td, 1, 3, dtype=self.dtype,
                             name="pred_obj_score_head")(
                hs[:, 0].astype(jnp.float32))
        else:
            obj_logits = 10.0 * jnp.ones((b, 1), jnp.float32)

        if multimask_output:
            out_masks, out_iou = masks[:, 1:], iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability:
            out_masks, out_iou = self._dynamic_multimask(masks, iou_pred)
        else:
            out_masks, out_iou = masks[:, 0:1], iou_pred[:, 0:1]

        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens = mask_toks[:, 1:]
        else:
            sam_tokens = mask_toks[:, 0:1]
        return out_masks, out_iou, sam_tokens, obj_logits

    def _dynamic_multimask(self, masks, ious):
        """Fall back to the best multimask when token-0 is unstable
        (reference decoders.py:456-518)."""
        delta = self.dynamic_multimask_stability_delta
        single = masks[:, 0:1]
        flat = single.reshape(*single.shape[:2], -1)
        area_i = jnp.sum(flat > delta, -1).astype(jnp.float32)
        area_u = jnp.sum(flat > -delta, -1).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1), 1.0)
        is_stable = stability >= self.dynamic_multimask_stability_thresh

        multi_iou = ious[:, 1:]
        best = jnp.argmax(multi_iou, -1)
        bidx = jnp.arange(masks.shape[0])
        best_masks = masks[:, 1:][bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]
        out_masks = jnp.where(is_stable[..., None, None], single, best_masks)
        out_iou = jnp.where(is_stable, ious[:, 0:1], best_iou)
        return out_masks, out_iou
