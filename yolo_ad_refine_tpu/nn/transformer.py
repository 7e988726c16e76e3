"""Transformer modules for RT-DETR.

Parity surface: reference ultralytics/nn/modules/transformer.py —
TransformerEncoderLayer:28 / AIFI:86 (2D sincos pos-emb encoder on P5),
MSDeformAttn:218 (multiscale deformable attention; the grid_sample kernel
becomes our batched block-gather bilinear sampler), Deformable decoder
layer:318 / decoder:374, MLP:175 — plus head.py:333 RTDETRDecoder (anchor
query selection + iterative refinement).

TPU notes: all shapes static (nq=300 queries, fixed level shapes); the
deformable sampling reuses ops.deform's single-gather bilinear formulation.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.nn.common import BatchNorm, Conv
from yolo_ad_refine_tpu.nn.registry import register
from yolo_ad_refine_tpu.ops.deform import _bilinear_sample

Dtype = Any


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1.0 - x, eps, None))


def sincos_2d(w: int, h: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    """2D sine-cosine positional embedding (reference AIFI
    build_2d_sincos_position_embedding) — static, computed host-side."""
    assert dim % 4 == 0
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32), indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim)
    out_w = grid_w.flatten()[:, None] @ omega[None]
    out_h = grid_h.flatten()[:, None] @ omega[None]
    return np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )[None]  # (1, h*w, dim)


class MHA(nn.Module):
    """Standard multi-head attention (torch nn.MultiheadAttention equivalent)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None):
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, out_features=self.dim,
            dtype=self.dtype, name="mha",
        )(q, k, v, mask=attn_mask)


@register
class AIFI(nn.Module):
    """Intra-scale feature interaction encoder on P5 (reference transformer.py:86)."""

    cm: int = 2048
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        pos = jnp.asarray(sincos_2d(w, h, c), dtype=x.dtype)
        # NOTE: reference flattens (c, h, w) -> tokens in (h, w) row-major with
        # pos built on (w, h) meshgrid 'ij' — token order matches flatten of
        # grid_w-major; our NHWC flatten is (h, w) row-major, same as torch's.
        src = x.reshape(b, h * w, c)
        q = k = src + pos
        attn = MHA(c, self.num_heads, dtype=self.dtype, name="ma")(q, k, src)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn)
        ffn = nn.Dense(self.cm, dtype=self.dtype, name="fc1")(src)
        ffn = jax.nn.gelu(ffn, approximate=False)
        ffn = nn.Dense(c, dtype=self.dtype, name="fc2")(ffn)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + ffn)
        return src.reshape(b, h, w, c)


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (reference transformer.py:175)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def ms_deformable_attention(value, value_shapes, sampling_locations, attention_weights):
    """Multiscale deformable attention core (reference nn/modules/utils.py:42).

    value: (B, V, nh, d); sampling_locations: (B, Q, nh, L, P, 2) in [0,1];
    attention_weights: (B, Q, nh, L, P). The per-level grid_sample becomes our
    batched single-gather bilinear sampler (align_corners=False semantics).
    """
    b, v, nh, d = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    splits = [h * w for h, w in value_shapes]
    starts = np.cumsum([0] + splits)
    out = jnp.zeros((b, q, nh, d), jnp.float32)
    for lvl, (h, w) in enumerate(value_shapes):
        val = value[:, starts[lvl] : starts[lvl + 1]]  # (B, h*w, nh, d)
        val = val.transpose(0, 2, 1, 3).reshape(b * nh, h * w, d)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, nh, P, 2)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(b * nh, q * n_points, 2)
        # [0,1] -> pixel coords with half-pixel centers (align_corners=False)
        cx = loc[..., 0] * w - 0.5
        cy = loc[..., 1] * h - 0.5
        sampled = _bilinear_sample(val, cy, cx, h, w)  # (B*nh, Q*P, d)
        sampled = sampled.reshape(b, nh, q, n_points, d)
        wts = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # (B, nh, Q, P)
        out = out + jnp.einsum("bhqpd,bhqp->bqhd", sampled.astype(jnp.float32),
                               wts.astype(jnp.float32))
    return out.reshape(b, q, nh * d)


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention module (reference transformer.py:218)."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes):
        """query (B,Q,C); refer_bbox (B,Q,L,4) in [0,1]; value (B,V,C)."""
        b, q = query.shape[:2]
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // nh

        v = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(b, -1, nh, d)
        offsets = nn.Dense(nh * nl * npts * 2, dtype=self.dtype,
                           bias_init=_msda_offset_bias_init(nh, nl, npts),
                           kernel_init=nn.initializers.zeros, name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, nh, nl, npts, 2).astype(jnp.float32)
        weights = nn.Dense(nh * nl * npts, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros, name="attention_weights")(query)
        weights = nn.softmax(
            weights.reshape(b, q, nh, nl * npts).astype(jnp.float32), axis=-1
        ).reshape(b, q, nh, nl, npts)

        rb = refer_bbox.astype(jnp.float32)
        if rb.shape[-1] == 4:
            add = offsets / npts * rb[:, :, None, :, None, 2:] * 0.5
            locations = rb[:, :, None, :, None, :2] + add
        else:
            norm = jnp.asarray([[wd, ht] for ht, wd in value_shapes], jnp.float32)
            locations = rb[:, :, None, :, None, :] + offsets / norm[None, None, None, :, None, :]

        out = ms_deformable_attention(v, value_shapes, locations, weights)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out.astype(query.dtype))


def _msda_offset_bias_init(nh, nl, npts):
    """Reference MSDeformAttn._reset_parameters grid bias."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(nh, dtype=np.float32) * (2.0 * np.pi / nh)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid.reshape(nh, 1, 1, 2), (1, nl, npts, 1))
        for i in range(npts):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class DeformableDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py:318)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, query_pos=None, attn_mask=None):
        q = k = embed if query_pos is None else embed + query_pos
        tgt = MHA(self.d_model, self.n_heads, dtype=self.dtype, name="self_attn")(
            q, k, embed, attn_mask
        )
        embed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(embed + tgt)
        tgt = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                           dtype=self.dtype, name="cross_attn")(
            embed if query_pos is None else embed + query_pos,
            refer_bbox[:, :, None, :].repeat(self.n_levels, axis=2),
            feats, shapes,
        )
        embed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(embed + tgt)
        ffn = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ffn)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(embed + ffn)


@register
class RTDETRDecoder(nn.Module):
    """RT-DETR decoder head (reference head.py:333-560).

    Anchor-based query selection over encoder features, ndl deformable decoder
    layers with iterative box refinement. Train returns
    (dec_bboxes, dec_scores, enc_bboxes, enc_scores); eval returns
    (y, raw) where y = (B, nq, 4+nc), xywh normalized to [0,1] (the
    reference's convention; the predictor scales by image size).

    Contrastive denoising: pass ``dn`` (train only) built by
    train/rtdetr.py make_cdn_group — {'cls' (B,ndn) int, 'bbox_logit'
    (B,ndn,4), 'valid' (B,ndn), 'attn_blocked' (T,T) bool True=blocked}.
    The dn queries are PREPENDED to the matching queries (reference
    head.py RTDETRDecoder._get_decoder_input: cat([dn_embed, embed], 1))
    and the blocked mask keeps dn groups mutually blind.
    """

    nc: int = 80
    ch: tuple = (512, 1024, 2048)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    eval_idx: int = -1
    learnt_init_query: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False, input_h: int | None = None,
                 dn: dict | None = None):
        b = xs[0].shape[0]
        nl = len(self.ch)
        # input projection: conv1x1 + BN per level (reference input_proj)
        feats_list, shapes = [], []
        for i, x in enumerate(xs):
            p = nn.Conv(self.hd, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"input_proj_{i}_0")(x)
            p = BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"input_proj_{i}_1")(p)
            h, w = p.shape[1], p.shape[2]
            feats_list.append(p.reshape(b, h * w, self.hd))
            shapes.append((h, w))
        feats = jnp.concatenate(feats_list, axis=1)  # (B, V, hd)

        # anchors (static shapes -> host-side numpy)
        anchors_np, valid_np = [], []
        for i, (h, w) in enumerate(shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                                 np.arange(w, dtype=np.float32), indexing="ij")
            xy = (np.stack([gx, gy], -1) + 0.5) / np.asarray([w, h], np.float32)
            wh = np.ones_like(xy) * 0.05 * (2.0**i)
            anchors_np.append(np.concatenate([xy, wh], -1).reshape(-1, 4))
        anchors_np = np.concatenate(anchors_np)
        valid = ((anchors_np > 1e-2) & (anchors_np < 1 - 1e-2)).all(-1, keepdims=True)
        logit = np.log(anchors_np / (1 - anchors_np))
        logit[~np.repeat(valid, 4, axis=1)] = np.inf
        anchors = jnp.asarray(logit)[None]  # (1, V, 4)
        valid_mask = jnp.asarray(valid.astype(np.float32))[None]  # (1, V, 1)

        # encoder head + query selection
        enc = nn.Dense(self.hd, dtype=self.dtype, name="enc_output_0")(feats * valid_mask)
        enc = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="enc_output_1")(enc)
        enc_scores_all = nn.Dense(
            self.nc, dtype=self.dtype,
            bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01) / 80 * self.nc),
            name="enc_score_head",
        )(enc)  # (B, V, nc)
        topk_val, topk_idx = jax.lax.top_k(jnp.max(enc_scores_all, axis=-1), self.nq)
        top_feats = jnp.take_along_axis(enc, topk_idx[..., None], axis=1)  # (B, nq, hd)
        top_anchors = jnp.take_along_axis(jnp.broadcast_to(anchors, (b, anchors.shape[1], 4)),
                                          topk_idx[..., None], axis=1)
        refer_logit = MLP(self.hd, 4, 3, dtype=self.dtype, name="enc_bbox_head")(top_feats) \
            + top_anchors
        enc_bboxes = nn.sigmoid(refer_logit)
        enc_scores = jnp.take_along_axis(enc_scores_all, topk_idx[..., None], axis=1)

        # denoising class embedding (reference get_cdn_group's class_embed)
        dn_embed_w = self.param("denoising_class_embed", nn.initializers.normal(1.0),
                                (self.nc, self.hd), jnp.float32)

        if self.learnt_init_query:
            embed = jnp.broadcast_to(
                self.param("tgt_embed", nn.initializers.xavier_uniform(), (self.nq, self.hd),
                           jnp.float32)[None], (b, self.nq, self.hd),
            ).astype(feats.dtype)
        else:
            embed = top_feats
        if train:
            embed = jax.lax.stop_gradient(embed)
            refer_logit = jax.lax.stop_gradient(refer_logit)

        attn_mask = None
        if dn is not None and train:
            dn_embed = dn_embed_w[dn["cls"]] * dn["valid"][..., None]  # (B, ndn, hd)
            embed = jnp.concatenate([dn_embed.astype(embed.dtype), embed], axis=1)
            refer_logit = jnp.concatenate(
                [dn["bbox_logit"].astype(refer_logit.dtype), refer_logit], axis=1
            )
            # flax mask convention: True = ATTEND (reference's is True = block)
            attn_mask = (~dn["attn_blocked"])[None, None]  # (1, 1, T, T)

        pos_mlp = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype, name="query_pos_head")
        dec_layers = [
            DeformableDecoderLayer(self.hd, self.nh, self.d_ffn, nl, self.ndp,
                                   dtype=self.dtype, name=f"decoder_layers_{i}")
            for i in range(self.ndl)
        ]
        bbox_heads = [MLP(self.hd, 4, 3, dtype=self.dtype, name=f"dec_bbox_head_{i}")
                      for i in range(self.ndl)]
        score_heads = [
            nn.Dense(self.nc, dtype=self.dtype,
                     bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01) / 80 * self.nc),
                     name=f"dec_score_head_{i}")
            for i in range(self.ndl)
        ]

        # always run the full layer stack and create every head's params
        # (train/eval produce identical VALUES; only gradient stop points
        # differ — reference decoder semantics, transformer.py:374-425)
        eval_idx = self.eval_idx if self.eval_idx >= 0 else self.ndl + self.eval_idx
        refer = nn.sigmoid(refer_logit)
        out = embed
        dec_bboxes, dec_scores = [], []
        last_refined = None
        for i in range(self.ndl):
            out = dec_layers[i](out, refer, feats, shapes, pos_mlp(refer), attn_mask)
            bbox = bbox_heads[i](out).astype(jnp.float32)
            refined = nn.sigmoid(bbox + inverse_sigmoid(refer))
            dec_scores.append(score_heads[i](out))
            if train:
                dec_bboxes.append(
                    refined if i == 0 else nn.sigmoid(bbox + inverse_sigmoid(last_refined))
                )
            else:
                dec_bboxes.append(refined)
            last_refined = refined
            refer = jax.lax.stop_gradient(refined) if train else refined

        dec_bboxes = jnp.stack(dec_bboxes)
        dec_scores = jnp.stack(dec_scores)
        raw = (dec_bboxes, dec_scores, enc_bboxes, enc_scores)
        if train:
            return raw
        y = jnp.concatenate(
            [dec_bboxes[eval_idx], nn.sigmoid(dec_scores[eval_idx].astype(jnp.float32))], axis=-1
        )  # (B, nq, 4+nc), xywh normalized [0,1]
        return y, raw