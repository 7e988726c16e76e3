"""SAM (Segment Anything) modules, TPU-native flax.

Parity surface: reference models/sam/modules/ —
- encoders.py:23 ImageEncoderViT (patch embed, windowed/global ViT blocks
  with decomposed relative position, conv+LayerNorm2d neck),
- encoders.py:165 PromptEncoder (random-frequency positional encoding,
  point/box/mask embeddings),
- transformer.py:12 TwoWayTransformer (+TwoWayAttentionBlock, downsampled
  Attention),
- decoders.py:11 MaskDecoder (iou/mask tokens, two-way transformer, output
  upscaling, per-token hypernetwork MLPs),
- utils.py window_partition/unpartition + decomposed rel-pos.

Layouts are NHWC/channels-last throughout (the reference is NCHW); windowed
attention reshapes stay pure reshapes. Everything is static-shape and jits;
batch-1 image encoding at 1024px is the reference's own convention.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC's last axis (reference nn/modules
    LayerNorm2d: per-position normalization over C, eps 1e-6)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


class MLPBlock(nn.Module):
    """Linear -> act -> Linear (reference blocks.py MLPBlock)."""

    mlp_dim: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        h = nn.gelu(h, approximate=False) if self.act == "gelu" else nn.relu(h)
        return nn.Dense(d, dtype=self.dtype, name="lin2")(h)


class MLP(nn.Module):
    """n-layer ReLU MLP (reference blocks.py MLP), optional sigmoid."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return nn.sigmoid(x) if self.sigmoid else x


# ---------------------------------------------------------------------------
# image encoder (ViT)
# ---------------------------------------------------------------------------


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero pad (utils.py:126)."""
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(windows, ws: int, pad_hw, hw):
    """Inverse of window_partition (utils.py:158)."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // ws // ws)
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_coords(q_size: int, k_size: int):
    qc = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    return (qc - kc + (k_size - 1) * max(q_size / k_size, 1.0)).astype(jnp.int32)


class REAttention(nn.Module):
    """Multi-head attention with decomposed relative position
    (reference blocks.py REAttention + utils.py add_decomposed_rel_pos)."""

    dim: int
    num_heads: int
    use_rel_pos: bool
    input_size: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * self.num_heads, h * w, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (head_dim**-0.5)) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim), jnp.float32)
            rh = rel_h[_rel_coords(h, h)].astype(attn.dtype)      # (h, h, hd)
            rw = rel_w[_rel_coords(w, w)].astype(attn.dtype)      # (w, w, hd)
            rq = q.reshape(b * self.num_heads, h, w, head_dim)
            eh = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
            ew = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
            attn = attn.reshape(-1, h, w, h, w) + eh[:, :, :, :, None] + ew[:, :, None, :, :]
            attn = attn.reshape(-1, h * w, h * w)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = (attn @ v).reshape(b, self.num_heads, h * w, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Windowed/global transformer block (reference blocks.py Block)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int
    input_size: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        hw = x.shape[1:3]
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = REAttention(self.dim, self.num_heads, True, attn_size,
                        dtype=self.dtype, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + MLPBlock(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                            name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """Reference encoders.py:23 — patch embed + blocks + conv neck."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)  # (B, g, g, C)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, self.embed_dim), jnp.float32)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio, ws,
                         (g, g), dtype=self.dtype, name=f"blocks_{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_2")(x)
        return LayerNorm2d(name="neck_3")(x)  # (B, 64, 64, 256)


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------


class PositionEmbeddingRandom(nn.Module):
    """Random spatial-frequency PE (reference blocks.py:813)."""

    num_pos_feats: int = 128
    scale: float = 1.0

    def setup(self):
        self.pe_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            lambda k, shape, dtype=jnp.float32: self.scale * jax.random.normal(
                k, shape, dtype),
            (2, self.num_pos_feats), jnp.float32)

    def _encode(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.pe_matrix
        coords = 2 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], -1)

    def __call__(self, size: Tuple[int, int]):
        """Dense grid PE -> (H, W, 2*num_pos_feats)."""
        h, w = size
        ye = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xe = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xe, ye, indexing="xy"), -1)  # (H, W, 2)
        return self._encode(grid)

    def with_coords(self, coords, image_size: Tuple[int, int]):
        c = coords.astype(jnp.float32)
        c = c.at[..., 0].divide(image_size[1])
        c = c.at[..., 1].divide(image_size[0])
        return self._encode(c)


class PromptEncoder(nn.Module):
    """Reference encoders.py:165 — sparse (points/boxes) + dense (mask)
    prompt embeddings. Points are (B, N, 2) px with labels (B, N):
    1 fg / 0 bg / -1 pad; boxes (B, 2, 2) corner px."""

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        self.point_embeddings = [
            self.param(f"point_embeddings_{i}", nn.initializers.normal(1.0),
                       (1, self.embed_dim), jnp.float32) for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim), jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim), jnp.float32)
        self.mask_downscaling = [
            nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="mask_down_0"),
            LayerNorm2d(name="mask_down_1"),
            nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="mask_down_2"),
            LayerNorm2d(name="mask_down_3"),
            nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="mask_down_4"),
        ]

    def get_dense_pe(self):
        return self.pe_layer(self.image_embedding_size)  # (H, W, C)

    def _embed_points(self, points, labels, pad: bool):
        points = points + 0.5
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((points.shape[0], 1, 2))], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((labels.shape[0], 1))], axis=1)
        pe = self.pe_layer.with_coords(points, self.input_image_size)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, self.not_a_point_embed[0], pe)
        pe = pe + jnp.where(lab == 0, self.point_embeddings[0][0], 0.0)
        pe = pe + jnp.where(lab == 1, self.point_embeddings[1][0], 0.0)
        pe = pe + jnp.where(lab == 2, self.point_embeddings[2][0], 0.0)
        pe = pe + jnp.where(lab == 3, self.point_embeddings[3][0], 0.0)
        return pe

    def _embed_boxes(self, boxes):
        coords = boxes.reshape(-1, 2, 2) + 0.5
        ce = self.pe_layer.with_coords(coords, self.input_image_size)
        ce = ce.at[:, 0, :].add(self.point_embeddings[2][0])
        ce = ce.at[:, 1, :].add(self.point_embeddings[3][0])
        return ce

    def __call__(self, points=None, boxes=None, masks=None):
        """Returns (sparse (B, N, C), dense (B, H, W, C))."""
        b = (points[0].shape[0] if points is not None
             else boxes.shape[0] if boxes is not None
             else masks.shape[0] if masks is not None else 1)
        sparse = jnp.zeros((b, 0, self.embed_dim), jnp.float32)
        if points is not None:
            pts, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(pts, labels, pad=(boxes is None))], 1)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self._embed_boxes(boxes)], 1)
        if masks is not None:
            d = masks  # (B, 4*H, 4*W, 1)
            for i, layer in enumerate(self.mask_downscaling):
                d = layer(d)
                if i in (1, 3):
                    d = nn.gelu(d, approximate=False)
            dense = d
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1), (b, h, w, self.embed_dim))
        return sparse, dense


# ---------------------------------------------------------------------------
# two-way transformer + mask decoder
# ---------------------------------------------------------------------------


class DownAttention(nn.Module):
    """Attention with internal downsampling (reference transformer.py:265)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embedding_dim // self.downsample_rate
        hd = d // self.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(v)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        attn = (qh @ kh.transpose(0, 1, 3, 2)) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vh.dtype)
        out = attn @ vh
        b, nh, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Reference transformer.py:152."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = queries + 0 * query_pe  # keep pytree identical
            queries = DownAttention(self.embedding_dim, self.num_heads,
                                    dtype=self.dtype, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownAttention(
            self.embedding_dim, self.num_heads, 2, dtype=self.dtype,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm2")(queries)
        queries = queries + MLPBlock(self.mlp_dim, act="relu",
                                     dtype=self.dtype, name="mlp")(queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm3")(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownAttention(
            self.embedding_dim, self.num_heads, 2, dtype=self.dtype,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Reference transformer.py:12."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe (B, H, W, C); point_embedding (B, N, C)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c) if image_pe.ndim == 4 else image_pe
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DownAttention(
            self.embedding_dim, self.num_heads, 2, dtype=self.dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    """Reference decoders.py:11."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool):
        """image_embeddings (1, H, W, C); image_pe (H, W, C); sparse
        (B, N, C); dense (B, H, W, C). Returns (masks (B, k, 4H, 4W),
        iou_pred (B, k))."""
        nm = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.transformer_dim), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nm, self.transformer_dim), jnp.float32)
        b = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], 0)[None],
            (b, 1 + nm, self.transformer_dim))
        tokens = jnp.concatenate([out_tokens, sparse_prompt.astype(jnp.float32)], 1)

        src = jnp.broadcast_to(image_embeddings,
                               (b, *image_embeddings.shape[1:])) + dense_prompt
        pos = jnp.broadcast_to(image_pe[None], (b, *image_pe.shape))
        hs, src = TwoWayTransformer(
            embedding_dim=self.transformer_dim, dtype=self.dtype,
            name="transformer")(src.astype(self.dtype), pos.astype(self.dtype),
                                tokens.astype(self.dtype))
        iou_tok = hs[:, 0]
        mask_toks = hs[:, 1 : 1 + nm]

        h, w = image_embeddings.shape[1:3]
        src = src.reshape(b, h, w, self.transformer_dim)
        up = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="upscale_0")(src)
        up = LayerNorm2d(name="upscale_1")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="upscale_2")(up)
        up = nn.gelu(up, approximate=False)          # (B, 4H, 4W, C/8)

        hyper = jnp.stack([
            MLP(self.transformer_dim, self.transformer_dim // 8, 3,
                dtype=self.dtype, name=f"hyper_{i}")(mask_toks[:, i])
            for i in range(nm)
        ], axis=1)                                    # (B, nm, C/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper.astype(jnp.float32),
                           up.astype(jnp.float32))
        iou_pred = MLP(self.iou_head_hidden_dim, nm, self.iou_head_depth,
                       dtype=self.dtype, name="iou_prediction_head")(
            iou_tok.astype(jnp.float32))

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]
