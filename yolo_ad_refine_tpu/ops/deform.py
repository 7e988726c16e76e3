"""Modulated deformable convolution (DCNv2) for TPU.

The reference's AYHead depends on ``mmcv.ops.ModulatedDeformConv2d`` — a
CUDA/C++ kernel (reference head.py:749-782). TPUs have no library op for it,
so this implements the identical math as XLA-friendly gathers:

- for each of the 3x3 taps, sampling coordinates = base grid + static tap
  offset + learned offset (dy, dx), bilinearly interpolated with zero padding
  outside the image (mmcv convention),
- each tap's sample is scaled by its sigmoid mask, then contracted against
  the tap's weight slice on the MXU (one (C -> Cout) matmul per tap, unrolled
  — keeps live memory to one tap instead of a 9x blowup).

Layouts: NHWC activations, HWIO weights. Offsets are (B, H, W, 2*K*K) as
(dy, dx) pairs per tap in row-major tap order; masks are (B, H, W, K*K).
Stride 1 / pad k//2 / dilation 1 (the AYHead configuration).

This is the top Pallas-kernel candidate if it shows up in step-time profiles;
the gather formulation is already fusion-friendly and fp32-accumulated.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _bilinear_sample(x_flat, coords_y, coords_x, h: int, w: int):
    """Bilinearly sample x_flat (B, H*W, C) at float coords (B, N).

    Out-of-bounds samples contribute zero (mmcv zero-padding convention:
    a corner contributes iff it lies inside the feature map).

    TPU formulation: the feature map is zero-padded by 1 so every corner
    fetch becomes a legal 2x2xC block read, and all four corners of every
    sample come from ONE lax.gather of contiguous 2x2 blocks — XLA gathers
    are index-rate-bound, so one block gather beats four row gathers ~4x.
    Beyond-pad coordinates clip into the zero ring, preserving exact
    zero-outside semantics.
    """
    b, n = coords_y.shape
    c = x_flat.shape[-1]
    x = x_flat.reshape(b, h, w, c)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    ly = (coords_y - y0)
    lx = (coords_x - x0)
    # +1 for the pad ring; clip keeps far-out samples inside the zero ring
    iy = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    ix = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    # fully-out-of-range corners: floor < -1 or > h-? handled below via masks
    starts = jnp.stack([iy, ix], axis=-1)  # (B, N, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_one(xp_b, starts_b):
        return jax.lax.gather(
            xp_b, starts_b, dnums, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (N, 2, 2, C)

    blocks = jax.vmap(gather_one)(xp, starts)  # (B, N, 2, 2, C)

    # When the block start didn't clip (floor in [-1, size-1]) the zero ring
    # reproduces zero-outside semantics exactly. When it did clip, the true
    # sample is fully outside (both corners) -> zero the weights.
    in_y = ((y0 >= -1) & (y0 <= h - 1)).astype(jnp.float32)
    in_x = ((x0 >= -1) & (x0 <= w - 1)).astype(jnp.float32)
    wy = jnp.stack([1.0 - ly, ly], axis=-1) * in_y[..., None]  # (B, N, 2)
    wx = jnp.stack([1.0 - lx, lx], axis=-1) * in_x[..., None]

    weights = (wy[:, :, :, None] * wx[:, :, None, :]).astype(x_flat.dtype)  # (B, N, 2, 2)
    return jnp.einsum("bnyx,bnyxc->bnc", weights, blocks)


def modulated_deform_conv2d_dense(x, offset, mask, weight, bias=None, k: int = 3,
                                  max_offset: float = 3.0):
    """Bounded-offset DCNv2 with a fully DENSE formulation (training path).

    XLA's gather has a scatter-add adjoint that serializes on TPU (measured
    seconds per step), so for training the learned offsets are clipped to
    ±max_offset and bilinear sampling becomes separable hat-weighted sums of
    statically-shifted slices: no gather anywhere, dense VPU forward AND
    backward. Identical to the exact kernel whenever |offset| <= max_offset
    (the alignment-head regime); inference uses the exact gather kernel.

    x (B,H,W,C), offset (B,H,W,2*k*k), mask (B,H,W,k*k), weight (k,k,C,Cout).
    """
    b, h, w, c = x.shape
    kk = k * k
    cout = weight.shape[-1]
    pad = k // 2
    r = int(math.ceil(max_offset))
    margin = pad + r + 1  # tap reach + offset bound + bilinear corner

    offset = jnp.clip(offset.astype(jnp.float32), -max_offset, max_offset)
    offset = offset.reshape(b, h, w, kk, 2)
    mask = mask.astype(jnp.float32).reshape(b, h, w, kk)

    xp = jnp.pad(x, ((0, 0), (margin, margin), (margin, margin), (0, 0)))
    shifts = range(-r, r + 2)  # integer corner positions around each tap
    out = jnp.zeros((b, h, w, cout), jnp.float32)
    for t in range(kk):
        ky, kx = divmod(t, k)
        dy = offset[..., t, 0]  # (B,H,W) fractional offsets
        dx = offset[..., t, 1]
        sampled = jnp.zeros((b, h, w, c), jnp.float32)
        for u in shifts:
            wy = jnp.clip(1.0 - jnp.abs(dy - u), 0.0, None)  # hat weight (B,H,W)
            ys = margin + (ky - pad) + u
            for v in shifts:
                wx = jnp.clip(1.0 - jnp.abs(dx - v), 0.0, None)
                w_uv = wy * wx
                xs = margin + (kx - pad) + v
                window = jax.lax.dynamic_slice(xp, (0, ys, xs, 0), (b, h, w, c))
                sampled = sampled + w_uv[..., None] * window.astype(jnp.float32)
        sampled = sampled * mask[..., t : t + 1]
        out = out + jnp.einsum("bhwc,co->bhwo", sampled.astype(x.dtype),
                               weight[ky, kx], preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def modulated_deform_conv2d(x, offset, mask, weight, bias=None, k: int = 3):
    """DCNv2 forward. x (B,H,W,C), offset (B,H,W,2*k*k), mask (B,H,W,k*k),
    weight (k,k,C,Cout) HWIO, stride 1, padding k//2.

    TPU strategy: all k*k taps are sampled in ONE batched bilinear gather
    (indices for the 4 corners of every tap computed together), masked, then
    contracted in a single (HW, k*k*C) x (k*k*C, Cout) matmul — one large
    MXU op instead of k*k small ones. fp32 sampling arithmetic, compute-dtype
    matmul, matching the reference's AMP behavior.

    Returns (B, H, W, Cout) in x.dtype.
    """
    b, h, w, c = x.shape
    kk = k * k
    cout = weight.shape[-1]
    pad = k // 2
    x_flat = x.reshape(b, h * w, c)

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    base_y = jnp.broadcast_to(gy, (h, w)).reshape(1, h * w, 1)
    base_x = jnp.broadcast_to(gx, (h, w)).reshape(1, h * w, 1)
    tap_dy = jnp.asarray([t // k - pad for t in range(kk)], jnp.float32)[None, None, :]
    tap_dx = jnp.asarray([t % k - pad for t in range(kk)], jnp.float32)[None, None, :]

    offset = offset.astype(jnp.float32).reshape(b, h * w, kk, 2)
    cy = (base_y + tap_dy + offset[..., 0]).reshape(b, h * w * kk)  # (B, HW*KK)
    cx = (base_x + tap_dx + offset[..., 1]).reshape(b, h * w * kk)

    sampled = _bilinear_sample(x_flat, cy, cx, h, w)  # (B, HW*KK, C)
    sampled = sampled * mask.reshape(b, h * w * kk, 1).astype(sampled.dtype)
    sampled = sampled.reshape(b, h * w, kk * c)
    w_mat = weight.reshape(kk * c, cout)
    out = jnp.einsum("bnk,ko->bno", sampled, w_mat, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(b, h, w, cout).astype(x.dtype)
