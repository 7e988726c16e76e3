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

import jax.numpy as jnp


def _bilinear_sample(x_flat, coords_y, coords_x, h: int, w: int):
    """Bilinearly sample x_flat (B, H*W, C) at float coords (B, Ho*Wo).

    Out-of-bounds samples contribute zero (mmcv zero-padding convention:
    a corner contributes iff it lies inside the feature map).
    """
    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    ly = coords_y - y0
    lx = coords_x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        g = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
        return g * valid[..., None].astype(x_flat.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = lambda a, b: (a[..., None] * b[..., None]).astype(x_flat.dtype)  # noqa: E731
    return v00 * wy(hy, hx) + v01 * wy(hy, lx) + v10 * wy(ly, hx) + v11 * wy(ly, lx)


def modulated_deform_conv2d(x, offset, mask, weight, bias=None, k: int = 3):
    """DCNv2 forward. x (B,H,W,C), offset (B,H,W,2*k*k), mask (B,H,W,k*k),
    weight (k,k,C,Cout) HWIO, stride 1, padding k//2.

    Returns (B, H, W, Cout) in x.dtype with float32 accumulation.
    """
    b, h, w, c = x.shape
    cout = weight.shape[-1]
    pad = k // 2
    x_flat = x.reshape(b, h * w, c)

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    base_y = jnp.broadcast_to(gy, (h, w)).reshape(1, h * w)
    base_x = jnp.broadcast_to(gx, (h, w)).reshape(1, h * w)

    offset = offset.astype(jnp.float32).reshape(b, h * w, k * k, 2)
    mask = mask.astype(jnp.float32).reshape(b, h * w, k * k)

    out = jnp.zeros((b, h * w, cout), dtype=jnp.float32)
    for t in range(k * k):
        ky, kx = divmod(t, k)
        cy = base_y + (ky - pad) + offset[:, :, t, 0]
        cx = base_x + (kx - pad) + offset[:, :, t, 1]
        sampled = _bilinear_sample(x_flat, cy, cx, h, w)  # (B, HW, C)
        sampled = sampled * mask[:, :, t : t + 1].astype(sampled.dtype)
        out = out + jnp.einsum(
            "bnc,co->bno", sampled, weight[ky, kx], preferred_element_type=jnp.float32
        )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(b, h, w, cout).astype(x.dtype)
