"""Dynamic Snake Convolution (DSCN) sampling — TPU-native equivalent of the
reference's one first-party CUDA extension.

Parity surface: reference ultralytics/nn/modules/ops_dscn/ — the
InternImage-derived ``dscn_im2col_cuda.cuh`` kernel (im2col body at
:243-310, linear interpolation at :28-96) driven by
``DSCNFunction.apply`` (functions/dscn_func.py). Semantics, decoded from
the CUDA source:

- The kernel is one-dimensional: 1 x K taps along x (``on_x=True``,
  DSCNX) or K x 1 along y (DSCNY).
- Each tap carries ONE learned fractional offset along the SAME axis
  (the "snake"): ``loc = p0 + (i * dilation + offset[g, i]) * scale``
  with ``p0 = coord * stride + ((dilation * (K - 1)) >> 1) - pad
  - ((dilation * (K - 1)) >> 1) * scale``.
- Sampling is LINEAR interpolation along that axis only (the fixed axis
  stays integral), zero outside the border, and a whole sample is
  dropped when its fixed-axis coordinate is out of range.
- Tap values are SUMMED unweighted per (group, channel) — unlike DCNv3
  there is no modulation and no per-tap weight (the fork stripped them;
  ``data_weight_ptr`` in the CUDA loop is advanced but never read).

On TPU this is a pair of ``take_along_axis`` gathers per tap along one
axis — XLA lowers them to dynamic-slice-free one-hot matmuls or vector
gathers; the op sits on the reference's dead path (dsan.py -> tasks1.py),
so peak throughput is not a goal, exactness is.
"""

from __future__ import annotations

import jax.numpy as jnp


def dscn_sample(x, offset, kernel_size: int, axis: str, stride: int = 1,
                pad: int | None = None, dilation: int = 1, group: int = 1,
                offset_scale: float = 1.0, remove_center: bool = False):
    """Snake-sampled tap sum. x (B, H, W, C) NHWC, offset
    (B, Ho, Wo, group*K) in tap-major order; returns (B, Ho, Wo, C).

    ``axis`` is "x" (taps/offsets along width, reference on_x=True) or "y".
    """
    if pad is None:
        pad = (dilation * (kernel_size - 1)) // 2
    b, h, w, c = x.shape
    cg = c // group
    ktotal = kernel_size - int(remove_center)
    center = kernel_size // 2

    along_w = axis == "x"
    size = w if along_w else h
    # (B, Ho, Wo, G, K)
    off = offset.reshape(offset.shape[:3] + (group, ktotal)).astype(jnp.float32)
    ho, wo = off.shape[1], off.shape[2]

    half = (dilation * (kernel_size - 1)) // 2
    coord = (jnp.arange(wo if along_w else ho, dtype=jnp.float32) * stride
             + half - pad - half * offset_scale)
    if along_w:
        base = coord[None, None, :, None]          # (1, 1, Wo, 1)
    else:
        base = coord[None, :, None, None]          # (1, Ho, 1, 1)

    # move the sampled axis last: (B, fixed, G, Cg, size)
    x5 = x.reshape(b, h, w, group, cg)
    if along_w:
        xs = x5.transpose(0, 1, 3, 4, 2)           # (B, H, G, Cg, W)
    else:
        xs = x5.transpose(0, 2, 3, 4, 1)           # (B, W, G, Cg, H)

    out = jnp.zeros((b, ho, wo, group, cg), jnp.float32)
    ki = 0
    for i in range(kernel_size):
        if remove_center and i == center:
            continue
        loc = base + (i * dilation + off[..., ki]) * offset_scale  # (B,Ho,Wo,G)
        ki += 1
        lo = jnp.floor(loc)
        frac = loc - lo
        valid = (loc > -1.0) & (loc < size)  # the caller-level drop guard
        lo_i = lo.astype(jnp.int32)

        def fetch(idx):
            ok = (idx >= 0) & (idx <= size - 1)
            idxc = jnp.clip(idx, 0, size - 1)
            if along_w:
                # idx (B,Ho,Wo,G) -> (B,Ho,G,1,Wo) against xs (B,H,G,Cg,W)
                ind = idxc.transpose(0, 1, 3, 2)[:, :, :, None, :]
                v = jnp.take_along_axis(
                    xs.astype(jnp.float32),
                    jnp.broadcast_to(ind, (b, ho, group, cg, wo)), axis=-1)
                v = v.transpose(0, 1, 4, 2, 3)      # (B,Ho,Wo,G,Cg)
                okb = ok[..., None]
            else:
                ind = idxc.transpose(0, 2, 3, 1)[:, :, :, None, :]
                v = jnp.take_along_axis(
                    xs.astype(jnp.float32),
                    jnp.broadcast_to(ind, (b, wo, group, cg, ho)), axis=-1)
                v = v.transpose(0, 4, 1, 2, 3)
                okb = ok[..., None]
            return v * okb

        v_lo = fetch(lo_i)
        v_hi = fetch(lo_i + 1)
        tap = v_lo * (1.0 - frac[..., None]) + v_hi * frac[..., None]
        out = out + tap * valid[..., None].astype(jnp.float32)

    return out.reshape(b, ho, wo, c).astype(x.dtype)
