"""Pallas TPU kernel for modulated deformable convolution (DCNv2).

Replaces the reference's mmcv CUDA kernel (reference head.py:749-782
``ModulatedDeformConv2d``) on the hot path. The XLA gather formulation
(ops/deform.py) is exact but index-rate-bound: measured 39 ms/bs32 across the
flagship's three levels (chained-executable timing, benchmarks/bench_dcn.py)
— 60% of total inference time. This kernel reformulates the bilinear sample
as a *bounded-window hat-weight accumulation* that never gathers:

    sampled_t(p) = sum_{dy,dx in window} hat(off_y + ty - dy) *
                   hat(off_x + tx - dx) * x[p + (dy, dx)]

with hat(u) = max(0, 1 - |u|). For |offset| <= radius this is EXACTLY
bilinear interpolation with zero-outside padding (mmcv semantics); offsets
are clipped to ±radius beforehand, making the sampling window static.

Kernel geometry (found the hard way — see git history):
- one grid program per batch image; the padded feature map lives in VMEM;
- the image is processed in chunks of CH rows via a fori_loop whose only
  dynamic slice is on the MAJOR (row) axis — cheap address arithmetic.
  Dynamic slices on the sublane axis lower to a scalar path (hang), and a
  fully-unrolled flat-pixel formulation blows the Mosaic VMEM stack
  (~170 live (NP, C) temporaries);
- within a chunk every window shift is a static 2D slice; the hat-weighted
  accumulation runs on the VPU and each tap's (CH*W, C) x (C, Cout)
  contraction runs on the MXU.

The custom VJP recomputes the window sums (cheaper than materializing nine
sampled maps) and produces dx/doffset/dmask/dweight with the same
static-window structure.

Layouts: x (B, H, W, C) NHWC, offset (B, H, W, 2*9) as (dy, dx) pairs in
row-major tap order, mask (B, H, W, 9) post-sigmoid, weight (3, 3, C, Cout)
HWIO. Stride 1 / pad 1 / dilation 1 (the AYHead configuration).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 3           # kernel size (3x3, the AYHead configuration)
KK = K * K
CH = 8          # output rows per chunk (forward)
CH_BWD = 4      # backward: halved — the 9-tap unroll's live temporaries
                # scale with the chunk and overflow VMEM at CH=8/P3


def _hat(u):
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


def _dhat(u):
    """d hat(u) / du: -sign(u) on the open support, 0 outside."""
    return jnp.where(jnp.abs(u) < 1.0, -jnp.sign(u), 0.0)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(xs_ref, off_ref, mask_ref, w_ref, out_ref, *, hc, w, s,
                radius, cout, ch):
    """One batch image. xs (1, Hc+2S, W+2S, C), off (1, Hc, W, 18) f32,
    mask (1, Hc, W, 9) f32, w (KK*C, Cout), out (1, Hc, W, Cout) f32."""
    c = xs_ref.shape[-1]

    def chunk_body(ci, _):
        y0 = ci * ch
        off = off_ref[0, pl.ds(y0, ch), :, :]                 # (CH, W, 18)
        msk = mask_ref[0, pl.ds(y0, ch), :, :]                # (CH, W, 9)
        acc_out = jnp.zeros((ch * w, cout), jnp.float32)
        for t in range(KK):
            ty, tx = t // K - 1, t % K - 1
            offy = off[:, :, 2 * t][..., None]                # (CH, W, 1)
            offx = off[:, :, 2 * t + 1][..., None]
            m = msk[:, :, t][..., None]

            # fori over dy (dynamic-major slice, cheap) with dx statically
            # unrolled (sublane slices must be static): a fully unrolled
            # 81-step body makes Mosaic hold every temporary live on the
            # VMEM stack (~90 MB at trivial shapes)
            def dy_body(j, acc, *, ty=ty, tx=tx, offy=offy, offx=offx):
                dy = ty - radius - 1 + j
                wy = _hat(offy + (ty - dy).astype(jnp.float32))
                # strip read straight off the VMEM ref: Mosaic has no
                # dynamic_slice lowering for values, and ref reads with a
                # dynamic major start are cheap
                src_dy = xs_ref[0, pl.ds(y0 + s + dy, ch), :, :].astype(
                    jnp.float32)  # one cast per dy, not one per dx slice
                row = jnp.zeros((ch, w, c), jnp.float32)
                for dx in range(tx - radius - 1, tx + radius + 2):
                    sl = src_dy[:, s + dx : s + dx + w, :]
                    row = row + _hat(offx + float(tx - dx)) * sl
                return acc + wy * row

            acc = jax.lax.fori_loop(0, 2 * radius + 3, dy_body,
                                    jnp.zeros((ch, w, c), jnp.float32))
            sampled = (acc * m).reshape(ch * w, c).astype(w_ref.dtype)
            acc_out = acc_out + jax.lax.dot_general(
                sampled, w_ref[t * c : (t + 1) * c, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, pl.ds(y0, ch), :, :] = acc_out.reshape(ch, w, cout).astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hc // ch, chunk_body, 0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(xs_ref, off_ref, mask_ref, w_ref, g_ref,
                dxs_ref, doff_ref, dmask_ref, dw_ref, *, hc, w, s,
                radius, cout, ch):
    """Gradients for one image. g (1, Hc, W, Cout) f32 upstream. Outputs:
    dxs (1, Hc+2S, W+2S, C) f32, doff (1, Hc, W, 18) f32,
    dmask (1, Hc, W, 9) f32, dw (1, KK*C, Cout) f32."""
    c = xs_ref.shape[-1]
    dxs_ref[0, :, :, :] = jnp.zeros(
        (xs_ref.shape[1], xs_ref.shape[2], c), jnp.float32
    )
    dw_ref[0, :, :] = jnp.zeros((KK * c, cout), jnp.float32)

    def chunk_body(ci, _):
        y0 = ci * ch
        off = off_ref[0, pl.ds(y0, ch), :, :]
        msk = mask_ref[0, pl.ds(y0, ch), :, :]
        gout = g_ref[0, pl.ds(y0, ch), :, :]                  # (CH, W, Cout)
        gflat = gout.reshape(ch * w, cout)
        doff_cols = []
        dmask_cols = []
        for t in range(KK):
            ty, tx = t // K - 1, t % K - 1
            offy = off[:, :, 2 * t][..., None]
            offx = off[:, :, 2 * t + 1][..., None]
            m = msk[:, :, t][..., None]
            # g_sampled = g @ W_t^T  (CH, W, C)
            gs = jax.lax.dot_general(
                gflat, w_ref[t * c : (t + 1) * c, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(ch, w, c)
            gsm = gs * m

            def dy_body(j, carry, *, ty=ty, tx=tx, offy=offy, offx=offx,
                        gsm=gsm):
                acc_sampled, doffy, doffx = carry
                dy = ty - radius - 1 + j
                uy = offy + (ty - dy).astype(jnp.float32)
                wy, dwy = _hat(uy), _dhat(uy)
                src_dy = xs_ref[0, pl.ds(y0 + s + dy, ch), :, :].astype(
                    jnp.float32)  # one cast per dy, not one per dx slice
                strip_segs = []  # per-dx width-offset pieces of the dx strip
                for dx in range(tx - radius - 1, tx + radius + 2):
                    ux = offx + float(tx - dx)
                    wx, dwx = _hat(ux), _dhat(ux)
                    sl = src_dy[:, s + dx : s + dx + w, :]
                    acc_sampled = acc_sampled + (wy * wx) * sl
                    cdot = jnp.sum(gsm * sl, axis=-1, keepdims=True)
                    doffy = doffy + dwy * wx * cdot
                    doffx = doffx + wy * dwx * cdot
                    strip_segs.append((dx, (wy * wx) * gsm))
                # transpose of the shifted reads: ONE width-padded strip
                # accumulated in registers, ONE ref RMW per (tap, dy) — a
                # per-(dy, dx) ref RMW was 81 read-modify-writes per tap
                # per chunk and dominated the backward (250 ms/bs32)
                wp_ = w + 2 * s
                strip = jnp.zeros((ch, wp_, c), jnp.float32)
                for dx, piece in strip_segs:
                    segs = []
                    if s + dx > 0:
                        segs.append(jnp.zeros((ch, s + dx, c), jnp.float32))
                    segs.append(piece)
                    if wp_ - (s + dx) - w > 0:
                        segs.append(jnp.zeros((ch, wp_ - (s + dx) - w, c),
                                              jnp.float32))
                    strip = strip + jnp.concatenate(segs, 1)
                dxs_ref[0, pl.ds(y0 + s + dy, ch), :, :] += strip
                return acc_sampled, doffy, doffx

            acc_sampled, doffy, doffx = jax.lax.fori_loop(
                0, 2 * radius + 3, dy_body,
                (jnp.zeros((ch, w, c), jnp.float32),
                 jnp.zeros((ch, w, 1), jnp.float32),
                 jnp.zeros((ch, w, 1), jnp.float32)),
            )
            dmask_cols.append(jnp.sum(gs * acc_sampled, axis=-1, keepdims=True))
            doff_cols.append(doffy)
            doff_cols.append(doffx)
            # dW_t = sampled^T @ g  (C, Cout)
            sampled = (acc_sampled * m).reshape(ch * w, c)
            dw_ref[0, t * c : (t + 1) * c, :] += jax.lax.dot_general(
                sampled, gflat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        interleaved = []
        for t in range(KK):
            interleaved += [doff_cols[2 * t], doff_cols[2 * t + 1]]
        doff_ref[0, pl.ds(y0, ch), :, :] = jnp.concatenate(interleaved, -1)
        dmask_ref[0, pl.ds(y0, ch), :, :] = jnp.concatenate(dmask_cols, -1)
        return 0

    jax.lax.fori_loop(0, hc // ch, chunk_body, 0)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _prep(x, offset, mask, radius, ch):
    """Pad to the chunked layout. Returns (xs, offp, maskp, dims)."""
    b, h, w, c = x.shape
    s = radius + 2                      # max window reach
    hc = -(-h // ch) * ch               # rows padded to a chunk multiple
    xs = jnp.pad(x, ((0, 0), (s, s + (hc - h)), (s, s), (0, 0)))
    offp = jnp.pad(offset.astype(jnp.float32),
                   ((0, 0), (0, hc - h), (0, 0), (0, 0)))
    maskp = jnp.pad(mask.astype(jnp.float32),
                    ((0, 0), (0, hc - h), (0, 0), (0, 0)))
    return xs, offp, maskp, (s, hc)


_INTERPRET = False  # flipped by tests on CPU


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def modulated_deform_conv2d_pallas(x, offset, mask, weight, radius: int = 3):
    """Modulated deformable conv 3x3, stride 1, pad 1 — Pallas TPU kernel.

    Exact bilinear/zero-pad semantics for |offset| <= radius; offsets are
    clipped to ±radius (the trained regime of the alignment head — monitor
    jnp.abs(offset).max() to validate the bound). x (B,H,W,C) bf16/f32,
    offset (B,H,W,18), mask (B,H,W,9), weight (3,3,C,Cout).
    """
    out, _ = _fwd_impl(x, offset, mask, weight, radius)
    return out


def _fwd_impl(x, offset, mask, weight, radius):
    b, h, w, c = x.shape
    cout = weight.shape[-1]
    offset = jnp.clip(offset, -float(radius), float(radius))
    xs, offp, maskp, (s, hc) = _prep(x, offset, mask, radius, CH)
    wflat = weight.reshape(KK * c, cout).astype(x.dtype)

    kernel = partial(_fwd_kernel, hc=hc, w=w, s=s, radius=radius, cout=cout,
                     ch=CH)
    spec = lambda *shape: pl.BlockSpec((1, *shape), lambda i: (i,) + (0,) * len(shape),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    out_p = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            spec(hc + 2 * s, w + 2 * s, c),
            spec(hc, w, 2 * KK),
            spec(hc, w, KK),
            pl.BlockSpec((KK * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec(hc, w, cout),
        out_shape=jax.ShapeDtypeStruct((b, hc, w, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hc * w * c * (KK * cout + KK * (2 * radius + 3) ** 2),
            bytes_accessed=b * hc * w * c * 2 * (2 * radius + 3) ** 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xs, offp, maskp, wflat)

    out = out_p[:, :h, :, :]
    return out.astype(x.dtype), (x, offset, mask, weight)


def _fwd_rule(x, offset, mask, weight, radius):
    out, res = _fwd_impl(x, offset, mask, weight, radius)
    return out, res


def _bwd_rule(radius, res, gout):
    x, offset, mask, weight = res        # offset here is already clipped
    b, h, w, c = x.shape
    cout = weight.shape[-1]
    xs, offp, maskp, (s, hc) = _prep(x, offset, mask, radius, CH_BWD)
    wflat = weight.reshape(KK * c, cout).astype(jnp.float32)
    gpad = jnp.pad(gout.astype(jnp.float32), ((0, 0), (0, hc - h), (0, 0), (0, 0)))

    kernel = partial(_bwd_kernel, hc=hc, w=w, s=s, radius=radius, cout=cout,
                     ch=CH_BWD)
    spec = lambda *shape: pl.BlockSpec((1, *shape), lambda i: (i,) + (0,) * len(shape),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    dxs, doffp, dmaskp, dw_b = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            spec(hc + 2 * s, w + 2 * s, c),
            spec(hc, w, 2 * KK),
            spec(hc, w, KK),
            pl.BlockSpec((KK * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            spec(hc, w, cout),
        ],
        out_specs=[
            spec(hc + 2 * s, w + 2 * s, c),
            spec(hc, w, 2 * KK),
            spec(hc, w, KK),
            spec(KK * c, cout),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hc + 2 * s, w + 2 * s, c), jnp.float32),
            jax.ShapeDtypeStruct((b, hc, w, 2 * KK), jnp.float32),
            jax.ShapeDtypeStruct((b, hc, w, KK), jnp.float32),
            jax.ShapeDtypeStruct((b, KK * c, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xs, offp, maskp, wflat, gpad)

    dx = dxs[:, s : s + h, s : s + w, :].astype(x.dtype)
    doff = doffp[:, :h, :, :]
    # clip VJP: zero where the forward clipped (offset is the clipped value)
    inb = (jnp.abs(offset) < float(radius)).astype(doff.dtype)
    doff = (doff * inb).astype(offset.dtype)
    dmask = dmaskp[:, :h, :, :].astype(mask.dtype)
    dweight = dw_b.sum(0).reshape(K, K, c, cout).astype(weight.dtype)
    return dx, doff, dmask, dweight


modulated_deform_conv2d_pallas.defvjp(_fwd_rule, _bwd_rule)
