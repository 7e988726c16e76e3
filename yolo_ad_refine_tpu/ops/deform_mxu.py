"""MXU-separable Pallas kernel for modulated deformable convolution (DCNv2).

Third-generation TPU implementation of the op behind the reference's
``mmcv.ops.ModulatedDeformConv2d`` (reference head.py:751-782). History:

- ops/deform.py      — exact XLA gather: index-rate-bound (39 ms of the 68 ms
                       bs32 flagship forward), scatter-adjoint unusable.
- ops/deform_pallas.py — bounded-window hat-weight kernel: fixed training
                       (5.5 s -> 285 ms steps) but is VPU-instruction-bound:
                       9 taps x 81 window shifts of (CH, W, C) mul-adds at
                       C=64 of 128 lanes.
- THIS FILE          — the separable reformulation that moves the O(window)
                       work onto the MXU:

    sampled_t(p) = sum_d  hat_y(p, d) * [ Wx_t(p, :) @ X_row(d) ]

  For each tap the x-direction bilinear weights form a banded matrix
  Wx_t (P, Wp) built in one shot from broadcasted iotas (a few VPU ops over
  P*Wp elements — NOT per-window-shift work); the x-interpolation of every
  window row is then a (P, Wp) @ (Wp, C) matmul on the MXU, and only the
  y-direction combine (D ~= CH+8 fused multiply-adds of (P, C)) remains on
  the VPU. Per output pixel the VPU work drops from ~9*81*2 flops/channel to
  ~(CH+8)/CH*2, an order of magnitude, and the remaining flops ride the MXU.

  The custom VJP uses the same structure — every gradient is a matmul:
      dX_row(d)  += Wx_t^T @ (hat_y(:, d) * g_sampled)      (MXU)
      dWx_t      += sum_d (hat_y(:, d) * g_sampled) @ X_row(d)^T  (MXU)
      dW_t        = (m_t * S_t)^T @ g                        (MXU)
  so there is no gather, no scatter, and no per-(dy,dx) strip read-modify-
  write anywhere (the previous backward spent 181 of 285 ms there).

Semantics: exactly bilinear sampling with mmcv zero-outside padding whenever
|offset| <= radius; offsets are clipped to +/-radius first (making the
window static). Same contract as ops/deform_pallas.py; agreement with the
exact gather is asserted in tests/test_dcn_mxu.py.

Layouts: x (B, H, W, C) NHWC, offset (B, H, W, 2*9) (dy, dx) pairs in
row-major tap order, mask (B, H, W, 9) post-sigmoid, weight (3, 3, C, Cout)
HWIO. Stride 1 / pad 1 / dilation 1 (the AYHead configuration).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

K = 3           # kernel size (3x3, the AYHead configuration)
KK = K * K
# output rows per chunk; window rows per tap = CH + 2r + 2, so larger chunks
# amortize the y-window overlap ((CH+8)/CH matmuls per output row at r=3)
# at the cost of more VMEM per temporary. 8 and 16 both fit the flagship.
CH = int(os.environ.get("YAT_MXU_CH", "8"))
# Mosaic IR size vs schedule quality: fully unrolling the window-row loop
# lets Mosaic software-pipeline the matmuls (P3 fwd 8.9 vs 14.5 ms) at the
# price of a long one-time compile (cached on disk afterwards). Mosaic
# supports only full or no unroll for fori_loop; the backward's IR is ~4x
# the forward's but unrolling it is worth ~3x wall-clock (P3 fwd+bwd
# 31.95 ms unrolled; the rolled variant regressed the full train step to
# 377 ms). YAT_MXU_UNROLL_BWD=0 opts back into the fast-compile variant.
UNROLL_FWD = True
UNROLL_BWD = os.environ.get("YAT_MXU_UNROLL_BWD", "1") == "1"


def _hat(u):
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


def _dhat(u):
    """d hat(u) / du: -sign(u) on the open support, 0 outside."""
    return jnp.where(jnp.abs(u) < 1.0, -jnp.sign(u), 0.0)


def _tap_geometry(radius):
    """Window sizes shared by forward and backward."""
    s = radius + 2                 # pad margin: tap reach 1 + radius + corner
    d_win = CH + 2 * radius + 2    # window rows covering a CH-row chunk
    return s, d_win


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(xs_ref, off_ref, mask_ref, w_ref, out_ref, *, hc, w, s,
                radius, cout, ch):
    """One batch image. xs (1, Hc+2s, W+2s, C), off (1, Hc, W, 18) f32,
    mask (1, Hc, W, 9) f32, w (KK*C, Cout), out (1, Hc, W, Cout)."""
    c = xs_ref.shape[-1]
    wp = w + 2 * s
    d_win = ch + 2 * radius + 2
    p = ch * w

    # iotas are loop-invariant: build once
    x_of_p = jax.lax.broadcasted_iota(jnp.int32, (ch, w, wp), 1).astype(jnp.float32)
    j_of_p = jax.lax.broadcasted_iota(jnp.int32, (ch, w, wp), 2).astype(jnp.float32)
    y_of_p = jax.lax.broadcasted_iota(jnp.int32, (ch, w), 0).astype(jnp.float32)

    def chunk_body(ci, _):
        y0 = ci * ch
        off = off_ref[0, pl.ds(y0, ch), :, :]                 # (CH, W, 18)
        msk = mask_ref[0, pl.ds(y0, ch), :, :]                # (CH, W, 9)
        acc_out = jnp.zeros((p, cout), jnp.float32)
        for t in range(KK):
            ty, tx = t // K - 1, t % K - 1
            offy = off[:, :, 2 * t]                           # (CH, W)
            offx = off[:, :, 2 * t + 1]
            m = msk[:, :, t].reshape(p, 1)

            # x-direction bilinear weights as one banded matrix (P, Wp):
            # Wx[p, j] = hat(offx + tx + x(p) + s - j)
            wx = _hat(offx[..., None] + (tx + s) + x_of_p - j_of_p)
            wx = wx.reshape(p, wp)

            # a_y(p) = offy + y(p) + r + 1; wy_d = hat(a_y - d)
            ay = offy + y_of_p + float(radius + 1)            # (CH, W)

            # window rows for this tap start at padded row y0 + ty + 1.
            # bf16 inputs keep the MXU at full bf16 rate (f32 accumulate);
            # the only extra quantization vs f32 is on the hat weights.
            base = y0 + ty + (s - radius - 1)
            wxm = wx.astype(xs_ref.dtype)

            def d_body(d, sacc, *, base=base, wxm=wxm, ay=ay):
                x_row = xs_ref[0, base + d, :, :]
                u_d = jax.lax.dot_general(
                    wxm, x_row,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                             # (P, C)
                wy_d = _hat(ay - d.astype(jnp.float32)).reshape(p, 1)
                return sacc + wy_d * u_d

            sacc = jax.lax.fori_loop(0, d_win, d_body,
                                     jnp.zeros((p, c), jnp.float32),
                                     unroll=UNROLL_FWD)
            sampled = (sacc * m).astype(w_ref.dtype)
            acc_out = acc_out + jax.lax.dot_general(
                sampled, w_ref[t * c : (t + 1) * c, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, pl.ds(y0, ch), :, :] = acc_out.reshape(ch, w, cout).astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hc // ch, chunk_body, 0, unroll=False)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(xs_ref, off_ref, mask_ref, w_ref, g_ref,
                dxs_ref, doff_ref, dmask_ref, dw_ref, *, hc, w, s,
                radius, cout, ch):
    """Gradients for one image, same separable structure — all heavy terms
    are matmuls. g (1, Hc, W, Cout) f32 upstream. Outputs: dxs
    (1, Hc+2s, W+2s, C) f32, doff (1, Hc, W, 18) f32, dmask (1, Hc, W, 9)
    f32, dw (1, KK*C, Cout) f32."""
    c = xs_ref.shape[-1]
    wp = w + 2 * s
    d_win = ch + 2 * radius + 2
    p = ch * w

    dxs_ref[0, :, :, :] = jnp.zeros(
        (xs_ref.shape[1], xs_ref.shape[2], c), jnp.float32)
    dw_ref[0, :, :] = jnp.zeros((KK * c, cout), jnp.float32)

    x_of_p = jax.lax.broadcasted_iota(jnp.int32, (ch, w, wp), 1).astype(jnp.float32)
    j_of_p = jax.lax.broadcasted_iota(jnp.int32, (ch, w, wp), 2).astype(jnp.float32)
    y_of_p = jax.lax.broadcasted_iota(jnp.int32, (ch, w), 0).astype(jnp.float32)

    def chunk_body(ci, _):
        y0 = ci * ch
        off = off_ref[0, pl.ds(y0, ch), :, :]
        msk = mask_ref[0, pl.ds(y0, ch), :, :]
        gflat = g_ref[0, pl.ds(y0, ch), :, :].reshape(p, cout)
        doff_cols = []
        dmask_cols = []
        for t in range(KK):
            ty, tx = t // K - 1, t % K - 1
            offy = off[:, :, 2 * t]
            offx = off[:, :, 2 * t + 1]
            m = msk[:, :, t].reshape(p, 1)

            ux = offx[..., None] + (tx + s) + x_of_p - j_of_p
            wx = _hat(ux).reshape(p, wp)
            dwx_du = _dhat(ux).reshape(p, wp)
            ay = offy + y_of_p + float(radius + 1)

            # g_sampled = g @ W_t^T, modulated
            gs = jax.lax.dot_general(
                gflat, w_ref[t * c : (t + 1) * c, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # (P, C)
            gsm = gs * m

            base = y0 + ty + (s - radius - 1)

            def d_body(d, carry, *, base=base, wx=wx, ay=ay, gsm=gsm):
                sacc, doffy, dwx_acc = carry
                x_row = xs_ref[0, base + d, :, :].astype(jnp.float32)
                u_d = jax.lax.dot_general(
                    wx, x_row,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                             # (P, C)
                a_d = ay - d.astype(jnp.float32)
                wy_d = _hat(a_d).reshape(p, 1)
                sacc = sacc + wy_d * u_d
                # doffy via dwy: dwy_d = sum_c u_d * gsm
                doffy = doffy + _dhat(a_d).reshape(p, 1) * jnp.sum(
                    u_d * gsm, axis=-1, keepdims=True)
                # dX_row(d) += Wx^T @ (wy_d * gsm)
                gw = wy_d * gsm                               # (P, C)
                dxs_ref[0, base + d, :, :] += jax.lax.dot_general(
                    wx, gw,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                             # (Wp, C)
                # dWx += (wy_d * gsm) @ X_row(d)^T
                dwx_acc = dwx_acc + jax.lax.dot_general(
                    gw, x_row,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                             # (P, Wp)
                return sacc, doffy, dwx_acc

            sacc, doffy, dwx_acc = jax.lax.fori_loop(
                0, d_win, d_body,
                (jnp.zeros((p, c), jnp.float32),
                 jnp.zeros((p, 1), jnp.float32),
                 jnp.zeros((p, wp), jnp.float32)), unroll=UNROLL_BWD)
            doffx = jnp.sum(dwx_acc * dwx_du, axis=-1, keepdims=True)
            dmask_cols.append(jnp.sum(gs * sacc, axis=-1, keepdims=True)
                              .reshape(ch, w, 1))
            doff_cols.append(doffy.reshape(ch, w, 1))
            doff_cols.append(doffx.reshape(ch, w, 1))
            # dW_t = (m * S_t)^T @ g
            sampled = sacc * m
            dw_ref[0, t * c : (t + 1) * c, :] += jax.lax.dot_general(
                sampled, gflat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        interleaved = []
        for t in range(KK):
            interleaved += [doff_cols[2 * t], doff_cols[2 * t + 1]]
        doff_ref[0, pl.ds(y0, ch), :, :] = jnp.concatenate(interleaved, -1)
        dmask_ref[0, pl.ds(y0, ch), :, :] = jnp.concatenate(
            [col for col in dmask_cols], -1)
        return 0

    jax.lax.fori_loop(0, hc // ch, chunk_body, 0, unroll=False)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _prep(x, offset, mask, radius, ch):
    """Pad to the chunked layout. Returns (xs, offp, maskp, (s, hc))."""
    b, h, w, c = x.shape
    s = radius + 2
    hc = -(-h // ch) * ch
    xs = jnp.pad(x, ((0, 0), (s, s + (hc - h)), (s, s), (0, 0)))
    offp = jnp.pad(offset.astype(jnp.float32),
                   ((0, 0), (0, hc - h), (0, 0), (0, 0)))
    maskp = jnp.pad(mask.astype(jnp.float32),
                    ((0, 0), (0, hc - h), (0, 0), (0, 0)))
    return xs, offp, maskp, (s, hc)


_INTERPRET = False  # flipped by tests on CPU


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def modulated_deform_conv2d_mxu(x, offset, mask, weight, radius: int = 3):
    """Modulated deformable conv 3x3, stride 1, pad 1 — MXU-separable kernel.

    Exact bilinear/zero-pad semantics for |offset| <= radius; offsets are
    clipped to +/-radius. x (B,H,W,C) bf16/f32, offset (B,H,W,18),
    mask (B,H,W,9), weight (3,3,C,Cout).
    """
    out, _ = _fwd_impl(x, offset, mask, weight, radius)
    return out


def _fwd_impl(x, offset, mask, weight, radius):
    b, h, w, c = x.shape
    cout = weight.shape[-1]
    offset = jnp.clip(offset, -float(radius), float(radius))
    xs, offp, maskp, (s, hc) = _prep(x, offset, mask, radius, CH)
    wflat = weight.reshape(KK * c, cout).astype(jnp.float32)

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
            flops=2 * b * hc * w * KK * (
                (CH + 2 * radius + 2) * (w + 2 * s) * c // CH + c * cout),
            bytes_accessed=4 * b * hc * w * (KK * 3 + 2 * c + cout),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
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
    xs, offp, maskp, (s, hc) = _prep(x, offset, mask, radius, CH)
    wflat = weight.reshape(KK * c, cout).astype(jnp.float32)
    gpad = jnp.pad(gout.astype(jnp.float32),
                   ((0, 0), (0, hc - h), (0, 0), (0, 0)))

    kernel = partial(_bwd_kernel, hc=hc, w=w, s=s, radius=radius, cout=cout,
                     ch=CH)
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
        # the fully-unrolled window loop keeps ~d_win iterations of (P, Wp)
        # temporaries live; 100M is 6M short at P3 (v5e VMEM is 128M/core)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024,
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


modulated_deform_conv2d_mxu.defvjp(_fwd_rule, _bwd_rule)
