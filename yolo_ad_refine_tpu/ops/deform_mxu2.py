"""x-tiled fused-bilinear MXU kernel for modulated deformable conv (DCNv2).

Fourth-generation TPU implementation of the op behind the reference's
``mmcv.ops.ModulatedDeformConv2d`` (reference head.py:751-782), superseding
``ops/deform_mxu.py`` (kept as fallback). Two structural changes over v3:

1. **Fused bilinear matrix.** v3 contracted x and y separately: per tap,
   d_win matmuls of (P, Wp) @ (Wp, C), each with K=Wp~86 and N=C=64 — both
   under the 128x128 MXU tile, ~34% utilization, plus a VPU accumulation
   per window row. Here the two hat-weight vectors fuse into ONE banded
   matrix W2(p, (d, j)) = wy(p, d) * wx(p, j) * m(p), and the whole
   bilinear sample is a single (P, d_win*Wp) @ (d_win*Wp, C) matmul:
   identical FLOPs, K >= 512 (full systolic streaming), one dispatch.

2. **x-tiling.** The bilinear support is only +/-(radius+2) columns wide,
   so contracting over the full row width W wastes W/(2r+4)x FLOPs. The
   input is restacked on the host into overlapping column slabs of
   Wp = TW + 2s (rounded to a sublane multiple); each (CH x TW) output
   tile contracts over a (CH+2r+2) x Wp window. At CH=8, TW=16, r=3:
   P = 128 (exactly one M tile), K = 16*32 = 512, FLOPs drop 2.7x vs the
   full-width form on an 80-wide level.

Layout discipline (the part that makes it fast — Mosaic relayouts are real
copies, and lane-dim-changing shape casts don't lower at all: Mosaic
rejects ``tpu.reshape (1,8,16) -> (1,128)``, the (CH,TW)->(P,) merge).
Therefore EVERY (CH, TW) <-> P transpose happens on the host: offsets and
masks arrive as (..., nch, 18|9, P) with P=CH*TW on the lane dim (fwd) or
(..., nch, P, 9) with P on sublanes (bwd, where the mask scales (P, C)
rows), the incoming gradient as (..., nch, P, Cout), and the kernel writes
its outputs in (nch, P, Cout) / (nch, 2*KK, P) / (nch, P, KK) layouts that
the host un-transposes. In-kernel iotas are built directly at (1, P) via
lane %/ TW. The only in-kernel reshapes merge or split dims at or above an
8-aligned sublane dim — (d_win, Wp, P) -> (L, P), (L, C) -> (d_win, Wp, C)
— which are free. Every gradient is likewise one matmul per tap:

    sampled_t = W2T^T @ Xwin                      (P, C)    K = L
    dXwin_t   = W2T @ (m * gs_t)                  (L, C)    K = P
    dW2T_t    = Xwin @ (m * gs_t)^T               (L, P)    K = C
    dw_t      = (m * sampled_t)^T @ g             (C, Cout) K = P

with the banded contractions back to dwy/dwx (65k FMAs each) on the VPU.

Semantics: exact bilinear sampling with mmcv zero-outside padding whenever
|offset| <= radius; offsets are clipped to +/-radius first (same contract
as ops/deform_pallas.py; agreement with the exact gather asserted in
tests/test_dcn_mxu.py). x (B, H, W, C) NHWC, offset (B, H, W, 18) with
(dy, dx) pairs in row-major tap order, mask (B, H, W, 9) post-sigmoid,
weight (3, 3, C, Cout) HWIO. Stride 1 / pad 1 / dilation 1 (the AYHead
configuration).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 3
KK = K * K
CH = int(os.environ.get("YAT_MXU2_CH", "8"))    # output rows per chunk
# chunk-loop unroll: >1 lets Mosaic overlap chunk i+1's VPU W2
# construction with chunk i's MXU matmuls (serial dependency otherwise)
UNROLL = int(os.environ.get("YAT_MXU2_UNROLL", "1"))
TW = int(os.environ.get("YAT_MXU2_TW", "16"))   # output cols per x-tile


def _hat(u):
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


def _dhat(u):
    return jnp.where(jnp.abs(u) < 1.0, -jnp.sign(u), 0.0)


def _round_up(v, m):
    return -(-v // m) * m


def _lane_iotas(ch, tw):
    """x(p), y(p) as (1, P) lane vectors; no (CH, TW) -> P shape cast."""
    p = ch * tw
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    x_of_pT = jnp.remainder(lane, tw).astype(jnp.float32)
    y_of_pT = (lane // tw).astype(jnp.float32)
    return x_of_pT, y_of_pT


def _fwd_kernel(xs_ref, off_ref, mask_ref, w_ref, out_ref, *, hc, tw, s,
                radius, cout, ch, prec):
    """One (image, x-tile). xs (1, 1, Hc+2s, Wp, C); off (1, 1, nch, 18, P)
    f32, mask (1, 1, nch, 9, P) f32 — P on lanes; w (KK*C, Cout);
    out (1, 1, nch, P, Cout).

    All 9 taps are STACKED into one sampling matmul per chunk: the taps'
    per-tap windows differ only by ty in {-1,0,1}, so a 2-row-widened
    shared window (d_win2 = d_win + 2) covers every tap with ty folded
    into the y-hat position. W2T_all is (L2, 9P) and the sample is ONE
    (9P, L2) x (L2, C) matmul — M = 9P = 1152 spans nine M-tiles, so all
    MXUs stay busy, vs nine M=128 dispatches each using ~1/8 of the chip
    (the round-3 form; measured 7.2 ms on the flagship's three levels —
    dispatch-serialization-bound, not FLOP-bound)."""
    c = xs_ref.shape[-1]
    wp = xs_ref.shape[-2]
    d_win2 = ch + 2 * radius + 4
    p = ch * tw

    x_of_pT, y_of_pT = _lane_iotas(ch, tw)
    j_T = jax.lax.broadcasted_iota(jnp.int32, (wp, 1), 0).astype(jnp.float32)
    d_T = jax.lax.broadcasted_iota(jnp.int32, (d_win2, 1), 0).astype(jnp.float32)

    def chunk_body(ci, _):
        off = off_ref[0, 0, ci]                               # (2*KK, P)
        msk = mask_ref[0, 0, ci]                              # (KK, P)
        base = ci * ch + (s - radius - 2)
        xwin = xs_ref[0, 0, pl.ds(base, d_win2), :, :].reshape(d_win2 * wp, c)
        cols = []
        for t in range(KK):
            ty, tx = t // K - 1, t % K - 1
            offyT = off[2 * t].reshape(1, p)
            offxT = off[2 * t + 1].reshape(1, p)
            mT = msk[t].reshape(1, p)

            # wxT[j, p] = hat(offx + tx + s + x(p) - j); fold the mask here
            wxT = _hat(offxT + (tx + s) + x_of_pT - j_T) * mT  # (Wp, P)
            # ty folds into the y position within the shared widened window
            ayT = offyT + y_of_pT + float(radius + 2 + ty)     # (1, P)
            wyT = _hat(ayT - d_T)                              # (d_win2, P)
            cols.append((wyT[:, None, :] * wxT[None, :, :]).reshape(
                d_win2 * wp, p))
        w2T_all = jnp.concatenate(cols, axis=-1)               # (L2, 9P)
        sampled = jax.lax.dot_general(
            w2T_all.astype(xs_ref.dtype), xwin,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                    # (9P, C)
        # (9P, C) -> (P, 9C): sublane slices + lane concat (Mosaic has no
        # lane-merging shape cast, but 128-aligned row slices are free and
        # lane concat lowered fine in the round-3 kernel)
        sampled = jnp.concatenate(
            [sampled[t * p:(t + 1) * p] for t in range(KK)], axis=-1)
        out = jax.lax.dot_general(
            sampled.astype(w_ref.dtype), w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                    # (P, Cout)
        out_ref[0, 0, ci] = out.astype(out_ref.dtype)
        return 0

    nch = hc // ch
    if UNROLL > 1 and nch % UNROLL == 0:
        # manual unroll (lax.fori_loop's unroll= does not lower through
        # this Mosaic path): adjacent chunks are independent, so the
        # compiler can overlap chunk i+1's VPU W2 construction with chunk
        # i's MXU matmuls
        def multi_body(cj, _):
            for k in range(UNROLL):
                chunk_body(cj * UNROLL + k, 0)
            return 0

        jax.lax.fori_loop(0, nch // UNROLL, multi_body, 0, unroll=False)
    else:
        jax.lax.fori_loop(0, nch, chunk_body, 0, unroll=False)


def _bwd_kernel(xs_ref, off_ref, maskp_ref, w_ref, g_ref,
                dxs_ref, doff_ref, dmask_ref, dw_ref, *, hc, tw, s,
                radius, cout, ch, prec, mm_dtype):
    """Gradients for one (image, x-tile); all 9 taps stacked per matmul.
    off (1, 1, nch, 18, P) f32 (P on lanes); maskp (1, 1, nch, P, 9) f32
    (P on sublanes); g (1, 1, nch, P, Cout) f32. Outputs:
    dxs (1, 1, Hc+2s, Wp, C) f32, doff (1, 1, nch, 18, P) f32,
    dmask (1, 1, nch, P, 9) f32, dw (1, 1, KK*C, Cout) f32.

    Round-4 rework: all taps read ONE 2-row-widened shared window (ty
    folded into the y-hat), so the per-tap dX windows accumulate in
    registers with no pad+add chain and hit VMEM once per chunk; and
    ``mm_dtype`` lets the production bf16 path run single-pass MXU
    matmuls with f32 accumulation (the round-3 kernel ran every gradient
    matmul with f32 inputs at DEFAULT precision = multi-pass bf16x3,
    ~3x slower); the f32 parity path keeps f32/HIGHEST. Tap-stacked
    single-matmul forms were tried and measured flat (the kernel is
    VPU-bound on the dense W2 construction, not dispatch-bound) and
    Mosaic cannot sublane-concat lane slices at offset 64 anyway — the
    per-tap loop stays."""
    c = xs_ref.shape[-1]
    wp = xs_ref.shape[-2]
    d_win2 = ch + 2 * radius + 4
    p = ch * tw

    dxs_ref[0, 0, :, :, :] = jnp.zeros(
        (xs_ref.shape[2], wp, c), dxs_ref.dtype)
    dw_ref[0, 0, :, :] = jnp.zeros((KK * c, cout), jnp.float32)

    x_of_pT, y_of_pT = _lane_iotas(ch, tw)
    j_T = jax.lax.broadcasted_iota(jnp.int32, (wp, 1), 0).astype(jnp.float32)
    d_T = jax.lax.broadcasted_iota(jnp.int32, (d_win2, 1), 0).astype(jnp.float32)

    def chunk_body(ci, _):
        off = off_ref[0, 0, ci]                               # (2*KK, P)
        mskp = maskp_ref[0, 0, ci]                            # (P, KK)
        gflat = g_ref[0, 0, ci]                               # (P, Cout)
        # g through the conv weight for ALL taps at once: (P, KK*C)
        gs_all = jax.lax.dot_general(
            gflat.astype(mm_dtype), w_ref[...].astype(mm_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
        base = ci * ch + (s - radius - 2)
        xwin = xs_ref[0, 0, pl.ds(base, d_win2), :, :].astype(
            mm_dtype).reshape(d_win2 * wp, c)
        gflat_mm = gflat.astype(mm_dtype)

        doff_rows = []
        dmask_cols = []
        dw_rows = []
        # all taps share the widened window, so their dX contributions
        # accumulate directly in registers — ONE VMEM RMW per chunk
        dx_acc = jnp.zeros((d_win2, wp, c), jnp.float32)
        for t in range(KK):
            ty, tx = t // K - 1, t % K - 1
            offyT = off[2 * t].reshape(1, p)
            offxT = off[2 * t + 1].reshape(1, p)
            mP = mskp[:, t].reshape(p, 1)                      # (P, 1)

            uxT = offxT + (tx + s) + x_of_pT - j_T             # (Wp, P)
            wxT = _hat(uxT)
            ayT = offyT + y_of_pT + float(radius + 2 + ty)
            adT = ayT - d_T                                    # (d_win2, P)
            wyT = _hat(adT)
            w2T = (wyT[:, None, :] * wxT[None, :, :]).reshape(
                d_win2 * wp, p).astype(mm_dtype)

            # pre-mask sample, needed by dmask and dw
            sampled = jax.lax.dot_general(
                w2T, xwin,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)            # (P, C)
            gs = gs_all[:, t * c : (t + 1) * c]                # (P, C)
            gsm = (gs * mP).astype(mm_dtype)

            # dX window: W2T @ (m * gs) — masked wx NOT folded into w2T here,
            # so fold the mask into gsm (identical algebra)
            dxw = jax.lax.dot_general(
                w2T, gsm,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)            # (L2, C)
            dx_acc = dx_acc + dxw.reshape(d_win2, wp, c)

            # dW2T = Xwin @ gsm^T, then band-contract back to wy/wx grads
            dw2T = jax.lax.dot_general(
                xwin, gsm,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)            # (L2, P)
            dw2T = dw2T.reshape(d_win2, wp, p)
            dwyT = jnp.sum(dw2T * wxT[None, :, :], axis=1)     # (d_win2, P)
            dwxT = jnp.sum(dw2T * wyT[:, None, :], axis=0)     # (Wp, P)
            doff_rows.append(
                jnp.sum(dwyT * _dhat(adT), axis=0, keepdims=True))   # (1, P)
            doff_rows.append(
                jnp.sum(dwxT * _dhat(uxT), axis=0, keepdims=True))   # (1, P)
            dmask_cols.append(
                jnp.sum(sampled * gs, axis=-1, keepdims=True))       # (P, 1)

            # dW_t = (m * sampled)^T @ g
            dw_rows.append(jax.lax.dot_general(
                (sampled * mP).astype(mm_dtype), gflat_mm,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec))
        dxs_ref[0, 0, pl.ds(base, d_win2), :, :] += dx_acc.astype(dxs_ref.dtype)
        dw_ref[0, 0, :, :] += jnp.concatenate(dw_rows, axis=0)    # (KK*C, Cout)
        doff_ref[0, 0, ci] = jnp.concatenate(doff_rows, axis=0)   # (2KK, P)
        dmask_ref[0, 0, ci] = jnp.concatenate(dmask_cols, axis=-1)  # (P, KK)
        return 0

    jax.lax.fori_loop(0, hc // ch, chunk_body, 0, unroll=False)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _prep(x, offset, mask, radius, ch, tw):
    """Pad + restack into overlapping column slabs, with the (CH, TW) -> P
    flattening done HERE (Mosaic cannot shape-cast into the lane dim).

    Returns (xt, offt, maskt, maskp, (s, hc, wp, ntx)) where xt is
    (B, ntx, Hc+2s, Wp, C) with slab i covering padded columns
    [i*TW, i*TW + Wp); offt is (B, ntx, nch, 2*KK, P) with P = CH*TW on the
    lane dim; maskt likewise (B, ntx, nch, KK, P); maskp is the
    sublane-major copy (B, ntx, nch, P, KK) the backward kernel scales
    (P, C) rows with."""
    b, h, w, c = x.shape
    s = radius + 2
    hc = _round_up(h, ch)
    wc = _round_up(w, tw)
    wp = _round_up(tw + 2 * s, 8)
    ntx = wc // tw
    nch = hc // ch
    xs = jnp.pad(x, ((0, 0), (s, s + (hc - h)), (s, s + (wc - w) + (wp - tw - 2 * s)), (0, 0)))
    xt = jnp.stack([xs[:, :, i * tw : i * tw + wp, :] for i in range(ntx)], 1)
    offp = jnp.pad(offset.astype(jnp.float32),
                   ((0, 0), (0, hc - h), (0, wc - w), (0, 0)))
    offt = offp.reshape(b, nch, ch, ntx, tw, 2 * KK).transpose(
        0, 3, 1, 5, 2, 4).reshape(b, ntx, nch, 2 * KK, ch * tw)
    maskq = jnp.pad(mask.astype(jnp.float32),
                    ((0, 0), (0, hc - h), (0, wc - w), (0, 0))).reshape(
        b, nch, ch, ntx, tw, KK)
    maskt = maskq.transpose(0, 3, 1, 5, 2, 4).reshape(
        b, ntx, nch, KK, ch * tw)
    maskp = maskq.transpose(0, 3, 1, 2, 4, 5).reshape(
        b, ntx, nch, ch * tw, KK)
    return xt, offt, maskt, maskp, (s, hc, wp, ntx)


_INTERPRET = False  # flipped by tests on CPU


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def modulated_deform_conv2d_mxu2(x, offset, mask, weight, radius: int = 3):
    """Modulated deformable conv 3x3, stride 1, pad 1 — fused-bilinear
    x-tiled MXU kernel. Exact bilinear/zero-pad semantics for
    |offset| <= radius; offsets are clipped to +/-radius."""
    out, _ = _fwd_impl(x, offset, mask, weight, radius)
    return out


def _fwd_impl(x, offset, mask, weight, radius):
    b, h, w, c = x.shape
    cout = weight.shape[-1]
    offset = jnp.clip(offset, -float(radius), float(radius))
    xt, offt, maskt, _, (s, hc, wp, ntx) = _prep(x, offset, mask, radius,
                                                 CH, TW)
    nch = hc // CH
    p = CH * TW
    wflat = weight.reshape(KK * c, cout).astype(jnp.float32)

    # f32 inputs ask for exact (multi-pass) MXU arithmetic so the kernel
    # matches the exact gather at f32; the production bf16 path keeps the
    # fast single-pass default (bf16-in is single-pass at any precision).
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    kernel = partial(_fwd_kernel, hc=hc, tw=TW, s=s, radius=radius,
                     cout=cout, ch=CH, prec=prec)
    spec = lambda *shape: pl.BlockSpec(  # noqa: E731
        (1, 1, *shape), lambda i, j: (i, j) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        kernel,
        grid=(b, ntx),
        in_specs=[
            spec(hc + 2 * s, wp, c),
            spec(nch, 2 * KK, p),
            spec(nch, KK, p),
            pl.BlockSpec((KK * c, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec(nch, p, cout),
        out_shape=jax.ShapeDtypeStruct((b, ntx, nch, p, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ntx * hc * TW * KK
            * ((CH + 2 * radius + 2) * wp * c // CH + c * cout),
            bytes_accessed=2 * b * ntx * hc * (
                wp * c * 2 + TW * (3 * KK + cout) * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xt, offt, maskt, wflat)

    out = out_t.reshape(b, ntx, nch, CH, TW, cout).transpose(
        0, 2, 3, 1, 4, 5).reshape(b, hc, ntx * TW, cout)
    return out[:, :h, :w, :].astype(x.dtype), (x, offset, mask, weight)


def _fwd_rule(x, offset, mask, weight, radius):
    out, res = _fwd_impl(x, offset, mask, weight, radius)
    return out, res


def _bwd_rule(radius, res, gout):
    x, offset, mask, weight = res        # offset here is already clipped
    b, h, w, c = x.shape
    cout = weight.shape[-1]
    xt, offt, _, maskp, (s, hc, wp, ntx) = _prep(x, offset, mask, radius,
                                                 CH, TW)
    nch = hc // CH
    p = CH * TW
    wflat = weight.reshape(KK * c, cout).astype(jnp.float32)
    mm_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    gpad = jnp.pad(gout.astype(mm_dtype),
                   ((0, 0), (0, hc - h), (0, ntx * TW - w), (0, 0)))
    gt = gpad.reshape(b, nch, CH, ntx, TW, cout).transpose(
        0, 3, 1, 2, 4, 5).reshape(b, ntx, nch, p, cout)

    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    kernel = partial(_bwd_kernel, hc=hc, tw=TW, s=s, radius=radius,
                     cout=cout, ch=CH, prec=prec, mm_dtype=mm_dtype)
    spec = lambda *shape: pl.BlockSpec(  # noqa: E731
        (1, 1, *shape), lambda i, j: (i, j) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    dxt, dofft, dmaskt, dw_b = pl.pallas_call(
        kernel,
        grid=(b, ntx),
        in_specs=[
            spec(hc + 2 * s, wp, c),
            spec(nch, 2 * KK, p),
            spec(nch, p, KK),
            pl.BlockSpec((KK * c, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            spec(nch, p, cout),
        ],
        out_specs=[
            spec(hc + 2 * s, wp, c),
            spec(nch, 2 * KK, p),
            spec(nch, p, KK),
            spec(KK * c, cout),
        ],
        out_shape=[
            # dx accumulates in f32 even on the bf16 path: the VMEM slab RMW
            # (overlapping chunk windows) and the strip un-tiling overlap
            # bands would otherwise compound bf16 rounding exactly where
            # contributions overlap (ADVICE r4); matmuls stay bf16-in with
            # f32 accumulation either way.
            jax.ShapeDtypeStruct((b, ntx, hc + 2 * s, wp, c), jnp.float32),
            jax.ShapeDtypeStruct((b, ntx, nch, 2 * KK, p), jnp.float32),
            jax.ShapeDtypeStruct((b, ntx, nch, p, KK), jnp.float32),
            jax.ShapeDtypeStruct((b, ntx, KK * c, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xt, offt, maskp, wflat, gt)

    # un-tile dx: slab i covers padded columns [i*TW, i*TW + wp). With
    # wp <= 2*TW a slab overlaps only its immediate neighbours, so even
    # and odd slabs are internally disjoint: concatenate each parity into
    # one contiguous strip and add the two strips once — 2 fused pads+adds
    # instead of ntx serialized whole-array RMWs (measured as part of the
    # ~12 ms bs16 DCN backward share).
    wc = ntx * TW
    wfull = wc + 2 * s + (wp - TW - 2 * s)

    def strip(par):
        idx = list(range(par, ntx, 2))
        cat = jnp.concatenate([dxt[:, i] for i in idx], axis=2)
        # place at column par*TW; slabs in the strip tile every 2*TW... but
        # consecutive same-parity slabs start 2*TW apart and are wp wide:
        # wp < 2*TW leaves a gap — insert per-slab right padding first.
        if wp < 2 * TW and len(idx) > 1:
            cat = jnp.concatenate(
                [jnp.pad(dxt[:, i], ((0, 0), (0, 0), (0, 2 * TW - wp), (0, 0)))
                 for i in idx[:-1]] + [dxt[:, idx[-1]]], axis=2)
        start = par * TW
        return jnp.pad(cat, ((0, 0), (0, 0),
                             (start, wfull - start - cat.shape[2]), (0, 0)))

    if wp <= 2 * TW:
        dxs = strip(0) + (strip(1) if ntx > 1 else 0.0)
    else:
        # wide slabs (large radius or small TW): a slab overlaps more than
        # its immediate neighbour, so the 2-strip trick does not apply —
        # fall back to the per-slab scatter-add (ntx pads+adds)
        dxs = jnp.zeros((b, hc + 2 * s, wfull, c), jnp.float32)
        for i in range(ntx):
            dxs = dxs.at[:, :, i * TW : i * TW + wp, :].add(dxt[:, i])
    dx = dxs[:, s : s + h, s : s + w, :].astype(x.dtype)

    doff = dofft.reshape(b, ntx, nch, 2 * KK, CH, TW).transpose(
        0, 2, 4, 1, 5, 3).reshape(b, hc, wc, 2 * KK)[:, :h, :w]
    inb = (jnp.abs(offset) < float(radius)).astype(doff.dtype)
    doff = (doff * inb).astype(offset.dtype)
    dmask = dmaskt.reshape(b, ntx, nch, CH, TW, KK).transpose(
        0, 2, 3, 1, 4, 5).reshape(b, hc, wc, KK)[:, :h, :w]
    dmask = dmask.astype(mask.dtype)
    dweight = dw_b.sum((0, 1)).reshape(K, K, c, cout).astype(weight.dtype)
    return dx, doff, dmask, dweight


modulated_deform_conv2d_mxu2.defvjp(_fwd_rule, _bwd_rule)
