"""Exact space-to-depth rewrite of the two stride-2 stem convs (inference).

Motivation (docs/performance.md "Remaining levers" 1): the first two
flagship rows — Conv 3->16 k3 s2 @640 and Conv 16->32 k3 s2 @320 — run at
C=3/16/32 of the TPU's 128 vector lanes, so every activation pass moves a
mostly-padding tensor through HBM; chained-truth timing attributes
2.47 + 1.39 ms of the 26.3 ms bs32 forward to them (benchmarks/
bench_stem2.py). The rewrite reshapes the input once to space-to-depth(4)
form, (B, H/4, W/4, 48), and replaces both convs with k=2 s=1 convs whose
weights are scattered copies of the originals:

    x:  (B, H, W, 3)      --s2d(4)-->  (B, H/4, W/4, 48)
    l0: Conv 3->16 k3 s2  ==  conv 48 -> 4*16 k2 s1 pad(top/left 1)
        (output = s2d(2) of the 320^2 x 16 map, phase-major channels)
    l1: Conv 16->32 k3 s2 ==  conv 4*16 -> 32 k2 s1 pad(top/left 1)
        (output = the natural (B, H/4, W/4, 32) row-1 output)

Derivation: an output row p of a k3 s2 conv reads input rows 2p-1..2p+1.
Writing p = 2I + a (a in {0,1}) over s2d(4) blocks of the 640-grid, those
rows live in blocks {I-1, I}; the kernel tap (a, u) lands at block offset
U and in-block row du with (U, du) = (0, 3) if a == u == 0 else
(1, 2a + u - 1). For the second conv over the s2d(2) form, tap u maps to
(U, a) with u = 2U + a - 1 (the (U, a) = (0, 0) slot is structurally
zero). Zero-padding at the image border maps to the k2 conv's (1, 0)
block padding exactly, so the rewrite is bit-exact in real arithmetic.

BatchNorm (eval = affine) is folded into the transformed weights and a
bias, and SiLU applies elementwise (channel order is just a pixel
permutation), so the fused pair is mathematically identical to the module
path; in f32 it matches to float-rounding, in bf16 the one extra rounding
of w*gamma is ~1e-2 relative — standard conv-BN folding, same as the
reference's fuse() (ultralytics/nn/tasks.py:203).

Enabled via YAT_STEM_S2D = auto (default: on for TPU backends) | 1 | 0.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stem_pair_maps", "stem_pair_eligible", "stem_pair_infer", "stem_s2d_enabled"]


def stem_s2d_enabled() -> bool:
    v = os.environ.get("YAT_STEM_S2D", "auto").lower()
    if v in ("1", "true", "pair"):
        return True
    if v in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=8)
def stem_pair_maps(c0: int, c1: int, c2: int):
    """Static gather maps turning the original k3 s2 kernels into k2 s1 ones.

    Returns (G0, G1): int arrays indexing the flattened original weight
    (with one trailing zero slot) such that W' = Wflat_padded[G].
    G0: (2, 2, 16*c0, 4*c1) for conv c0->c1; G1: (2, 2, 4*c1, c2).
    """
    z0 = 9 * c0 * c1  # zero-slot index for W0
    G0 = np.full((2, 2, 16 * c0, 4 * c1), z0, dtype=np.int32)
    for a in range(2):
        for u in range(3):
            U, du = (0, 3) if (a == 0 and u == 0) else (1, 2 * a + u - 1)
            for b in range(2):
                for v in range(3):
                    V, dv = (0, 3) if (b == 0 and v == 0) else (1, 2 * b + v - 1)
                    ic = (du * 4 + dv) * c0
                    oc = (a * 2 + b) * c1
                    for c in range(c0):
                        base = ((u * 3 + v) * c0 + c) * c1
                        G0[U, V, ic + c, oc:oc + c1] = base + np.arange(c1)
    z1 = 9 * c1 * c2
    G1 = np.full((2, 2, 4 * c1, c2), z1, dtype=np.int32)
    for U in range(2):
        for a in range(2):
            u = 2 * U + a - 1
            if not 0 <= u <= 2:
                continue
            for V in range(2):
                for b in range(2):
                    v = 2 * V + b - 1
                    if not 0 <= v <= 2:
                        continue
                    ic = (a * 2 + b) * c1
                    for c in range(c1):
                        base = ((u * 3 + v) * c1 + c) * c2
                        G1[U, V, ic + c, :] = base + np.arange(c2)
    return G0, G1


def stem_pair_eligible(specs, save) -> tuple | None:
    """Pattern-match yaml rows 0-1 as plain stride-2 k3 Convs.

    Returns (c0, c1, c2) channel triple when the rewrite applies, else None.
    """
    if len(specs) < 3:
        return None
    for s in specs[:2]:
        m = s.module
        if type(m).__name__ != "Conv" or s.f != -1:
            return None
        if (getattr(m, "k", None), getattr(m, "s", None)) != (3, 2):
            return None
        if (getattr(m, "g", 1), getattr(m, "d", 1)) != (1, 1):
            return None
        if getattr(m, "p", None) is not None or getattr(m, "act", True) is not True:
            return None
    if 0 in save:
        return None
    return (3, specs[0].module.c2, specs[1].module.c2)


def _fold_bn(kernel, bn_params, bn_stats, eps=1e-3):
    """Fold eval-mode BatchNorm into (kernel, bias), float32."""
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return kernel * scale, bn_params["bias"] - bn_stats["mean"] * scale


@lru_cache(maxsize=4)
def _s2d4_perm_kernel(c: int):
    """(4,4,c,16c) identity scatter: conv(x, K, stride 4) == s2d(4) restack."""
    k = np.zeros((4, 4, c, 16 * c), np.float32)
    for u in range(4):
        for v in range(4):
            for ch in range(c):
                k[u, v, ch, (u * 4 + v) * c + ch] = 1.0
    return k


def s2d4_restack(x):
    """(B,H,W,C) -> (B,H/4,W/4,16C) phase-major s2d(4).

    The profiler shows the transpose+reshape form as THREE ~input-sized
    copies (~2.2 ms busy-time at bs32/640), but the A/B says they overlap
    with compute: identity-permutation conv (k4 s4, YAT_S2D_RESTACK=conv)
    measured 23.38 vs 23.25 ms full eval — null, transpose stays default
    (round-5, docs/performance.md)."""
    B, H, W, C = x.shape
    if os.environ.get("YAT_S2D_RESTACK", "transpose") == "conv":
        k = jnp.asarray(_s2d4_perm_kernel(C), x.dtype)
        return jax.lax.conv_general_dilated(
            x, k, (4, 4), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xs = x.reshape(B, H // 4, 4, W // 4, 4, C)
    return xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4, 16 * C)


def stem_pair_infer(variables, x, dtype, chans):
    """Fused eval forward of yaml rows 0-1 via the s2d(4) rewrite.

    variables: the model's full variables dict (rows live under modules_0/1).
    x: (B, H, W, 3) with H % 4 == W % 4 == 0. Returns (B, H/4, W/4, c2).
    """
    c0, c1, c2 = chans
    G0, G1 = stem_pair_maps(c0, c1, c2)
    p, s = variables["params"], variables["batch_stats"]
    w0, b0 = _fold_bn(p["modules_0"]["conv"]["kernel"], p["modules_0"]["bn"],
                      s["modules_0"]["bn"])
    w1, b1 = _fold_bn(p["modules_1"]["conv"]["kernel"], p["modules_1"]["bn"],
                      s["modules_1"]["bn"])
    pad1 = jnp.zeros((1,), w0.dtype)
    # Two equivalent formulations, TPU-measured at bs32/640 (chained):
    #   explicit s2d + two k2 convs        -> full fwd 25.68 ms (1246 img/s)
    #   k8 s4 conv directly on the input   -> full fwd 27.34 ms (1171 img/s)
    #   module path (no rewrite)           -> full fwd 26.3  ms (1216 img/s)
    # XLA lowers the k8 s4 C=3 conv poorly; the explicit transpose wins.
    w0p = jnp.concatenate([w0.reshape(-1), pad1])[G0].astype(dtype)
    w1p = jnp.concatenate([w1.reshape(-1), pad1])[G1].astype(dtype)
    b0p = jnp.tile(b0, 4).astype(dtype)

    xs = s2d4_restack(x)
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(xs, w0p, (1, 1), [(1, 0), (1, 0)],
                                     dimension_numbers=dn)
    y = jax.nn.silu(y + b0p)
    y = jax.lax.conv_general_dilated(y, w1p, (1, 1), [(1, 0), (1, 0)],
                                     dimension_numbers=dn)
    return jax.nn.silu(y + b1.astype(dtype))


def stem0_w(w):
    """(3,3,c0,c1) -> (2,2,16*c0,4*c1): row-0 k3 s2 conv on the s2d(4)
    input (differentiable form of stem_pair_maps G0 — static block writes,
    VJP = slice reads; the gather form's VJP is a TPU scalar scatter)."""
    c0, c1 = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 16 * c0, 4 * c1), w.dtype)
    for a in range(2):
        for u in range(3):
            U, du = (0, 3) if (a == 0 and u == 0) else (1, 2 * a + u - 1)
            for b in range(2):
                for v in range(3):
                    V, dv = (0, 3) if (b == 0 and v == 0) else (1, 2 * b + v - 1)
                    ic = (du * 4 + dv) * c0
                    oc = (a * 2 + b) * c1
                    out = out.at[U, V, ic:ic + c0, oc:oc + c1].set(w[u, v])
    return out


def stem1_w(w):
    """(3,3,c1,c2) -> (2,2,4*c1,c2): row-1 k3 s2 conv consuming row-0's
    s2d(2) phase-major output (differentiable form of G1)."""
    c1, c2 = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * c1, c2), w.dtype)
    for U in range(2):
        for a in range(2):
            u = 2 * U + a - 1
            if not 0 <= u <= 2:
                continue
            for V in range(2):
                for b in range(2):
                    v = 2 * V + b - 1
                    if not 0 <= v <= 2:
                        continue
                    ic = (a * 2 + b) * c1
                    out = out.at[U, V, ic:ic + c1, :].set(w[u, v])
    return out
