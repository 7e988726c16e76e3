"""x-tiled fused-bilinear DCN kernel parity vs the exact gather formulation.

Same contract as tests/test_dcn_mxu.py: on CPU the kernel runs in Pallas
interpret mode; on a real TPU the same tests exercise the Mosaic lowering.
Offsets stay inside the radius where the kernel is EXACTLY bilinear
(reference mmcv ModulatedDeformConv2d, head.py:751-782).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # north-star kernel: PR parity tier

import jax
import jax.numpy as jnp

import yolo_ad_refine_tpu.ops.deform_mxu2 as dm2
from yolo_ad_refine_tpu.ops.deform import modulated_deform_conv2d

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(autouse=True)
def _interpret_off_tpu(monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(dm2, "_INTERPRET", True)


def _inputs(seed=0, B=1, H=10, W=12, C=8, CO=8):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.random((B, H, W, C)), jnp.float32)
    off = jnp.clip(jnp.asarray(r.normal(0, 1.2, (B, H, W, 18)), jnp.float32),
                   -2.9, 2.9)
    mask = jnp.asarray(r.random((B, H, W, 9)), jnp.float32)
    w = jnp.asarray(r.normal(0, 0.1, (3, 3, C, CO)), jnp.float32)
    return x, off, mask, w


def test_forward_matches_exact_gather():
    x, off, mask, w = _inputs()
    y_ref = modulated_deform_conv2d(x, off, mask, w)
    y_mx = dm2.modulated_deform_conv2d_mxu2(x, off, mask, w, 3)
    atol = 2e-3 if ON_TPU else 1e-5
    np.testing.assert_allclose(np.asarray(y_mx), np.asarray(y_ref), atol=atol)


@pytest.mark.slow
def test_forward_tile_nondivisible():
    """W smaller than / not divisible by the tile width, H not by CH."""
    for seed, (h, w_) in ((1, (11, 9)), (2, (7, 37)), (3, (16, 16))):
        x, off, mask, w = _inputs(seed=seed, H=h, W=w_)
        y_ref = modulated_deform_conv2d(x, off, mask, w)
        y_mx = dm2.modulated_deform_conv2d_mxu2(x, off, mask, w, 3)
        atol = 2e-3 if ON_TPU else 1e-5
        np.testing.assert_allclose(np.asarray(y_mx), np.asarray(y_ref),
                                   atol=atol, err_msg=f"H={h} W={w_}")


@pytest.mark.slow
def test_gradients_match_exact_gather():
    x, off, mask, w = _inputs(seed=4, H=13, W=18)

    def loss_ref(*a):
        return jnp.sum(modulated_deform_conv2d(*a) ** 2)

    def loss_mx(*a):
        return jnp.sum(dm2.modulated_deform_conv2d_mxu2(*a, 3) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, mask, w)
    g_mx = jax.grad(loss_mx, argnums=(0, 1, 2, 3))(x, off, mask, w)
    atol = 5e-2 if ON_TPU else 1e-4
    for name, a, b in zip(("dx", "doff", "dmask", "dw"), g_ref, g_mx):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=atol,
            err_msg=name)


def test_clip_semantics_beyond_radius():
    x, off, mask, w = _inputs(seed=5)
    big = off.at[..., 0].set(7.5)
    y_big = dm2.modulated_deform_conv2d_mxu2(x, big, mask, w, 3)
    y_clip = dm2.modulated_deform_conv2d_mxu2(
        x, jnp.clip(big, -3.0, 3.0), mask, w, 3)
    np.testing.assert_allclose(np.asarray(y_big), np.asarray(y_clip), atol=1e-6)


@pytest.mark.slow
def test_gradients_multi_tile_strips():
    """dx un-tiling at ntx in {3, 5} (even/odd strip parities, the P4/P3
    tile counts) — exercises the parity-strip reconstruction."""
    for seed, (h, w_) in ((6, (9, 40)), (7, (8, 72))):
        x, off, mask, w = _inputs(seed=seed, H=h, W=w_)

        def loss_ref(*a):
            return jnp.sum(modulated_deform_conv2d(*a) ** 2)

        def loss_mx(*a):
            return jnp.sum(dm2.modulated_deform_conv2d_mxu2(*a, 3) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, mask, w)
        g_mx = jax.grad(loss_mx, argnums=(0, 1, 2, 3))(x, off, mask, w)
        atol = 5e-2 if ON_TPU else 1e-4
        for name, a, b in zip(("dx", "doff", "dmask", "dw"), g_ref, g_mx):
            scale = max(1.0, float(jnp.abs(a).max()))
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=atol,
                err_msg=f"{name} H={h} W={w_}")


@pytest.mark.slow
def test_wide_slab_fallback_tw8():
    """wp > 2*TW (e.g. TW=8 with radius 3 -> wp=24 > 16) must fall back to
    the per-slab scatter-add un-tiling, not assert (ADVICE r4)."""
    old_tw = dm2.TW
    dm2.TW = 8
    try:
        x, off, mask, w = _inputs(seed=8, H=9, W=40)

        def loss_ref(*a):
            return jnp.sum(modulated_deform_conv2d(*a) ** 2)

        def loss_mx(*a):
            return jnp.sum(dm2.modulated_deform_conv2d_mxu2(*a, 3) ** 2)

        y_ref = modulated_deform_conv2d(x, off, mask, w)
        y_mx = dm2.modulated_deform_conv2d_mxu2(x, off, mask, w, 3)
        np.testing.assert_allclose(np.asarray(y_mx), np.asarray(y_ref),
                                   atol=2e-3 if ON_TPU else 1e-5)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, mask, w)
        g_mx = jax.grad(loss_mx, argnums=(0, 1, 2, 3))(x, off, mask, w)
        atol = 5e-2 if ON_TPU else 1e-4
        for name, a, b in zip(("dx", "doff", "dmask", "dw"), g_ref, g_mx):
            scale = max(1.0, float(jnp.abs(a).max()))
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=atol,
                err_msg=name)
    finally:
        dm2.TW = old_tw


@pytest.mark.slow
def test_large_offset_radius_parity():
    """VERDICT r4 #1: checkpoints whose trained offsets reach 5-17 px must
    sample exactly like the reference's UNBOUNDED mmcv kernel once the clip
    radius covers them. mxu2(r) == exact gather for |offset| < r."""
    for seed, (radius, omax) in enumerate(((5, 4.8), (8, 7.5), (17, 16.5))):
        r = np.random.default_rng(100 + seed)
        x = jnp.asarray(r.random((1, 10, 12, 8)), jnp.float32)
        off = jnp.asarray(r.uniform(-omax, omax, (1, 10, 12, 18)), jnp.float32)
        mask = jnp.asarray(r.random((1, 10, 12, 9)), jnp.float32)
        w = jnp.asarray(r.normal(0, 0.1, (3, 3, 8, 8)), jnp.float32)
        y_ref = modulated_deform_conv2d(x, off, mask, w)  # unbounded gather
        y_mx = dm2.modulated_deform_conv2d_mxu2(x, off, mask, w, radius)
        atol = 2e-3 if ON_TPU else 1e-5
        np.testing.assert_allclose(np.asarray(y_mx), np.asarray(y_ref),
                                   atol=atol, err_msg=f"radius={radius}")


@pytest.mark.slow
def test_large_offset_gradients_radius17():
    """Gradient parity at the widest observed offset range (17 px)."""
    r = np.random.default_rng(200)
    x = jnp.asarray(r.random((1, 9, 14, 8)), jnp.float32)
    off = jnp.asarray(r.uniform(-15.5, 15.5, (1, 9, 14, 18)), jnp.float32)
    mask = jnp.asarray(r.random((1, 9, 14, 9)), jnp.float32)
    w = jnp.asarray(r.normal(0, 0.1, (3, 3, 8, 8)), jnp.float32)

    def loss_ref(*a):
        return jnp.sum(modulated_deform_conv2d(*a) ** 2)

    def loss_mx(*a):
        return jnp.sum(dm2.modulated_deform_conv2d_mxu2(*a, 17) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, mask, w)
    g_mx = jax.grad(loss_mx, argnums=(0, 1, 2, 3))(x, off, mask, w)
    atol = 5e-2 if ON_TPU else 1e-4
    for name, a, b in zip(("dx", "doff", "dmask", "dw"), g_ref, g_mx):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=atol,
            err_msg=name)
