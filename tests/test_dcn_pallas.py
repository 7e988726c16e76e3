"""Pallas DCN kernel parity vs the exact gather formulation.

On CPU the kernel runs in Pallas interpret mode (same jaxpr, no Mosaic), so
this validates the window/hat math and the custom VJP everywhere; on a real
TPU the same test exercises the Mosaic lowering. Offsets are kept inside the
radius where the bounded-window kernel is EXACTLY bilinear (the kernel clips
beyond — reference mmcv ModulatedDeformConv2d, head.py:751-782, is unbounded
but trained alignment offsets stay well inside ±3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import yolo_ad_refine_tpu.ops.deform_pallas as dp
from yolo_ad_refine_tpu.ops.deform import modulated_deform_conv2d

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(autouse=True)
def _interpret_off_tpu(monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(dp, "_INTERPRET", True)


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
    y_pl = dp.modulated_deform_conv2d_pallas(x, off, mask, w, 3)
    atol = 2e-3 if ON_TPU else 1e-5  # TPU MXU default f32 precision
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=atol)


@pytest.mark.slow
def test_gradients_match_exact_gather():
    x, off, mask, w = _inputs(seed=1)

    def loss_ref(*a):
        return jnp.sum(modulated_deform_conv2d(*a) ** 2)

    def loss_pl(*a):
        return jnp.sum(dp.modulated_deform_conv2d_pallas(*a, 3) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, mask, w)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(x, off, mask, w)
    atol = 5e-2 if ON_TPU else 1e-4
    for name, a, b in zip(("dx", "doff", "dmask", "dw"), g_ref, g_pl):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=atol,
            err_msg=name)


def test_clip_semantics_beyond_radius():
    """Offsets beyond the radius behave as if clipped to ±radius."""
    x, off, mask, w = _inputs(seed=2)
    big = off.at[..., 0].set(7.5)  # way outside radius 3
    y_big = dp.modulated_deform_conv2d_pallas(x, big, mask, w, 3)
    y_clip = dp.modulated_deform_conv2d_pallas(
        x, jnp.clip(big, -3.0, 3.0), mask, w, 3)
    np.testing.assert_allclose(np.asarray(y_big), np.asarray(y_clip), atol=1e-6)


def test_nondivisible_height_padding():
    """H not a multiple of the chunk size exercises the pad/crop path."""
    x, off, mask, w = _inputs(seed=3, H=11, W=9)
    y_ref = modulated_deform_conv2d(x, off, mask, w)
    y_pl = dp.modulated_deform_conv2d_pallas(x, off, mask, w, 3)
    atol = 2e-3 if ON_TPU else 1e-5
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=atol)
