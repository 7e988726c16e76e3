"""DSCN snake-sampling op + DSAN modules (reference ops_dscn CUDA extension
semantics, decoded from dscn_im2col_cuda.cuh:243-310; dsan.py modules)."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.dscn import dscn_sample

REF = Path("/root/reference")


def np_dscn_reference(x, offset, k, axis, stride=1, pad=None, dilation=1,
                      group=1, scale=1.0):
    """Literal translation of the CUDA im2col loop (one output at a time)."""
    if pad is None:
        pad = (dilation * (k - 1)) // 2
    b, h, w, c = x.shape
    cg = c // group
    off = offset.reshape(b, h, w, group, k)
    out = np.zeros_like(x)
    half = (dilation * (k - 1)) // 2
    for bi in range(b):
        for yy in range(h):
            for xx in range(w):
                for g in range(group):
                    p0 = (xx if axis == "x" else yy) * stride + half - pad
                    p0 = p0 - half * scale
                    for i in range(k):
                        loc = p0 + (i * dilation + off[bi, yy, xx, g, i]) * scale
                        size = w if axis == "x" else h
                        if not (-1 < loc < size):
                            continue
                        lo = int(np.floor(loc))
                        fr = loc - lo
                        for ci in range(cg):
                            def at(j):
                                if j < 0 or j > size - 1:
                                    return 0.0
                                if axis == "x":
                                    return x[bi, yy, j, g * cg + ci]
                                return x[bi, j, xx, g * cg + ci]
                            out[bi, yy, xx, g * cg + ci] += (
                                at(lo) * (1 - fr) + at(lo + 1) * fr)
    return out


@pytest.mark.parametrize("axis", ["x", "y"])
@pytest.mark.parametrize("group", [1, 2])
def test_matches_cuda_semantics(axis, group):
    r = np.random.default_rng(0)
    k = 5
    x = r.random((2, 6, 7, 4)).astype(np.float32)
    off = r.normal(0, 2.0, (2, 6, 7, group * k)).astype(np.float32)
    want = np_dscn_reference(x, off, k, axis, group=group)
    got = np.asarray(dscn_sample(jnp.asarray(x), jnp.asarray(off), k, axis,
                                 group=group))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_zero_offset_is_box_sum():
    """With zero offsets the snake is straight: each output is the plain
    zero-padded K-tap sum along the axis."""
    r = np.random.default_rng(1)
    x = r.random((1, 4, 9, 2)).astype(np.float32)
    off = np.zeros((1, 4, 9, 3), np.float32)
    got = np.asarray(dscn_sample(jnp.asarray(x), jnp.asarray(off), 3, "x"))
    padded = np.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    want = padded[:, :, :-2] + padded[:, :, 1:-1] + padded[:, :, 2:]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_grad_flows_to_offsets():
    r = np.random.default_rng(2)
    x = jnp.asarray(r.random((1, 5, 5, 4)), jnp.float32)
    off = jnp.asarray(r.normal(0, 0.3, (1, 5, 5, 7)), jnp.float32)
    g = jax.grad(lambda o: jnp.sum(dscn_sample(x, o, 7, "y") ** 2))(off)
    assert float(jnp.abs(g).max()) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_dsan_forward_and_registry():
    from yolo_ad_refine_tpu.nn.dsan import DSAN

    m = DSAN()
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (1, 8, 8, 16)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # zero-init offset head: layer_scale 1e-2 keeps it near-identity at init
    assert float(jnp.abs(y - x).max()) < 1.0


@pytest.mark.slow
def test_yaml_row():
    from yolo_ad_refine_tpu.models.model import DetectionModel

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "DSAN", []],
            [-1, 1, "DSA", []],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[3], 1, "Detect", ["nc"]]],
    }
    m = DetectionModel(cfg)
    m.init(imgsz=32)
    y, _ = m(jnp.zeros((1, 32, 32, 3)), train=False)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_param_count_parity():
    import sys

    from test_parity import _ensure_reference_importable

    _ensure_reference_importable()

    # dsan.py imports `from timm.layers import ...` (test_parity stubs
    # timm.models.layers only)
    import types
    import torch.nn as tnn

    if "timm.layers" not in sys.modules:
        mod = types.ModuleType("timm.layers")

        class DropPath(tnn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        mod.DropPath = DropPath
        mod.trunc_normal_ = lambda t, std=0.02: t
        sys.modules["timm.layers"] = mod

    if "pkg_resources" not in sys.modules:  # removed in setuptools >= 81
        pr = types.ModuleType("pkg_resources")
        pr.parse_version = lambda v: tuple(v.split("."))
        pr.get_distribution = lambda name: types.SimpleNamespace(version="0")
        sys.modules["pkg_resources"] = pr

    from ultralytics.nn.modules.dsan import DSAN as TorchDSAN

    from yolo_ad_refine_tpu.nn.dsan import DSAN

    c = 32
    ref = TorchDSAN(c)
    ref_n = sum(p.numel() for p in ref.parameters())
    m = DSAN()
    x = jnp.zeros((1, 8, 8, c))
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
    our_n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"]))
    assert our_n == ref_n, f"{our_n} vs {ref_n}"
