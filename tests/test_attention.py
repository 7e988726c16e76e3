"""Attention zoo forward tests (parity surface: reference
nn/modules/attention.py — shape preservation, gating behavior, yaml-row
registration)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.nn import attention as AT

MODULES = ["EMA", "SimAM", "TripletAttention", "LSKBlock", "SEAttention",
           "EfficientChannelAttention"]


@pytest.mark.parametrize("name", MODULES)
def test_shape_preserved_and_finite(name):
    m = AT.SimAM() if name == "SimAM" else getattr(AT, name)()
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 8, 8, 16)),
                    jnp.float32)
    if name == "SimAM":
        y = m(x)
        variables = {}
    else:
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        if "batch_stats" in variables:
            y = m.apply(variables, x, train=False)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.abs(y - x).max()) > 0  # actually does something


def test_simam_is_parameter_free_gate():
    x = jnp.ones((1, 4, 4, 8)) * 2.0
    y = AT.SimAM()(x)
    # constant input: energy term is 0/eps + 0.5 -> sigmoid(0.5) gate
    np.testing.assert_allclose(np.asarray(y), 2.0 / (1 + np.exp(-0.5)),
                               rtol=1e-5)


@pytest.mark.slow
def test_yaml_row_registration():
    from yolo_ad_refine_tpu.models.model import DetectionModel

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "SEAttention", []],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "EMA", []],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [[[4], 1, "Detect", ["nc"]]],
    }
    m = DetectionModel(cfg)
    m.init(imgsz=64)
    y, _ = m(jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape[0] == 1
