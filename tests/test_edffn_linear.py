"""EDFFN linear (TFLite-exportable) FFT formulation == the FFT path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.nn.tssa import EDFFN


@pytest.mark.parametrize("shape", [(2, 16, 16, 12), (1, 12, 20, 8)])
def test_linear_matches_fft(shape, monkeypatch):
    m = EDFFN(shape[-1])
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, shape), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    p = dict(v["params"])
    p["fft"] = jnp.asarray(
        np.random.default_rng(1).normal(1.0, 0.4, v["params"]["fft"].shape),
        jnp.float32)
    y_fft = m.apply({"params": p}, x)
    monkeypatch.setenv("YAT_EDFFN_FFT", "linear")
    y_lin = m.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(y_lin), np.asarray(y_fft),
                               atol=2e-5, rtol=1e-5)
