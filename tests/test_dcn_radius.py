"""Checkpoint-aware DCN clip radius (VERDICT r4 #1).

The reference's mmcv ModulatedDeformConv2d (head.py:751-782) is unbounded;
our bounded kernels clip |offset| at DyDCNv2.radius. Checkpoints record the
trained dcn_offset_max and load_checkpoint must widen the radius to cover
it, so a converged checkpoint with 17 px offsets samples identically on the
TPU default path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from yolo_ad_refine_tpu.models.model import DetectionModel

TINY_AY = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "AYHead", ["nc"]]],
}


def test_yaml_dcn_radius_reaches_module():
    m = DetectionModel({**TINY_AY, "dcn_radius": 9.0})
    assert float(m.head_spec.module.dcn_radius) == 9.0
    m2 = DetectionModel(TINY_AY)
    assert float(m2.head_spec.module.dcn_radius) == 3.0


def test_checkpoint_roundtrip_widens_radius(tmp_path):
    m = DetectionModel(TINY_AY)
    m.init(jax.random.PRNGKey(0), imgsz=64)
    save_checkpoint(tmp_path / "ck", model=m, dcn_offset_max=17.2)
    loaded = load_checkpoint(tmp_path / "ck")
    # ceil(17.2) + 1 = 19
    assert float(loaded.head_spec.module.dcn_radius) == 19.0
    # params restored unchanged despite the rebuilt graph
    a = jax.tree.leaves(m.variables)
    b = jax.tree.leaves(loaded.variables)
    assert len(a) == len(b)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_checkpoint_small_offsets_keep_default(tmp_path):
    m = DetectionModel(TINY_AY)
    m.init(jax.random.PRNGKey(0), imgsz=64)
    save_checkpoint(tmp_path / "ck", model=m, dcn_offset_max=1.4)
    loaded = load_checkpoint(tmp_path / "ck")
    assert float(loaded.head_spec.module.dcn_radius) == 3.0


@pytest.mark.slow
def test_head_large_offsets_match_exact(tmp_path, monkeypatch):
    """Transplant synthetic LARGE offsets into the head's offset-conv bias
    (so the DCN sees 5-15 px offsets) and assert the widened bounded kernel
    matches the exact unbounded gather end-to-end through the model."""
    import yolo_ad_refine_tpu.ops.deform_mxu2 as dm2

    if jax.default_backend() != "tpu":
        monkeypatch.setattr(dm2, "_INTERPRET", True)

    m = DetectionModel({**TINY_AY, "dcn_radius": 16.0}, dtype=jnp.float32)
    m.init(jax.random.PRNGKey(1), imgsz=64)
    # push the offset conv bias to large values: offsets = bias + Wx,
    # spread over [-15, 15]
    params = m.variables["params"]
    head_p = params[f"modules_{m.head_spec.i}"]
    bias = np.array(head_p["spatial_conv_offset"]["bias"])
    rng = np.random.default_rng(5)
    bias[:18] = rng.uniform(-14.0, 14.0, 18)
    head_p["spatial_conv_offset"]["bias"] = jnp.asarray(bias)

    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    monkeypatch.setenv("YAT_DCN_IMPL", "exact")
    y_ref = m.apply(m.variables, x, train=False)[0]
    monkeypatch.setenv("YAT_DCN_IMPL", "mxu2")
    y_mx = m.apply(m.variables, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(y_mx), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
