"""Attention zoo part-2 forward tests (parity surface: reference
nn/modules/attention.py long tail — shape preservation, finiteness, yaml
registration). These modules are dead in the reference's active z-yaml path,
so the contract is module-surface completeness, not cross-stack numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.nn import attention_zoo as AZ

# (class name, ctor kwargs, input (H, W, C))
CASES = [
    ("SpatialGroupEnhance", {}, (8, 8, 32)),
    ("EffectiveSEModule", {}, (8, 8, 32)),
    ("ELA", {}, (8, 8, 32)),
    ("CAA", {}, (8, 8, 32)),
    ("MPCA", {}, (8, 8, 32)),
    ("AFGCAttention", {}, (8, 8, 32)),
    ("BAMBlock", {"reduction": 8}, (8, 8, 32)),
    ("LSKBlockSA", {}, (12, 12, 32)),
    ("LSKA", {"k_size": 7}, (12, 12, 32)),
    ("LSKA", {"k_size": 23}, (12, 12, 32)),
    ("SegNextAttention", {}, (12, 12, 32)),
    ("CPCA", {}, (12, 12, 32)),
    pytest.param(*("DeformableLKA", {}, (8, 8, 16)), marks=pytest.mark.slow),
    pytest.param(*("DAttention", {"n_heads": 4, "n_groups": 2}, (8, 8, 32)), marks=pytest.mark.slow),
    pytest.param(*("DAttention", {"n_heads": 4, "n_groups": 2, "no_off": True}, (8, 8, 32)), marks=pytest.mark.slow),
    pytest.param(*("FocusedLinearAttention", {"split_size": 4, "num_heads": 4}, (8, 8, 32)), marks=pytest.mark.slow),
    pytest.param(*("CascadedGroupAttention", {"key_dim": 8, "num_heads": 4, "resolution": 7}, (7, 7, 32)), marks=pytest.mark.slow),
    pytest.param(*("LocalWindowAttention", {"key_dim": 8, "num_heads": 4}, (9, 9, 32)), marks=pytest.mark.slow),
    ("DualDomainSelectionMechanism", {}, (8, 8, 32)),
    pytest.param(*("EfficientAttention", {"num_heads": 4, "group_split": (2, 2), "window_size": 2}, (8, 8, 32)), marks=pytest.mark.slow),
    pytest.param(*("BiLevelRoutingAttention", {"num_heads": 4, "n_win": 2, "topk": 2}, (8, 8, 32)), marks=pytest.mark.slow),
]


@pytest.mark.parametrize("name,kw,shape", CASES,
                         ids=[f"{(c.values if hasattr(c, 'values') else c)[0]}-{i}"
                              for i, c in enumerate(CASES)])
def test_shape_preserved_and_finite(name, kw, shape):
    m = getattr(AZ, name)(**kw)
    h, w, c = shape
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, h, w, c)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x, mutable=["batch_stats"])[0] \
        if "batch_stats" in variables else m.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_dattention_pe_modes():
    """All four positional-encoding modes run (reference defaults = dwc)."""
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (1, 8, 8, 32)),
                    jnp.float32)
    for kw in ({"dwc_pe": True},
               {"dwc_pe": False, "fixed_pe": True, "q_size": (8, 8)},
               {"dwc_pe": False, "log_cpb": True},
               {"dwc_pe": False}):
        m = AZ.DAttention(n_heads=4, n_groups=2, **kw)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_deform_conv_depthwise_no_offset_equals_conv():
    """Zero offsets reduce the depthwise deform conv to a plain dw conv."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 10, 10, 4)), jnp.float32)
    wgt = jnp.asarray(rng.normal(0, 0.5, (3, 3, 4)), jnp.float32)
    off = jnp.zeros((1, 10, 10, 18), jnp.float32)
    y = AZ._deform_conv_depthwise(x, off, wgt, 3, 1, 1)
    import jax.lax as lax

    ref = lax.conv_general_dilated(
        x, wgt[:, :, None, :],
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_yaml_rows_register():
    from yolo_ad_refine_tpu.models.model import DetectionModel

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "LSKA", []],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "CAA", []],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "EffectiveSEModule", []],
        ],
        "head": [[[5], 1, "Detect", ["nc"]]],
    }
    m = DetectionModel(cfg)
    m.init(imgsz=64)
    y, _ = m(jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape[0] == 1 and np.isfinite(np.asarray(y)).all()
