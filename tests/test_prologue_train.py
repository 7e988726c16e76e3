"""Parity: the blocked TRAIN prologue == the module path (fwd, stats, grads).

ops/s2d_prologue.py prologue_train runs yaml rows 0-4 in the phase-major
blocked layout with LIVE BatchNorm: batch stats reduce over
(B, h, w, phase), the exact same value set the module path reduces over,
so outputs, running-stat updates and gradients must agree to fp-reorder
tolerance at f32.
"""

import numpy as np

import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.models.model import build_detection_model
from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_train
from yolo_ad_refine_tpu.utils import ROOT

pytestmark = pytest.mark.parity  # production graph semantics: PR parity tier


def _model():
    m = build_detection_model(str(ROOT / "cfg" / "models" / "yolo11n.yaml"),
                              dtype=jnp.float32, imgsz=64)
    assert m.prologue_meta is not None
    return m


def _head_of(tree, upto=5):
    return {f"modules_{i}": tree[f"modules_{i}"] for i in range(upto)}


def test_prologue_train_forward_and_stats():
    m = _model()
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                    jnp.float32)

    # module path: rows 0-4 with mutable BN
    feats_ref, mut_ref = m.graph.apply(m.variables, x, train=True,
                                       mutable=["batch_stats"])
    y_pro, pre_stats = prologue_train(m.variables, x, jnp.float32,
                                      m.prologue_meta)
    feats_pro, mut_pro = m.graph.apply(m.variables, y_pro, train=True,
                                       start_at=5, full_input_h=64,
                                       mutable=["batch_stats"])
    for a, b in zip(feats_ref, feats_pro):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=6e-4, rtol=1e-4)
    # running stats of rows 0-4 match the module path's updates
    ref_sub = _head_of(mut_ref["batch_stats"])
    got_sub = _head_of(pre_stats)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ref_sub),
                   key=lambda kv: jax.tree_util.keystr(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(got_sub),
                   key=lambda kv: jax.tree_util.keystr(kv[0]))):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(ka))


def test_prologue_train_grads():
    m = _model()
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3)),
                    jnp.float32)

    def loss(params, pro: bool):
        v = {"params": params, "batch_stats": m.variables["batch_stats"]}
        if pro:
            y, _ = prologue_train(v, x, jnp.float32, m.prologue_meta)
            feats, _ = m.graph.apply(v, y, train=True, start_at=5,
                                     full_input_h=64, mutable=["batch_stats"])
        else:
            feats, _ = m.graph.apply(v, x, train=True,
                                     mutable=["batch_stats"])
        return sum(jnp.sum(f * f) for f in feats)

    g_ref = jax.grad(lambda p: loss(p, False))(m.variables["params"])
    g_pro = jax.grad(lambda p: loss(p, True))(m.variables["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pro = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_pro)}
    for k, a in flat_ref:
        b = flat_pro[jax.tree_util.keystr(k)]
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-3,
                                   err_msg=jax.tree_util.keystr(k))
