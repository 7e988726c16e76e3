"""Parity: the fused AYHead eval rewrite == the module path.

ops/ayhead_fused.py recomputes AYHead's eval forward with the cls/reg twin
branches packed into 128-lane ops (block-diagonal weight concats, one
GN(32) for the decomp pair). All transforms are exact up to zero-block
matmul terms, so fp32 parity must be near float-rounding; bf16 parity
within normal bf16 re-rounding of reassociated elementwise order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.nn.head import AYHead
from yolo_ad_refine_tpu.ops.ayhead_fused import ayhead_fused_eval


def _mk(dtype, nc=17, tc=64, b=2, s=16):
    mod = AYHead(nc=nc, ch=(2 * tc, 2 * tc, 2 * tc), dtype=dtype)
    r = np.random.default_rng(0)
    feats = [jnp.asarray(r.standard_normal((b, s * k, s * k, 2 * tc)), dtype)
             for k in (4, 2, 1)]
    v = mod.init(jax.random.PRNGKey(0), feats, train=False, input_h=s * 32)
    # perturb params so gates/GN are far from init symmetry
    leaves, tree = jax.tree.flatten(v["params"])
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    v = {"params": jax.tree.unflatten(tree, leaves),
         **{k: v[k] for k in v if k != "params"}}
    return mod, v, feats, s * 32


@pytest.mark.parametrize("dtype,tol_y,tol_f", [
    (jnp.float32, 2e-4, 2e-4),
    (jnp.bfloat16, 0.15, 0.08),
])
def test_fused_matches_module(dtype, tol_y, tol_f):
    mod, v, feats, input_h = _mk(dtype)
    y_ref, outs_ref = mod.apply(v, feats, train=False, input_h=input_h)
    hv = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    y_f, outs_f = ayhead_fused_eval(hv, feats, mod.nc, mod.reg_max,
                                    input_h, dtype)
    for a, b in zip(outs_ref, outs_f):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=tol_f)
    # decoded: boxes are in pixels (up to input_h scale) — relative tol
    np.testing.assert_allclose(np.asarray(y_f, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=tol_y)


def test_facade_dispatch_parity():
    """Full flagship model: fused path (env-forced) == module path on CPU."""
    import os

    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.float32, imgsz=128)
    x = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3)),
                    jnp.float32)
    old = os.environ.get("YAT_HEAD_FUSED")
    try:
        os.environ["YAT_HEAD_FUSED"] = "0"
        y0, f0 = model.apply(model.variables, x, train=False)
        os.environ["YAT_HEAD_FUSED"] = "1"
        y1, f1 = model.apply(model.variables, x, train=False)
    finally:
        if old is None:
            os.environ.pop("YAT_HEAD_FUSED", None)
        else:
            os.environ["YAT_HEAD_FUSED"] = old
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-3, atol=2e-4)
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
