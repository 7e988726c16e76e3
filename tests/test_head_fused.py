"""Parity: the fused AYHead rewrite == the module path (fwd, grad, facade).

ops/ayhead_fused.py recomputes AYHead's forward with the cls/reg twin
branches packed into 128-lane ops (block-diagonal weight concats, one
GN(32) for the decomp pair). AYHead dispatches to it internally
(YAT_HEAD_FUSED) for BOTH train and eval, so gradient parity matters as
much as forward parity. All transforms are exact up to zero-block matmul
terms, so fp32 parity must be near float-rounding; bf16 within normal
bf16 re-rounding of reassociated elementwise order.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.nn.head import AYHead

pytestmark = pytest.mark.parity  # production graph semantics: PR parity tier


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


class _fused:
    def __init__(self, on): self.on = "1" if on else "0"

    def __enter__(self):
        self.old = os.environ.get("YAT_HEAD_FUSED")
        os.environ["YAT_HEAD_FUSED"] = self.on

    def __exit__(self, *a):
        if self.old is None:
            os.environ.pop("YAT_HEAD_FUSED", None)
        else:
            os.environ["YAT_HEAD_FUSED"] = self.old


@pytest.mark.parametrize("dtype,tol_y,tol_f", [
    (jnp.float32, 2e-4, 2e-4),
    (jnp.bfloat16, 0.15, 0.08),
])
def test_fused_matches_module_eval(dtype, tol_y, tol_f):
    mod, v, feats, input_h = _mk(dtype)
    with _fused(False):
        y_ref, outs_ref = mod.apply(v, feats, train=False, input_h=input_h)
    with _fused(True):
        y_f, outs_f = mod.apply(v, feats, train=False, input_h=input_h)
    for a, b in zip(outs_ref, outs_f):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=tol_f)
    np.testing.assert_allclose(np.asarray(y_f, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=tol_y)


def test_fused_grad_parity():
    """d(sum of outputs)/d(params) matches between paths at fp32, and the
    dcn_offset_max diagnostic still sows."""
    mod, v, feats, input_h = _mk(jnp.float32)

    def loss(params, fused):
        with _fused(fused):
            outs, mut = mod.apply(
                {"params": params, **{k: v[k] for k in v if k != "params"}},
                feats, train=True, mutable=["diagnostics", "batch_stats"])
        w = [1.0, 0.7, 1.3]
        return sum(wi * jnp.sum(o * o) for wi, o in zip(w, outs)), mut

    (l0, m0), g0 = jax.value_and_grad(loss, has_aux=True)(v["params"], False)
    (l1, m1), g1 = jax.value_and_grad(loss, has_aux=True)(v["params"], True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    d0 = jax.tree.leaves(m0["diagnostics"])[0]
    d1 = jax.tree.leaves(m1["diagnostics"])[0]
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): x
             for k, x in jax.tree_util.tree_leaves_with_path(g1)}
    gmax = max(float(np.max(np.abs(x))) for x in jax.tree.leaves(g0))
    for k, a in flat0:
        b = flat1[jax.tree_util.keystr(k)]
        m = max(float(np.max(np.abs(a))), float(np.max(np.abs(b))))
        if m < 1e-5 * gmax:
            # algebraically-zero gradients (e.g. a conv bias feeding a
            # train-mode BN, which is shift-invariant): both paths return
            # pure cancellation noise — only require both to be negligible
            continue
        scale = max(1.0, m)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-3,
            err_msg=jax.tree_util.keystr(k))


def test_facade_dispatch_parity():
    """Full flagship model: fused path (env-forced) == module path on CPU."""
    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.float32, imgsz=128)
    x = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3)),
                    jnp.float32)
    with _fused(False):
        y0, f0 = model.apply(model.variables, x, train=False)
    with _fused(True):
        y1, f1 = model.apply(model.variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-3, atol=2e-4)
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
