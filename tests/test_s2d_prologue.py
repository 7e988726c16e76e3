"""Parity of the blocked shallow-prologue rewrite (ops/s2d_prologue.py).

The rewrite must be EXACT (f32) vs the module path: same scatter-map
argument as the stem pair (tests/test_s2d_stem.py), extended over rows 2-4
(blocked C3k2, blocked stride-2 conv). Random weights + random input so
the equality is structural, not data luck.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.models.model import DetectionModel

CFG = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 2, "C3k2", [64, False, 0.25]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 2, "C3k2", [128, False, 0.25]],
        [-1, 1, "Conv", [128, 3, 2]],
    ],
    "head": [[[4, 5], 1, "Detect", ["nc"]]],
}


@pytest.fixture(scope="module")
def model():
    m = DetectionModel(CFG, dtype=jnp.float32)
    m.init(jax.random.PRNGKey(3), imgsz=64)
    # randomize batch_stats so BN folding is exercised non-trivially
    r = np.random.default_rng(0)
    bs = jax.tree.map(
        lambda v: jnp.asarray(r.random(v.shape, np.float32) * 0.5 + 0.3),
        m.variables["batch_stats"])
    m.variables = {"params": m.variables["params"], "batch_stats": bs}
    return m


def test_eligible(model):
    assert model.prologue_meta is not None


def test_prologue_matches_module_path(model, monkeypatch):
    from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_infer

    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3), np.float32))
    # reference: module path rows 0-4 (graph truncated via direct apply)
    y_ref, _ = model.graph.apply(model.variables, x, train=False)
    y_pro = prologue_infer(model.variables, x, jnp.float32, model.prologue_meta)
    y_full = model.graph.apply(model.variables, y_pro, train=False,
                               start_at=5, full_input_h=x.shape[1])[0]
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_apply_dispatches_prologue(model, monkeypatch):
    monkeypatch.setenv("YAT_PROLOGUE", "1")
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3), np.float32))
    y_on = model.apply(model.variables, x, train=False)[0]
    monkeypatch.setenv("YAT_PROLOGUE", "0")
    monkeypatch.setenv("YAT_STEM_S2D", "0")
    y_off = model.apply(model.variables, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=2e-4, atol=2e-5)


def test_row4_intermediate_exact(model):
    """Row-4 output itself (the savelist tensor the neck reuses)."""
    from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_infer

    x = jnp.asarray(np.random.default_rng(4).random((2, 64, 64, 3), np.float32))
    y_pro = prologue_infer(model.variables, x, jnp.float32, model.prologue_meta)

    # module path row-4 intermediate via a truncated graph
    sub = {"nc": 3, "backbone": CFG["backbone"][:5], "head": []}
    m2 = DetectionModel(sub, dtype=jnp.float32)
    m2.init(jax.random.PRNGKey(0), imgsz=64)
    vars2 = {
        "params": {k: model.variables["params"][k] for k in
                   ("modules_0", "modules_1", "modules_2", "modules_3", "modules_4")},
        "batch_stats": {k: model.variables["batch_stats"][k] for k in
                        ("modules_0", "modules_1", "modules_2", "modules_3", "modules_4")},
    }
    y_ref = m2.graph.apply(vars2, x, train=False)
    np.testing.assert_allclose(np.asarray(y_pro), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_rows4_dispatch_parity(model, monkeypatch):
    """upto=4 variant (unblock before row 4) through the facade dispatch."""
    import numpy as _np

    monkeypatch.setenv("YAT_PROLOGUE", "1")
    monkeypatch.setenv("YAT_PROLOGUE_ROWS", "4")
    x = jnp.asarray(_np.random.default_rng(7).random((1, 64, 64, 3), _np.float32))
    y4 = model.apply(model.variables, x, train=False)[0]
    monkeypatch.setenv("YAT_PROLOGUE", "0")
    monkeypatch.setenv("YAT_STEM_S2D", "0")
    y_off = model.apply(model.variables, x, train=False)[0]
    _np.testing.assert_allclose(_np.asarray(y4), _np.asarray(y_off),
                                rtol=2e-4, atol=2e-5)


def test_dispatch_falls_back_on_8_not_16_size(model, monkeypatch):
    """Guard regression (ADVICE r4): the blocked stride-2 row-3 conv needs
    H, W % 16 == 0 for exactness (at 40px it yields a 6x6 row-4 map vs the
    module path's 5x5). The facade dispatch must fall back, not silently
    return different detections."""
    monkeypatch.setenv("YAT_PROLOGUE", "1")
    monkeypatch.setenv("YAT_STEM_S2D", "0")
    x = jnp.asarray(np.random.default_rng(9).random((1, 40, 40, 3), np.float32))
    y_on = model.apply(model.variables, x, train=False)[0]
    monkeypatch.setenv("YAT_PROLOGUE", "0")
    y_off = model.apply(model.variables, x, train=False)[0]
    assert y_on.shape == y_off.shape
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=2e-4, atol=2e-5)


def test_train_step_falls_back_on_8_not_16_size(model):
    """Same guard on the train path (train/step.py use_prologue)."""
    import optax

    from yolo_ad_refine_tpu.train.loss import DetectionLoss
    from yolo_ad_refine_tpu.train.step import TrainState, make_train_step

    strides = [8, 16]
    loss_fn = DetectionLoss(nc=3, strides=strides)
    tx = optax.sgd(0.0)
    rng = jax.random.PRNGKey(0)
    batch = {
        "img": jnp.asarray(
            np.random.default_rng(11).random((2, 40, 40, 3), np.float32)),
        "cls": jnp.zeros((2, 4, 1), jnp.float32),
        "bboxes": jnp.asarray(
            np.random.default_rng(12).random((2, 4, 4), np.float32) * 20 + 5),
        "mask": jnp.ones((2, 4, 1), jnp.float32),
    }
    batch["bboxes"] = batch["bboxes"].at[..., 2:].add(12.0)

    def run(meta):
        step = make_train_step(model.graph, loss_fn, tx,
                               prologue_meta=meta, prologue_start=5)
        st = TrainState.create(model.variables, tx)
        _, metrics = jax.jit(step)(st, batch, rng)
        return metrics

    m_on = run(model.prologue_meta)
    m_off = run(None)
    np.testing.assert_allclose(float(m_on["loss"]), float(m_off["loss"]),
                               rtol=1e-5)
