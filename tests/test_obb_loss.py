"""OBB loss tests: rotated candidate test, rotated TAL, loss grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.train.obb import OBBLoss, select_candidates_in_rotated_gts

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

TINY_OBB = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "OBB", ["nc", 1]]],
}


class TestRotatedCandidates:
    def test_axis_aligned_box(self):
        anc = jnp.asarray([[10.0, 10.0], [30.0, 30.0], [5.0, 25.0]])
        gt = jnp.asarray([[[10.0, 10.0, 10.0, 10.0, 0.0]]])  # box around (10,10)
        inside = np.asarray(select_candidates_in_rotated_gts(anc, gt))[0, 0]
        assert inside.tolist() == [True, False, False]

    def test_rotated_box(self):
        # a thin box rotated 45deg: point along the diagonal is inside,
        # the same distance along x is outside
        gt = jnp.asarray([[[20.0, 20.0, 20.0, 4.0, np.pi / 4]]])
        d = 5.0 / np.sqrt(2)
        anc = jnp.asarray([[20.0 + d, 20.0 + d], [25.0, 20.0]])
        inside = np.asarray(select_candidates_in_rotated_gts(anc, gt))[0, 0]
        assert inside[0] and not inside[1]


def test_obb_loss_finite_and_grads():
    from yolo_ad_refine_tpu.models.model import build_detection_model

    m = build_detection_model(TINY_OBB, nc=2, imgsz=64)
    r = np.random.default_rng(0)
    img = jnp.asarray(r.random((2, 64, 64, 3), dtype=np.float32))
    labels = jnp.asarray(r.integers(0, 2, (2, 4, 1)).astype(np.float32))
    cxy = r.uniform(12, 50, (2, 4, 2))
    wh = r.uniform(8, 20, (2, 4, 2))
    ang = r.uniform(-0.5, 0.5, (2, 4, 1))
    rboxes = jnp.asarray(np.concatenate([cxy, wh, ang], -1).astype(np.float32))
    mask = jnp.ones((2, 4, 1))
    loss_fn = OBBLoss(nc=2, strides=m.strides)

    def f(params):
        preds = m.graph.apply(
            {"params": params, "batch_stats": m.variables.get("batch_stats", {})},
            img, train=True, rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )[0]
        out = loss_fn(preds, labels, rboxes, mask)
        return out.total, out.components

    (total, comps), grads = jax.value_and_grad(f, has_aux=True)(m.variables["params"])
    assert np.isfinite(float(total)) and float(total) > 0
    assert np.isfinite(np.asarray(comps)).all()
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
