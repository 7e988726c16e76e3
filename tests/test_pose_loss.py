"""Pose loss tests: finiteness, grads, keypoint loss formula behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.train.pose import PoseLoss, keypoint_loss

TINY_POSE = {
    "nc": 1,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "Pose", [1, [5, 3]]]],
}


def test_keypoint_loss_zero_at_exact():
    k = jnp.asarray(np.random.default_rng(0).uniform(0, 64, (4, 5, 2)).astype(np.float32))
    mask = jnp.ones((4, 5))
    area = jnp.full((4, 1), 100.0)
    sig = jnp.ones(5) / 5
    exact = float(keypoint_loss(k, k, mask, area, sig))
    off = float(keypoint_loss(k + 10.0, k, mask, area, sig))
    assert exact == pytest.approx(0.0, abs=1e-6)
    assert off > exact


@pytest.mark.slow
def test_pose_loss_finite_and_grads():
    from yolo_ad_refine_tpu.models.model import build_detection_model

    m = build_detection_model(TINY_POSE, nc=1, imgsz=64)
    r = np.random.default_rng(0)
    img = jnp.asarray(r.random((2, 64, 64, 3), dtype=np.float32))
    labels = jnp.zeros((2, 4, 1))
    xy = r.uniform(8, 30, (2, 4, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + 20], -1).astype(np.float32))
    mask = jnp.ones((2, 4, 1))
    kpts = jnp.asarray(
        np.concatenate([r.uniform(10, 50, (2, 4, 5, 2)), np.ones((2, 4, 5, 1))], -1).astype(np.float32)
    )
    loss_fn = PoseLoss(nc=1, strides=m.strides, kpt_shape=(5, 3), max_fg=32)

    def f(params):
        preds = m.graph.apply(
            {"params": params, "batch_stats": m.variables.get("batch_stats", {})},
            img, train=True, rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )[0]
        out = loss_fn(preds, labels, boxes, mask, kpts)
        return out.total, out.components

    (total, comps), grads = jax.value_and_grad(f, has_aux=True)(m.variables["params"])
    assert np.isfinite(float(total))
    comps = np.asarray(comps)
    assert np.isfinite(comps).all() and comps[1] > 0  # kpt location loss present
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
