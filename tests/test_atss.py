"""ATSS assigner + probiou tests (§2.3 alternative assigner, L1 probiou)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.iou import batch_probiou, probiou
from yolo_ad_refine_tpu.train.atss import ATSSAssigner, generate_cell_anchors

STRIDES = (8, 16, 32)
IMGSZ = 64


class TestProbIoU:
    def test_identity(self):
        obb = jnp.asarray([[10.0, 10.0, 8.0, 4.0, 0.3]])
        v = float(probiou(obb, obb).squeeze())
        assert v == pytest.approx(1.0, abs=0.02)

    def test_disjoint_low(self):
        a = jnp.asarray([[10.0, 10.0, 4.0, 4.0, 0.0]])
        b = jnp.asarray([[50.0, 50.0, 4.0, 4.0, 0.0]])
        assert float(probiou(a, b).squeeze()) < 0.05

    def test_rotation_invariance_of_identity(self):
        # same box rotated by pi is the same Gaussian
        a = jnp.asarray([[10.0, 10.0, 8.0, 4.0, 0.2]])
        b = jnp.asarray([[10.0, 10.0, 8.0, 4.0, 0.2 + np.pi]])
        assert float(probiou(a, b).squeeze()) == pytest.approx(1.0, abs=0.02)

    def test_batch_matrix(self):
        r = np.random.default_rng(0)
        o1 = jnp.asarray(np.c_[r.uniform(10, 50, (4, 2)), r.uniform(4, 10, (4, 2)),
                               r.uniform(-1, 1, (4, 1))].astype(np.float32))
        m = np.asarray(batch_probiou(o1, o1))
        assert m.shape == (4, 4)
        np.testing.assert_allclose(np.diag(m), 1.0, atol=0.02)


class TestATSS:
    @pytest.mark.slow
    def test_obvious_assignment(self):
        shapes = [(IMGSZ // s, IMGSZ // s) for s in STRIDES]
        anchors, counts = generate_cell_anchors(shapes, STRIDES)
        a = anchors.shape[0]
        gt = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])
        labels = jnp.asarray([[[1.0]]])
        mask = jnp.ones((1, 1, 1))
        pd = jnp.tile(gt, (1, a, 1))  # perfect predictions

        res = ATSSAssigner(topk=9, num_classes=3)(anchors, counts, labels, gt, mask, pd[:, :a])
        fg = np.asarray(res.fg_mask[0])
        assert fg.sum() > 0
        centers = np.asarray((anchors[:, :2] + anchors[:, 2:]) / 2)
        inside = ((centers > 8) & (centers < 40)).all(-1)
        assert not fg[~inside].any()
        assert (np.asarray(res.target_labels[0])[fg] == 1).all()
        # soft scores scaled by prediction IoU (=1 here)
        assert np.asarray(res.target_scores[0])[fg].max() == pytest.approx(1.0, abs=1e-3)

    @pytest.mark.slow
    def test_empty_gt(self):
        shapes = [(IMGSZ // s, IMGSZ // s) for s in STRIDES]
        anchors, counts = generate_cell_anchors(shapes, STRIDES)
        a = anchors.shape[0]
        res = ATSSAssigner(num_classes=3)(
            anchors, counts, jnp.zeros((1, 2, 1)), jnp.zeros((1, 2, 4)),
            jnp.zeros((1, 2, 1)), jnp.zeros((1, a, 4)),
        )
        assert not bool(res.fg_mask.any())


def test_loss_with_atss_assigner():
    from yolo_ad_refine_tpu.train.loss import DetectionLoss

    r = np.random.default_rng(0)
    feats = [jnp.asarray(r.normal(0, 0.5, (2, IMGSZ // s, IMGSZ // s, 64 + 3)).astype(np.float32))
             for s in STRIDES]
    labels = jnp.asarray(r.integers(0, 3, (2, 4, 1)).astype(np.float32))
    xy = r.uniform(4, 30, (2, 4, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + r.uniform(8, 20, (2, 4, 2))], -1).astype(np.float32))
    mask = jnp.ones((2, 4, 1))
    loss_fn = DetectionLoss(nc=3, strides=STRIDES, assigner="atss")
    out = jax.jit(lambda f: loss_fn(f, labels, boxes, mask).total)(feats)
    assert np.isfinite(float(out))
