"""Head-family forward-contract tests: Segment, Pose, OBB share Detect's
decode machinery (reference head.py:164,189,219)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_ad_refine_tpu.models.model import build_detection_model

BACKBONE = [
    [-1, 1, "Conv", [16, 3, 2]],
    [-1, 1, "Conv", [32, 3, 2]],
    [-1, 1, "Conv", [64, 3, 2]],   # 2 P3/8
    [-1, 1, "Conv", [128, 3, 2]],  # 3 P4/16
    [-1, 1, "Conv", [256, 3, 2]],  # 4 P5/32
]
A64 = 64 + 16 + 4  # anchors at imgsz 64


def build(head_row, nc=3):
    return build_detection_model({"nc": nc, "backbone": BACKBONE, "head": [head_row]}, imgsz=64)


class TestSegment:
    @pytest.mark.slow
    def test_contract(self):
        m = build([[2, 3, 4], 1, "Segment", ["nc", 8, 32]])
        x = jnp.zeros((2, 64, 64, 3))
        feats, mc, proto = m(x, train=True)
        assert len(feats) == 3 and feats[0].shape == (2, 8, 8, 64 + 3)
        assert mc.shape == (2, A64, 8)
        assert proto.shape == (2, 16, 16, 8)  # 2x upsample of P3
        y, (feats, mc, proto) = m(x, train=False)
        assert y.shape == (2, A64, 4 + 3 + 8)  # box + cls + mask coeffs


class TestPose:
    @pytest.mark.slow
    def test_contract(self):
        m = build([[2, 3, 4], 1, "Pose", [1, [5, 3]]], nc=1)
        x = jnp.zeros((2, 64, 64, 3))
        feats, kpt = m(x, train=True)
        assert kpt.shape == (2, A64, 15)
        y, (feats, kpt_raw) = m(x, train=False)
        assert y.shape == (2, A64, 4 + 1 + 15)
        # decoded keypoint visibilities are sigmoided
        vis = np.asarray(y[..., 5 + 2 :: 3])
        assert (vis >= 0).all() and (vis <= 1).all()
        # decoded xy lie in image range at zero logits: (0*2 + a - .5)*s >= -s/2
        kx = np.asarray(y[..., 5::3])
        assert kx.min() >= -33 and kx.max() <= 64 + 33


class TestV10Detect:
    @pytest.mark.slow
    def test_contract(self):
        m = build([[2, 3, 4], 1, "v10Detect", ["nc"]])
        x = jnp.zeros((2, 64, 64, 3))
        out = m(x, train=True)
        assert set(out) == {"one2many", "one2one"}
        assert len(out["one2one"]) == 3
        det, raw = m(x, train=False)
        assert det.shape == (2, A64, 6)  # NMS-free top-k (max_det >= anchors here)
        # scores sorted descending
        s = np.asarray(det[0, :, 4])
        assert (np.diff(s) <= 1e-6).all()


class TestWorldDetect:
    @pytest.mark.slow
    def test_contract_with_text(self):
        m = build([[2, 3, 4], 1, "WorldDetect", ["nc", 32]])
        x = jnp.zeros((2, 64, 64, 3))
        feats = m(x, train=True)
        assert len(feats) == 3 and feats[0].shape[-1] == 64 + 3
        y, feats = m(x, train=False)
        assert y.shape == (2, A64, 4 + 3)


class TestOBB:
    @pytest.mark.slow
    def test_contract(self):
        m = build([[2, 3, 4], 1, "OBB", ["nc", 1]])
        x = jnp.zeros((2, 64, 64, 3))
        feats, angle = m(x, train=True)
        assert angle.shape == (2, A64, 1)
        a = np.asarray(angle)
        assert (a >= -np.pi / 4 - 1e-5).all() and (a <= 3 * np.pi / 4 + 1e-5).all()
        y, (feats, angle) = m(x, train=False)
        assert y.shape == (2, A64, 4 + 3 + 1)  # cxcywh + cls + angle

    def test_dist2rbox_zero_angle_matches_axis_aligned(self):
        from yolo_ad_refine_tpu.nn.head import dist2rbox
        from yolo_ad_refine_tpu.ops.anchors import dist2bbox

        r = np.random.default_rng(0)
        dist = jnp.asarray(r.uniform(0, 4, (1, 10, 4)).astype(np.float32))
        anchors = jnp.asarray(r.uniform(4, 60, (1, 10, 2)).astype(np.float32))
        rbox = dist2rbox(dist, jnp.zeros((1, 10)), anchors)
        xywh = dist2bbox(dist, anchors, xywh=True)
        np.testing.assert_allclose(np.asarray(rbox), np.asarray(xywh), atol=1e-5)
