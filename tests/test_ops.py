"""Unit tests for the L1 geometry library (parity with reference utils/ops, tal, metrics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops import (
    bbox_iou,
    bbox2dist,
    box_iou,
    clip_boxes,
    dist2bbox,
    ltwh2xyxy,
    make_anchors,
    non_max_suppression,
    scale_boxes,
    wasserstein_similarity,
    xywh2xyxy,
    xyxy2xywh,
)


def random_boxes(n, lo=0, hi=100, seed=0):
    r = np.random.default_rng(seed)
    xy = r.uniform(lo, hi - 20, (n, 2))
    wh = r.uniform(1, 20, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


class TestConversions:
    def test_xywh_roundtrip(self):
        b = random_boxes(50)
        out = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(b))))
        np.testing.assert_allclose(out, b, atol=1e-4)

    def test_xywh2xyxy_known(self):
        b = jnp.array([[10.0, 10.0, 4.0, 6.0]])
        np.testing.assert_allclose(np.asarray(xywh2xyxy(b)), [[8, 7, 12, 13]], atol=1e-6)

    def test_ltwh2xyxy(self):
        b = jnp.array([[5.0, 5.0, 10.0, 20.0]])
        np.testing.assert_allclose(np.asarray(ltwh2xyxy(b)), [[5, 5, 15, 25]], atol=1e-6)

    def test_clip(self):
        b = jnp.array([[-5.0, -5.0, 200.0, 300.0]])
        np.testing.assert_allclose(np.asarray(clip_boxes(b, (100, 150))), [[0, 0, 150, 100]])

    def test_scale_boxes(self):
        # 640-letterboxed from a 480x640 original: gain 1.0, pad (0, 80)
        boxes = jnp.array([[0.0, 80.0, 640.0, 560.0]])
        out = np.asarray(scale_boxes((640, 640), boxes, (480, 640)))
        np.testing.assert_allclose(out, [[0, 0, 640, 480]], atol=1.0)


class TestIoU:
    def test_identity(self):
        b = jnp.asarray(random_boxes(10))
        np.testing.assert_allclose(np.asarray(bbox_iou(b, b, xywh=False)), 1.0, atol=1e-5)

    def test_disjoint(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.array([[20.0, 20.0, 30.0, 30.0]])
        assert float(bbox_iou(a, b, xywh=False).squeeze()) == pytest.approx(0.0, abs=1e-6)

    def test_half_overlap(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.array([[0.0, 0.0, 5.0, 10.0]])
        assert float(bbox_iou(a, b, xywh=False).squeeze()) == pytest.approx(0.5, abs=1e-5)

    def test_ciou_le_iou(self):
        a = jnp.asarray(random_boxes(30, seed=1))
        b = jnp.asarray(random_boxes(30, seed=2))
        iou = np.asarray(bbox_iou(a, b, xywh=False))
        ciou = np.asarray(bbox_iou(a, b, xywh=False, CIoU=True))
        assert (ciou <= iou + 1e-5).all()

    def test_ciou_identity(self):
        b = jnp.asarray(random_boxes(10))
        np.testing.assert_allclose(np.asarray(bbox_iou(b, b, xywh=False, CIoU=True)), 1.0, atol=1e-4)

    def test_box_iou_matrix(self):
        a = jnp.asarray(random_boxes(5, seed=3))
        m = np.asarray(box_iou(a, a))
        np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
        assert m.shape == (5, 5)

    def test_wasserstein(self):
        b = jnp.asarray(random_boxes(10))
        sim = np.asarray(wasserstein_similarity(b, b))
        # identical boxes: W2 ~ eps -> sim ~ 1
        np.testing.assert_allclose(sim, 1.0, atol=1e-3)
        far = b + 100.0
        assert (np.asarray(wasserstein_similarity(b, far)) < 0.1).all()


class TestAnchors:
    def test_make_anchors(self):
        pts, strides = make_anchors([(4, 4), (2, 2)], [8, 16])
        assert pts.shape == (20, 2) and strides.shape == (20, 1)
        np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
        np.testing.assert_allclose(np.asarray(pts[1]), [1.5, 0.5])  # x varies fastest
        np.testing.assert_allclose(np.asarray(strides[:16]), 8.0)
        np.testing.assert_allclose(np.asarray(strides[16:]), 16.0)

    def test_dist_bbox_roundtrip(self):
        pts, _ = make_anchors([(8, 8)], [8])
        r = np.random.default_rng(0)
        dist = jnp.asarray(r.uniform(0, 5, (1, 64, 4)).astype(np.float32))
        boxes = dist2bbox(dist, pts[None], xywh=False)
        back = bbox2dist(pts[None], boxes, 16)
        np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-4)


def nms_numpy(boxes, scores, iou_thres):
    """Naive greedy NMS reference."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + area - inter + 1e-7)
        suppressed |= iou > iou_thres
        suppressed[i] = True  # processed
    return keep


class TestNMS:
    def test_against_numpy(self):
        r = np.random.default_rng(42)
        n, nc = 200, 3
        boxes_xyxy = random_boxes(n, seed=42)
        scores = r.uniform(0, 1, (n, nc)).astype(np.float32) ** 3
        pred = np.concatenate([np.asarray(xyxy2xywh(jnp.asarray(boxes_xyxy))), scores], -1)
        det, cnt, _ = non_max_suppression(
            jnp.asarray(pred[None]), conf_thres=0.25, iou_thres=0.45, max_det=200,
            max_nms=256, nc=nc,
        )
        det, cnt = np.asarray(det[0]), int(cnt[0])

        # numpy reference with class offsets
        conf = scores.max(-1)
        cls = scores.argmax(-1)
        m = conf > 0.25
        idx = np.nonzero(m)[0]
        off_boxes = boxes_xyxy[idx] + (cls[idx] * 7680.0)[:, None].repeat(4, 1)
        keep = nms_numpy(off_boxes, conf[idx], 0.45)
        ref_ids = idx[np.asarray(keep)]
        assert cnt == len(ref_ids)
        np.testing.assert_allclose(det[:cnt, 4], np.sort(conf[ref_ids])[::-1], atol=1e-5)
        ref_boxes = boxes_xyxy[ref_ids[np.argsort(-conf[ref_ids])]]
        np.testing.assert_allclose(det[:cnt, :4], ref_boxes, atol=1e-3)

    def test_conf_filter(self):
        pred = np.zeros((1, 10, 4 + 2), np.float32)
        pred[0, :, :4] = [50, 50, 10, 10]
        pred[0, 0, 4] = 0.9
        det, cnt, _ = non_max_suppression(jnp.asarray(pred), conf_thres=0.5, max_nms=16, max_det=5, nc=2)
        assert int(cnt[0]) == 1
        assert float(det[0, 0, 4]) == pytest.approx(0.9, abs=1e-5)
        np.testing.assert_allclose(np.asarray(det[0, 1:]), 0.0)

    def test_multilabel(self):
        pred = np.zeros((1, 4, 4 + 2), np.float32)
        pred[0, 0, :4] = [50, 50, 10, 10]
        pred[0, 0, 4] = 0.9
        pred[0, 0, 5] = 0.8  # same box, second class above threshold
        det, cnt, _ = non_max_suppression(
            jnp.asarray(pred), conf_thres=0.5, max_nms=8, max_det=5, nc=2, multi_label=True
        )
        assert int(cnt[0]) == 2  # both classes survive (class-offset boxes don't overlap)


class TestDeform:
    def test_zero_offset_equals_conv(self):
        from yolo_ad_refine_tpu.ops.deform import modulated_deform_conv2d

        r = np.random.default_rng(0)
        x = jnp.asarray(r.normal(size=(2, 8, 8, 4)).astype(np.float32))
        w = jnp.asarray(r.normal(size=(3, 3, 4, 6)).astype(np.float32))
        offset = jnp.zeros((2, 8, 8, 18), jnp.float32)
        mask = jnp.ones((2, 8, 8, 9), jnp.float32)
        out = modulated_deform_conv2d(x, offset, mask, w)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_integer_shift(self):
        from yolo_ad_refine_tpu.ops.deform import modulated_deform_conv2d

        r = np.random.default_rng(1)
        x = jnp.asarray(r.normal(size=(1, 6, 6, 2)).astype(np.float32))
        # identity kernel on center tap only
        w = np.zeros((3, 3, 2, 2), np.float32)
        w[1, 1] = np.eye(2)
        offset = np.zeros((1, 6, 6, 18), np.float32)
        offset[..., 2 * 4 + 1] = 1.0  # center tap dx=+1 -> sample right neighbor
        mask = jnp.ones((1, 6, 6, 9), jnp.float32)
        out = modulated_deform_conv2d(x, jnp.asarray(offset), mask, jnp.asarray(w))
        # default matmul precision may run the channel contraction in bf16
        # (TPU-parity semantics; the torch reference runs the head under AMP)
        np.testing.assert_allclose(np.asarray(out[0, :, :-1]), np.asarray(x[0, :, 1:]), atol=2e-2)
        np.testing.assert_allclose(np.asarray(out[0, :, -1]), 0.0, atol=1e-6)  # zero pad

    def test_mask_scaling(self):
        from yolo_ad_refine_tpu.ops.deform import modulated_deform_conv2d

        r = np.random.default_rng(2)
        x = jnp.asarray(r.normal(size=(1, 5, 5, 3)).astype(np.float32))
        w = jnp.asarray(r.normal(size=(3, 3, 3, 4)).astype(np.float32))
        offset = jnp.zeros((1, 5, 5, 18), jnp.float32)
        half = modulated_deform_conv2d(x, offset, jnp.full((1, 5, 5, 9), 0.5), w)
        full = modulated_deform_conv2d(x, offset, jnp.ones((1, 5, 5, 9)), w)
        np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5, atol=1e-5)
