"""FastSAM prompt engine + NAS adapter tests.

Parity surface: reference models/fastsam/{predict,utils}.py prompt/selection
logic and models/nas/predict.py raw-output postprocess (reference
fastsam/predict.py:28-117, nas/predict.py).
"""

import numpy as np
import pytest

from yolo_ad_refine_tpu.engine.results import Results
from yolo_ad_refine_tpu.models.fastsam import (
    FastSAM,
    adjust_bboxes_to_image_border,
)


def seg_results(boxes, masks, shape=(100, 100)):
    img = np.zeros((*shape, 3), np.uint8)
    return Results(img, "f.jpg", {0: "object"},
                   np.asarray(boxes, np.float32),
                   masks=np.asarray(masks, np.float32))


def _fastsam_stub():
    """A FastSAM with the prompt machinery but no built model (prompt() and
    _take are pure host-side logic)."""
    return FastSAM.__new__(FastSAM)


class TestBorderSnap:
    def test_snap(self):
        b = np.asarray([[5.0, 30, 60, 70], [30, 30, 95, 85]], np.float32)
        out = adjust_bboxes_to_image_border(b, (100, 100), threshold=20)
        assert out[0, 0] == 0          # x1 within 20px -> snapped to 0
        assert out[1, 2] == 100        # x2 within 20px of w -> snapped
        assert out[0, 1] == 30         # untouched


class TestPrompts:
    def _three_instances(self):
        masks = np.zeros((3, 100, 100), np.float32)
        masks[0, 10:30, 10:30] = 1    # top-left blob
        masks[1, 60:90, 60:90] = 1    # bottom-right blob
        masks[2, 10:30, 60:90] = 1    # top-right blob
        boxes = [[10, 10, 30, 30, 0.9, 0], [60, 60, 90, 90, 0.8, 0],
                 [60, 10, 90, 30, 0.7, 0]]
        return seg_results(boxes, masks)

    def test_bbox_prompt_selects_best_iou(self):
        r = self._three_instances()
        out = _fastsam_stub().prompt([r], bboxes=[[8, 8, 32, 32]])
        assert len(out[0]) == 1
        assert np.allclose(out[0].boxes.xyxy[0], [10, 10, 30, 30])

    def test_point_prompt_foreground(self):
        r = self._three_instances()
        out = _fastsam_stub().prompt([r], points=[[75, 75]])
        assert len(out[0]) == 1
        assert np.allclose(out[0].boxes.xyxy[0], [60, 60, 90, 90])

    def test_point_prompt_background_drops(self):
        r = self._three_instances()
        # fg point in blob 0 and bg point in blob 1 -> only blob 0 kept
        out = _fastsam_stub().prompt([r], points=[[20, 20], [75, 75]],
                                     labels=[1, 0])
        assert len(out[0]) == 1
        assert np.allclose(out[0].boxes.xyxy[0], [10, 10, 30, 30])

    def test_no_prompt_passthrough(self):
        r = self._three_instances()
        out = _fastsam_stub().prompt([r])
        assert out[0] is r

    def test_text_prompt_gated(self):
        r = self._three_instances()
        with pytest.raises((ImportError, NotImplementedError)):
            _fastsam_stub().prompt([r], texts="a red square")


class TestNAS:
    def test_postprocess_raw_layout(self):
        from yolo_ad_refine_tpu.models.nas import nas_postprocess

        boxes = np.zeros((1, 4, 4), np.float32)
        boxes[0, 0] = [10, 10, 50, 50]
        boxes[0, 1] = [12, 12, 52, 52]   # overlaps 0 -> suppressed
        boxes[0, 2] = [70, 70, 90, 90]
        boxes[0, 3] = [0, 0, 5, 5]       # below conf
        scores = np.zeros((1, 4, 3), np.float32)
        scores[0, 0, 1] = 0.9
        scores[0, 1, 1] = 0.6
        scores[0, 2, 2] = 0.8
        scores[0, 3, 0] = 0.1
        det, cnt = nas_postprocess(boxes, scores, conf_thres=0.25,
                                   iou_thres=0.45)
        assert int(cnt[0]) == 2
        kept = det[0, : int(cnt[0])]
        np.testing.assert_allclose(kept[0, :4], [10, 10, 50, 50], atol=0.1)
        assert kept[0, 5] == 1 and kept[1, 5] == 2

    def test_facade_gated_without_super_gradients(self):
        from yolo_ad_refine_tpu.models.nas import NAS

        with pytest.raises(ImportError, match="super_gradients"):
            NAS("yolo_nas_s")
