"""Tensor ops & geometry (parity with reference ultralytics/utils/{ops,tal,metrics}.py L1 layer).

Everything here is pure jax.numpy with static shapes — safe under jit.
"""

from yolo_ad_refine_tpu.ops.boxes import (
    clip_boxes,
    ltwh2xyxy,
    ltwh2xywh,
    scale_boxes,
    xywh2ltwh,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
    xyxy2xywhn,
)
from yolo_ad_refine_tpu.ops.iou import bbox_iou, box_iou, wasserstein_similarity
from yolo_ad_refine_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from yolo_ad_refine_tpu.ops.nms import non_max_suppression

__all__ = [
    "clip_boxes", "scale_boxes", "xywh2xyxy", "xyxy2xywh", "xywhn2xyxy", "xyxy2xywhn",
    "ltwh2xyxy", "ltwh2xywh", "xywh2ltwh", "xyxy2ltwh",
    "bbox_iou", "box_iou", "wasserstein_similarity",
    "make_anchors", "dist2bbox", "bbox2dist",
    "non_max_suppression",
]
