"""YOLO-NAS adapter.

Parity surface: reference models/nas/ — model.py (facade whose network
comes ENTIRELY from the external `super_gradients` package; the reference
repo contains no NAS architecture code), predict.py / val.py (postprocess:
the raw NAS output is (boxes xyxy, per-class scores) rather than the YOLO
(xywh, scores) layout — concatenate, convert, then standard NMS).

TPU-native equivalent: the postprocess is implemented here over our
fixed-shape NMS and works with ANY callable returning the NAS raw layout
(e.g. a super-gradients model exported to StableHLO and loaded through
AutoBackend). Constructing a network from the `yolo_nas_s` name needs the
super-gradients package, which this zero-egress build ships without — the
facade raises with guidance in that case, exactly mirroring the reference's
hard dependency.
"""

from __future__ import annotations

import numpy as np


def nas_postprocess(boxes_xyxy, scores, conf_thres: float = 0.25,
                    iou_thres: float = 0.45, max_det: int = 300):
    """NAS raw output -> detections (reference nas/predict.py postprocess).

    boxes_xyxy (B, N, 4), scores (B, N, nc). Returns (det (B, max_det, 6),
    counts (B,)) with rows (x1, y1, x2, y2, conf, cls).
    """
    import jax.numpy as jnp

    from yolo_ad_refine_tpu.ops.boxes import xyxy2xywh
    from yolo_ad_refine_tpu.ops.nms import non_max_suppression

    boxes = jnp.asarray(boxes_xyxy, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    pred = jnp.concatenate([xyxy2xywh(boxes), scores], axis=-1)
    det, cnt, _ = non_max_suppression(
        pred, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
        nc=scores.shape[-1],
    )
    return np.asarray(det), np.asarray(cnt)


class NAS:
    """YOLO-NAS facade (reference nas/model.py NAS)."""

    def __init__(self, model: str = "yolo_nas_s"):
        assert not str(model).endswith((".yaml", ".yml")), \
            "YOLO-NAS models only support pre-trained models."
        try:
            import super_gradients  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "YOLO-NAS networks are defined by the `super_gradients` "
                "package (the reference has no in-repo NAS architecture "
                "either); it is not part of this build. Export a NAS model "
                "to StableHLO/TFLite elsewhere and run it through "
                "nn.autobackend.AutoBackend + models.nas.nas_postprocess."
            ) from e
        self.model_name = model  # pragma: no cover - super_gradients absent
