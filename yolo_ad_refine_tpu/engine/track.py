"""Tracking entry: detection stream -> BYTETracker/BOTSORT per frame.

Parity surface: reference trackers/track.py (on_predict_start tracker
registration + postprocess hook) and Model.track (engine/model.py:556).
Each frame runs the compiled bs=1 forward+NMS; track rows extend detections
with a track id column ((n, 7): x1,y1,x2,y2,id,conf,cls in Results).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.data.augment import letterbox
from yolo_ad_refine_tpu.data.loaders import load_inference_source
from yolo_ad_refine_tpu.engine.results import Results
from yolo_ad_refine_tpu.ops.boxes import scale_boxes
from yolo_ad_refine_tpu.ops.nms import non_max_suppression
from yolo_ad_refine_tpu.trackers import TRACKER_MAP
from yolo_ad_refine_tpu.utils import LOGGER


def track(model, source, tracker: str = "bytetrack", imgsz: int = 640, conf: float = 0.25,
          iou: float = 0.7, max_det: int = 300, names: dict | None = None,
          persist: bool = False, vid_stride: int = 1, tracker_args: dict | None = None):
    """Run tracking over a source. Returns list[Results] with track ids."""
    assert tracker in TRACKER_MAP, f"tracker must be one of {sorted(TRACKER_MAP)}"
    trk = TRACKER_MAP[tracker](**(tracker_args or {}))
    names = names or getattr(model, "names", None) or {i: f"class{i}" for i in range(model.nc)}
    variables = model.variables

    @jax.jit
    def forward_nms(img):
        x = img.astype(model.dtype) / 255.0
        y, _ = model.apply(variables, x, train=False)
        return non_max_suppression(y, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=model.nc)[:2]

    results = []
    for path, frame, meta in load_inference_source(source, vid_stride):
        im, ratio, pad = letterbox(frame, imgsz, scaleup=True)
        batch = np.ascontiguousarray(im[None, ..., ::-1])
        det, cnt = jax.device_get(forward_nms(jnp.asarray(batch)))
        n = int(cnt[0])
        d = np.array(det[0, :n])
        if n:
            d[:, :4] = np.asarray(
                scale_boxes((imgsz, imgsz), jnp.asarray(d[:, :4]), frame.shape[:2],
                            ratio_pad=(ratio, pad))
            )
        tracks = trk.update(d[:, :4], d[:, 4], d[:, 5], img=frame)  # (m, 8)
        if len(tracks):
            # [x1,y1,x2,y2,id,conf,cls] rows
            boxes = tracks[:, [0, 1, 2, 3, 4, 5, 6]]
        else:
            boxes = np.zeros((0, 7), np.float32)
        r = Results(frame, path, names, boxes)
        results.append(r)
    LOGGER.info(f"tracked {len(results)} frames; "
                f"{len(trk.tracked_stracks)} active tracks at end")
    return results
