"""Detection predictor: source loading -> letterbox -> jit forward+NMS -> Results.

Parity surface: reference engine/predictor.py:63-403 (BasePredictor
stream_inference: setup_source -> preprocess (LetterBox, BGR->RGB, /255) ->
forward -> postprocess) + models/yolo/detect/predict.py:23 (NMS +
scale_boxes -> Results). Sources supported: image path, directory, glob list,
numpy array(s). Video/stream loaders land with the IO layer.

TPU-first: inputs are letterboxed to one static square size and batched so a
single compiled program serves the whole stream (the reference recompiles
torch graphs per shape; XLA can't).
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.data.augment import letterbox
from yolo_ad_refine_tpu.engine.results import Results
from yolo_ad_refine_tpu.ops.boxes import scale_boxes
from yolo_ad_refine_tpu.ops.nms import non_max_suppression
from yolo_ad_refine_tpu.utils import LOGGER, increment_path


def load_sources(source, vid_stride: int = 1) -> list[tuple[str, np.ndarray]]:
    """Resolve source (path/dir/video/list/np array) to [(name, BGR frame)].

    Videos are expanded to per-frame entries via data.loaders (reference
    LoadImagesAndVideos behavior)."""
    if isinstance(source, np.ndarray):
        return [("image0.jpg", source)]
    if isinstance(source, (list, tuple)):
        out = []
        for i, s in enumerate(source):
            out.extend(load_sources(s) if not isinstance(s, np.ndarray) else [(f"image{i}.jpg", s)])
        return out
    from yolo_ad_refine_tpu.data.loaders import load_inference_source

    out = []
    for path, frame, meta in load_inference_source(source, vid_stride):
        name = f"{path}#{meta['frame']}" if meta.get("video") else path
        out.append((name, frame))
    return out


class DetectionPredictor:
    def __init__(self, overrides: dict | None = None):
        self.args = dict(overrides or {})

    def __call__(self, source=None, model=None, names: dict | None = None):
        args = self.args
        imgsz = int(args.get("imgsz", 640))
        conf = float(args.get("conf") or 0.25)
        iou = float(args.get("iou", 0.7))
        max_det = int(args.get("max_det", 300))
        agnostic = bool(args.get("agnostic_nms", False))
        batch_size = int(args.get("batch", 16))
        save = bool(args.get("save", False))
        save_txt = bool(args.get("save_txt", False))
        save_conf = bool(args.get("save_conf", False))
        save_crop = bool(args.get("save_crop", False))
        names = names or getattr(model, "names", None) or {i: f"class{i}" for i in range(model.nc)}
        variables = args.get("variables") or model.variables
        # task from the model's head (reference: task inferred from checkpoint)
        head = getattr(model, "head_spec", None)
        task = {"Segment": "segment", "Pose": "pose", "OBB": "obb"}.get(
            head.name if head is not None else "", "detect")

        @jax.jit
        def forward_nms(img):
            x = img.astype(model.dtype) / 255.0
            y, feats = model.apply(variables, x, train=False)
            det, cnt, extras = non_max_suppression(
                y, conf_thres=conf, iou_thres=iou, max_det=max_det,
                agnostic=agnostic, nc=model.nc, rotated=(task == "obb"),
            )
            if task == "segment":
                from yolo_ad_refine_tpu.ops.masks import process_mask

                proto = feats[2]  # (B, mh, mw, nm)
                masks = jax.vmap(
                    lambda p, e, d: process_mask(p, e, d[:, :4], (imgsz, imgsz))
                )(proto, extras, det)
                return det, cnt, extras, masks
            return det, cnt, extras, jnp.zeros((), jnp.float32)

        items = load_sources(source)
        save_dir = None
        if save or save_txt or save_crop:
            save_dir = increment_path(Path(args.get("project") or "runs") / "predict", mkdir=True)

        results: list[Results] = []
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            imgs, metas = [], []
            for name, im0 in chunk:
                im, ratio, pad = letterbox(im0, imgsz, scaleup=True)
                imgs.append(im[..., ::-1])  # BGR -> RGB
                metas.append((name, im0, ratio, pad))
            batch = np.ascontiguousarray(np.stack(imgs))
            # pad partial batches to the compiled batch size
            n_real = len(chunk)
            if n_real < batch_size:
                batch = np.concatenate(
                    [batch, np.zeros((batch_size - n_real, *batch.shape[1:]), batch.dtype)]
                )
            t0 = time.perf_counter()
            det, cnt, extras, pmasks = jax.device_get(forward_nms(jnp.asarray(batch)))
            dt = (time.perf_counter() - t0) / max(n_real, 1) * 1000

            for j, (name, im0, ratio, pad) in enumerate(metas):
                n = int(cnt[j])
                d = np.array(det[j, :n])  # writable copy (device arrays are read-only views)
                kw = {}
                if task == "obb":
                    # det rows are xywh; rescale with the angle, keep AA hulls
                    # in .boxes for the shared plot/verbose/track consumers
                    rb = np.concatenate([d[:, :4], np.array(extras[j, :n, :1])], -1)
                    rb[:, 0] = (rb[:, 0] - pad[0]) / ratio[0]
                    rb[:, 1] = (rb[:, 1] - pad[1]) / ratio[0]
                    rb[:, 2:4] /= ratio[0]
                    obb = np.concatenate([rb, d[:, 4:6]], -1)
                    kw["obb"] = obb
                    from yolo_ad_refine_tpu.engine.results import OBBoxes

                    d = np.concatenate(
                        [OBBoxes(obb, im0.shape[:2]).xyxy, d[:, 4:6]], -1)
                elif n:
                    d[:, :4] = np.asarray(
                        scale_boxes((imgsz, imgsz), jnp.asarray(d[:, :4]), im0.shape[:2],
                                    ratio_pad=(ratio, pad))
                    )
                if task == "pose":
                    ks = getattr(head.module, "kpt_shape", (17, 3))
                    kp = np.array(extras[j, :n]).reshape(n, *ks)
                    kp[..., 0] = (kp[..., 0] - pad[0]) / ratio[0]
                    kp[..., 1] = (kp[..., 1] - pad[1]) / ratio[0]
                    kw["keypoints"] = kp
                elif task == "segment" and n:
                    import cv2

                    h0, w0 = im0.shape[:2]
                    # un-letterbox: crop the pad, resize to original
                    top, left = int(round(pad[1])), int(round(pad[0]))
                    bh, bw = int(round(h0 * ratio[0])), int(round(w0 * ratio[0]))
                    m = np.array(pmasks[j, :n, top : top + bh, left : left + bw])
                    m = np.stack([
                        cv2.resize(mi, (w0, h0), interpolation=cv2.INTER_LINEAR) for mi in m
                    ]) if n else m
                    kw["masks"] = (m > 0.5).astype(np.float32)
                r = Results(im0, name, names, d, speed={"inference": dt}, **kw)
                results.append(r)
                LOGGER.info(f"{name}: {r.verbose()} ({dt:.1f} ms/img)")
                if save_dir is not None:
                    if save:
                        r.save(save_dir / Path(name).name)
                    if save_txt:
                        r.save_txt(save_dir / "labels" / f"{Path(name).stem}.txt",
                                   save_conf=save_conf)
                    if save_crop:
                        r.save_crop(save_dir / "crops", Path(name).name)
        return results
