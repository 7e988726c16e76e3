"""Detection validator: NMS -> IoU matching -> mAP.

Parity surface: reference engine/validator.py:106-219 (BaseValidator loop:
preprocess -> forward -> [train-val: loss accumulate] -> NMS postprocess ->
update_metrics) and models/yolo/detect/val.py:17-338 (DetectionValidator:
_prepare_batch/_prepare_pred native-space rescale, _process_batch 10-IoU TP
matrix, get_stats -> DetMetrics). The head eval contract is the reference's:
forward returns (decoded, feats); NMS consumes decoded, loss consumes feats
(the WENTI-documented pitfall).

TPU-first: the forward+NMS run as one jitted program with fixed output
shapes; only the (max_det, 6) detections + counts come back to host, where
matching/AP run in numpy exactly like the reference.
"""

from __future__ import annotations


from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.data import DataLoader, YOLODataset, check_det_dataset
from yolo_ad_refine_tpu.ops.boxes import scale_boxes
from yolo_ad_refine_tpu.ops.nms import non_max_suppression
from yolo_ad_refine_tpu.utils import LOGGER, Profile
from yolo_ad_refine_tpu.utils.metrics import ConfusionMatrix, DetMetrics, match_predictions
from yolo_ad_refine_tpu.utils.metrics_np import box_iou_np, kpt_iou_np, probiou_np


class DetectionValidator:
    """Runs a model over a val split and computes detection metrics."""

    def __init__(self, args: dict | None = None, dataloader: DataLoader | None = None):
        self.args = dict(args or {})
        self.dataloader = dataloader
        self.training = False

    # -- setup ----------------------------------------------------------------
    def _build_dataloader(self, data, imgsz, batch):
        info = check_det_dataset(data)
        split = self.args.get("split", "val")
        path = info.get(split) or info.get("val") or info.get("train")
        ds = YOLODataset(path, imgsz=imgsz, augment=False, nc=info["nc"],
                         max_boxes=int(self.args.get("max_boxes", 128)),
                         task=self.args.get("task", "detect"))
        self.names = info["names"]
        plan = None
        if self.args.get("rect") and self.args.get("task", "detect") == "detect":
            # TPU rect val: K static aspect-ratio buckets (vs the reference's
            # per-batch dynamic shapes, base.py:261-284) — at most K compiled
            # forwards, batches never straddle buckets
            plan = ds.set_rectangle(batch,
                                    nbuckets=int(self.args.get("rect_buckets", 4)))
        return DataLoader(ds, batch_size=batch, shuffle=False, batch_plan=plan)

    # -- main -----------------------------------------------------------------
    def __call__(self, model=None, variables=None, dataloader=None, loss_fn=None,
                 backend=None):
        """model: DetectionModel; variables overrides model.variables (e.g. EMA).

        backend: an engine.exporter.AutoBackend — the reference's standalone
        val mode (validator.py:125-131 runs AutoBackend over exported
        weights). The forward then runs through the exported artifact
        (checkpoint/StableHLO/SavedModel/TFLite/pb/Triton, raw 0-255 input,
        decode included); NMS/matching/metrics stay the in-framework jitted
        path. `model` is still required for nc/head metadata; val loss is
        skipped (exports emit decoded y, not per-level feats)."""
        args = self.args
        imgsz = int(args.get("imgsz", 640))
        batch_size = int(args.get("batch", 16))
        conf = args.get("conf") or 0.001
        iou = float(args.get("iou", 0.7))
        max_det = int(args.get("max_det", 300))
        # pre-NMS candidate cap. The reference truncates at 30000
        # (utils/ops.py:281); 2048 is the TPU-friendly default (static
        # top_k), raise it via args for reference-exact candidate sets.
        max_nms = int(args.get("max_nms", 2048))
        nc = model.nc

        dataloader = dataloader or self.dataloader
        if dataloader is None:
            dataloader = self._build_dataloader(args["data"], imgsz, batch_size)
        names = getattr(self, "names", None) or {i: f"class{i}" for i in range(nc)}

        variables = variables if variables is not None else model.variables

        segment = self.args.get("task") == "segment"
        rotated = self.args.get("task") == "obb"
        pose = self.args.get("task") == "pose"
        kpt_shape, kpt_sigmas = None, None
        if pose:
            from yolo_ad_refine_tpu.train.pose import OKS_SIGMA

            kpt_shape = tuple(getattr(model.head_spec.module, "kpt_shape", (17, 3)))
            kpt_sigmas = (OKS_SIGMA if kpt_shape[0] == 17
                          else np.ones(kpt_shape[0]) / kpt_shape[0])

        head_name = getattr(getattr(model, "head_spec", None), "name", "")
        nms_free = head_name == "v10Detect"
        rtdetr = head_name == "RTDETRDecoder"

        @partial(jax.jit, static_argnames=())
        def forward_nms(vars_, img):
            img = img.astype(model.dtype) / 255.0
            y, feats = model.apply(vars_, img, train=False)
            if rtdetr:
                # reference rtdetr/val.py postprocess: normalized xywh * imgsz
                # -> xyxy, per-query max score/class, conf-sorted, NO NMS
                from yolo_ad_refine_tpu.ops.boxes import xywh2xyxy

                boxes = xywh2xyxy(y[..., :4].astype(jnp.float32)) * imgsz
                scores = y[..., 4:]
                score = scores.max(-1)
                cls_i = scores.argmax(-1).astype(jnp.float32)
                order = jnp.argsort(-score, axis=-1)
                d = jnp.concatenate([boxes, score[..., None], cls_i[..., None]], -1)
                d = jnp.take_along_axis(d, order[..., None], axis=1)
                keep = d[..., 4] > float(conf)
                d = d * keep[..., None]
                cnt = jnp.sum(keep, axis=-1).astype(jnp.int32)
                return d, cnt, jnp.zeros((*d.shape[:2], 0), d.dtype), feats
            if nms_free:
                # v10: y is already (B, max_det, 6) xywh+conf+cls, score-sorted
                from yolo_ad_refine_tpu.ops.boxes import xywh2xyxy

                det = jnp.concatenate([xywh2xyxy(y[..., :4]), y[..., 4:6]], -1)
                keep = y[..., 4] > float(conf)
                det = det * keep[..., None]
                cnt = jnp.sum(keep, axis=-1).astype(jnp.int32)
                return det, cnt, jnp.zeros((*det.shape[:2], 0), det.dtype), feats
            det, cnt, _extra = non_max_suppression(
                y, conf_thres=float(conf), iou_thres=iou, max_det=max_det,
                max_nms=max_nms, multi_label=True, nc=nc, rotated=rotated,
            )
            return det, cnt, _extra, feats

        if backend is not None:
            assert not (segment or pose or rotated or rtdetr or nms_free), \
                "AutoBackend standalone val currently supports the detect task"
            loss_fn = None
            nms_jit = jax.jit(lambda y: non_max_suppression(
                y, conf_thres=float(conf), iou_thres=iou, max_det=max_det,
                max_nms=max_nms, multi_label=True, nc=nc, rotated=rotated))

            def forward_nms(vars_, img):  # noqa: F811 — standalone AutoBackend mode
                # exported artifacts (TFLite/SavedModel/pb) have a fixed input
                # batch: pad a final partial batch up to batch_size and slice
                # the outputs back (keeps NMS shapes static too)
                n = img.shape[0]
                x = np.asarray(img, np.float32)
                if n < batch_size:
                    x = np.concatenate(
                        [x, np.zeros((batch_size - n, *x.shape[1:]), np.float32)], 0)
                y = jnp.asarray(np.asarray(backend(x)))
                det, cnt, _extra = nms_jit(y)
                return det[:n], cnt[:n], _extra[:n], None

        mask_iou_fn = None
        if segment:
            from yolo_ad_refine_tpu.ops.masks import mask_iou_matrix

            max_gt = int(self.args.get("max_boxes", 128))

            @jax.jit
            def mask_iou_fn(protos, extras, dets, gt_masks):  # noqa: F811
                return jax.vmap(
                    lambda p, e, d, g: mask_iou_matrix(p, e, d[:, :4], (imgsz, imgsz), g, max_gt)
                )(protos, extras, dets, gt_masks)

        # COCO-format predictions for external evaluation (reference
        # detect/val.py pred_to_json + save_json)
        self.jdict = [] if self.args.get("save_json") else None
        metrics = DetMetrics(names)
        seg_metrics = DetMetrics(names) if segment else None
        pose_metrics = DetMetrics(names) if pose else None
        confusion = ConfusionMatrix(nc)
        loss_sum = np.zeros(3)
        n_batches = 0
        # loss_fn is pure jnp — calling it eagerly dispatches hundreds of
        # tiny ops per batch (ruinous over the axon tunnel); jit it once
        loss_jit = jax.jit(lambda f, c, b, m: loss_fn(f, c, b, m)) if loss_fn is not None else None
        seen = 0
        profs = {k: Profile() for k in ("preprocess", "inference", "postprocess")}

        for batch in dataloader:
            with profs["preprocess"]:
                img = jnp.asarray(batch["img"])
            with profs["inference"]:
                det, cnt, extras, feats = forward_nms(variables, img)
                mask_ious = None
                if segment:
                    proto = feats[2] if isinstance(feats, tuple) else None
                    mask_ious = np.asarray(jax.device_get(
                        mask_iou_fn(proto, extras, det, jnp.asarray(batch["masks"]))
                    ))
                    feats_for_loss = feats[0] if isinstance(feats, tuple) else feats
                elif rotated or rtdetr:
                    # OBBLoss consumes the head's full (feats, angle) tuple;
                    # RTDETRLoss consumes the raw (dec_b, dec_s, enc_b, enc_s)
                    feats_for_loss = feats
                else:
                    # the pose head returns (feats, kpt); the box val loss
                    # consumes the per-level feature maps only
                    feats_for_loss = feats[0] if isinstance(feats, tuple) else feats
                if loss_jit is not None:
                    out = loss_jit(feats_for_loss, jnp.asarray(batch["cls"]),
                                   jnp.asarray(batch["bboxes"]), jnp.asarray(batch["mask"]))
                    loss_sum += np.asarray(out.components)
                    n_batches += 1
                det = np.asarray(jax.device_get(det))
                cnt = np.asarray(jax.device_get(cnt))
                angles = np.asarray(jax.device_get(extras))[..., 0] if rotated else None
                pred_kpts = np.asarray(jax.device_get(extras)) if pose else None
            with profs["postprocess"]:
                self._update_metrics(det, cnt, batch, metrics, confusion,
                                     batch["img"].shape[1:3],
                                     seg_metrics=seg_metrics, mask_ious=mask_ious,
                                     angles=angles, pose_metrics=pose_metrics,
                                     pred_kpts=pred_kpts, kpt_shape=kpt_shape,
                                     kpt_sigmas=kpt_sigmas)
            seen += len(batch["im_file"])

        results = metrics.process()
        if seg_metrics is not None:
            seg_results = seg_metrics.process()
            results["metrics/mAP50(M)"] = seg_results["metrics/mAP50(B)"]
            results["metrics/mAP50-95(M)"] = seg_results["metrics/mAP50-95(B)"]
            self.seg_metrics = seg_metrics
        if pose_metrics is not None:
            pose_results = pose_metrics.process()
            results["metrics/mAP50(P)"] = pose_results["metrics/mAP50(B)"]
            results["metrics/mAP50-95(P)"] = pose_results["metrics/mAP50-95(B)"]
            self.pose_metrics = pose_metrics
        self.metrics = metrics
        self.confusion_matrix = confusion
        if n_batches:
            results["val/box_loss"] = float(loss_sum[0] / n_batches)
            results["val/cls_loss"] = float(loss_sum[1] / n_batches)
            results["val/dfl_loss"] = float(loss_sum[2] / n_batches)
        total_ms = sum(p.t for p in profs.values()) / max(seen, 1) * 1000
        results["speed_ms_per_image"] = total_ms
        results["inference_ms_per_image"] = profs["inference"].t / max(seen, 1) * 1000
        self._print_results(metrics, seen, names)
        if self.jdict is not None:
            import json

            out = Path(self.args.get("save_dir") or ".") / "predictions.json"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(json.dumps(self.jdict))
            LOGGER.info(f"save_json: {len(self.jdict)} predictions -> {out}")
        if self.args.get("plots") and self.args.get("save_dir"):
            self._plot(metrics, confusion, names, Path(self.args["save_dir"]))
        return results

    def _plot(self, metrics, confusion, names, save_dir):
        from yolo_ad_refine_tpu.utils.plotting import plot_confusion_matrix, plot_pr_curve

        save_dir.mkdir(parents=True, exist_ok=True)
        plot_confusion_matrix(confusion.matrix, names, save_dir / "confusion_matrix.png")
        box = metrics.box
        if len(box.all_ap) and getattr(box, "prec_values", None) is not None:
            # per-class precision envelope over the recall grid at IoU .5
            # (reference plotting.py plot_pr_curve semantics)
            plot_pr_curve(box.px, box.prec_values, box.all_ap,
                          save_dir / "PR_curve.png", names)

    # -- per-batch metric update ----------------------------------------------
    @staticmethod
    def _scale_rboxes(rb, ratio_pad):
        """Rescale (n,5) xywhr from letterboxed to native px: centers un-pad +
        un-scale, wh un-scale, angle invariant (reference obb/val.py)."""
        gain = ratio_pad[0][0]
        padw, padh = ratio_pad[1]
        rb = rb.copy()
        rb[:, 0] = (rb[:, 0] - padw) / gain
        rb[:, 1] = (rb[:, 1] - padh) / gain
        rb[:, 2:4] /= gain
        return rb

    def _update_metrics(self, det, cnt, batch, metrics: DetMetrics,
                        confusion: ConfusionMatrix, imgsz,
                        seg_metrics: DetMetrics | None = None, mask_ious=None,
                        angles=None, pose_metrics: DetMetrics | None = None,
                        pred_kpts=None, kpt_shape=None, kpt_sigmas=None):
        rotated = angles is not None
        for i in range(det.shape[0]):
            n = int(cnt[i])
            d = det[i, :n].copy()  # (n, 6) in letterboxed coords
            ori_shape = batch["ori_shape"][i]
            ratio_pad = batch["ratio_pad"][i]
            mask = batch["mask"][i, :, 0] > 0
            gt_boxes = batch["bboxes"][i][mask].copy()  # letterboxed px
            gt_cls = batch["cls"][i][mask, 0]

            oks = None
            if pose_metrics is not None and n and len(gt_cls):
                # OKS in letterboxed coords: scale-invariant (d^2 and area
                # both carry gain^2; pads cancel in differences)
                pk = pred_kpts[i, :n].reshape(n, *kpt_shape)
                gk = batch["keypoints"][i][mask]
                area = np.prod(np.clip(gt_boxes[:, 2:4] - gt_boxes[:, :2], 1, None), -1)
                oks = kpt_iou_np(gk, pk, area * 0.53, np.asarray(kpt_sigmas))

            # rescale both to native space (reference _prepare_batch/_prepare_pred)
            if rotated:
                if n:
                    d[:, :4] = self._scale_rboxes(
                        np.concatenate([d[:, :4], angles[i, :n, None]], -1), ratio_pad
                    )[:, :4]
                if len(gt_boxes):
                    gt_boxes = self._scale_rboxes(gt_boxes, ratio_pad)
            else:
                if n:
                    d[:, :4] = np.asarray(
                        scale_boxes(tuple(imgsz) if not np.isscalar(imgsz) else (imgsz, imgsz),
                                    jnp.asarray(d[:, :4]), ori_shape,
                                    ratio_pad=ratio_pad)
                    )
                if len(gt_boxes):
                    gt_boxes = np.asarray(
                        scale_boxes(tuple(imgsz) if not np.isscalar(imgsz) else (imgsz, imgsz),
                                    jnp.asarray(gt_boxes), ori_shape,
                                    ratio_pad=ratio_pad)
                    )

            if getattr(self, "jdict", None) is not None and n:
                stem = Path(batch["im_file"][i]).stem
                image_id = int(stem) if stem.isnumeric() else stem
                for x1, y1, x2, y2, sc, c in d[:, :6]:
                    self.jdict.append({
                        "image_id": image_id,
                        "category_id": int(c),
                        "bbox": [round(float(x1), 3), round(float(y1), 3),
                                 round(float(x2 - x1), 3), round(float(y2 - y1), 3)],
                        "score": round(float(sc), 5),
                    })

            if n == 0:
                if len(gt_cls):
                    metrics.update_stats(
                        np.zeros((0, 10), bool), np.zeros(0), np.zeros(0), gt_cls
                    )
                    if seg_metrics is not None:
                        seg_metrics.update_stats(
                            np.zeros((0, 10), bool), np.zeros(0), np.zeros(0), gt_cls
                        )
                    if pose_metrics is not None:
                        pose_metrics.update_stats(
                            np.zeros((0, 10), bool), np.zeros(0), np.zeros(0), gt_cls
                        )
                    if not rotated:
                        confusion.process_batch(None, gt_boxes, gt_cls)
                continue
            if len(gt_cls):
                if rotated:
                    pred_rb = self._scale_rboxes(
                        np.concatenate([det[i, :n, :4].copy(), angles[i, :n, None]], -1),
                        ratio_pad,
                    )
                    iou = probiou_np(gt_boxes, pred_rb)
                else:
                    iou = box_iou_np(gt_boxes, d[:, :4])
                tp = match_predictions(d[:, 5], gt_cls, iou)
            else:
                tp = np.zeros((n, 10), bool)
            metrics.update_stats(tp, d[:, 4], d[:, 5], gt_cls)
            if seg_metrics is not None:
                n_gt = len(gt_cls)
                miou = mask_ious[i][:n_gt, :n] if n_gt else np.zeros((0, n))
                tp_m = (match_predictions(d[:, 5], gt_cls, miou) if n_gt
                        else np.zeros((n, 10), bool))
                seg_metrics.update_stats(tp_m, d[:, 4], d[:, 5], gt_cls)
            if pose_metrics is not None:
                tp_p = (match_predictions(d[:, 5], gt_cls, oks) if oks is not None
                        else np.zeros((n, 10), bool))
                pose_metrics.update_stats(tp_p, d[:, 4], d[:, 5], gt_cls)
            if not rotated:  # confusion matrix is axis-aligned-only
                confusion.process_batch(d, gt_boxes, gt_cls)

    def _print_results(self, metrics: DetMetrics, seen: int, names: dict):
        r = metrics.results_dict
        LOGGER.info(
            f"{'all':>10}{seen:>8} P {r['metrics/precision(B)']:.3f} "
            f"R {r['metrics/recall(B)']:.3f} mAP50 {r['metrics/mAP50(B)']:.3f} "
            f"mAP50-95 {r['metrics/mAP50-95(B)']:.3f}"
        )
