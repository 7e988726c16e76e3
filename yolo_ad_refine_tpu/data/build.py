"""Batched, prefetching data loader with fixed-shape padded label collate.

Parity surface: reference ultralytics/data/build.py:28-147
(InfiniteDataLoader/_RepeatSampler, seed_worker, build_dataloader). The torch
DataLoader multiprocess workers become a thread pool (cv2/numpy release the
GIL for the heavy ops) feeding a bounded prefetch queue; the ragged
variable-count collate (dataset.py:229 collate_fn) becomes fixed (B,
max_boxes) padding + mask so the jitted train step never recompiles.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from yolo_ad_refine_tpu.data.dataset import YOLODataset
from yolo_ad_refine_tpu.utils import LOGGER, NUM_THREADS


def collate(samples: list[dict], max_boxes: int) -> dict:
    """Stack samples into fixed-shape numpy batch arrays.

    img: (B,H,W,3) uint8 RGB — the BGR->RGB flip happens HERE, once, matching
    the reference Format transform (augment.py:1920 Format: HWC-BGR -> RGB),
    so train, val, predict and track all consume the same channel order;
    cls: (B,N,1) f32; bboxes: (B,N,4) xyxy px; mask: (B,N,1). Overflowing
    boxes are truncated (capped), mirroring the static-shape requirement
    (SURVEY.md §7 hard part 7).
    """
    b = len(samples)
    h, w = samples[0]["img"].shape[:2]
    img = np.stack([s["img"][..., ::-1] for s in samples])  # BGR -> RGB
    cls = np.zeros((b, max_boxes, 1), np.float32)
    bw = samples[0]["bboxes"].shape[-1]  # 4 (xyxy) or 5 (xywhr for obb)
    bboxes = np.zeros((b, max_boxes, bw), np.float32)
    mask = np.zeros((b, max_boxes, 1), np.float32)
    overflow = 0
    for i, s in enumerate(samples):
        n = len(s["cls"])
        if n > max_boxes:
            overflow += n - max_boxes
            n = max_boxes
        if n:
            cls[i, :n, 0] = s["cls"][:n]
            bboxes[i, :n] = s["bboxes"][:n]
            mask[i, :n, 0] = 1.0
    if overflow:
        LOGGER.warning(f"collate: dropped {overflow} boxes over max_boxes={max_boxes}")
    out = {
        "img": img,
        "cls": cls,
        "bboxes": bboxes,
        "mask": mask,
        "ori_shape": [s["ori_shape"] for s in samples],
        "ratio_pad": [s["ratio_pad"] for s in samples],
        "im_file": [s["im_file"] for s in samples],
    }
    if "keypoints" in samples[0]:
        # (B, max_boxes, K, 3) keypoints in input px (x, y, visibility)
        nk = max((s["keypoints"].shape[1] for s in samples if len(s["keypoints"])), default=0)
        kpts = np.zeros((b, max_boxes, nk, 3), np.float32)
        for i, s in enumerate(samples):
            n = min(len(s["keypoints"]), max_boxes)
            if n and nk:
                kpts[i, :n] = s["keypoints"][:n]
        out["keypoints"] = kpts
    if "segments" in samples[0]:
        # overlap-encoded instance index masks at 1/4 resolution (proto size)
        from yolo_ad_refine_tpu.train.segment import polygons_to_index_mask

        mh, mw = h // 4, w // 4
        masks = np.zeros((b, mh, mw), np.int32)
        for i, s in enumerate(samples):
            polys = [p / 4.0 for p in s["segments"][:max_boxes]]
            if polys:
                masks[i] = polygons_to_index_mask(polys, (mh, mw))
        out["masks"] = masks
    return out


class DataLoader:
    """Thread-prefetching epoch iterator over a YOLODataset."""

    def __init__(self, dataset: YOLODataset, batch_size: int = 16, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False, workers: int = None,
                 prefetch: int = 4, max_boxes: int | None = None,
                 batch_plan: list | None = None):
        self.dataset = dataset
        # explicit batch plan (e.g. rect-val buckets: every batch one shape)
        self.batch_plan = batch_plan
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.workers = workers or NUM_THREADS
        self.prefetch = prefetch
        self.max_boxes = max_boxes or dataset.max_boxes
        self.epoch = 0

    def __len__(self):
        if self.batch_plan is not None:
            return len(self.batch_plan)
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def close_mosaic(self):
        """Disable mosaic/mixup for final epochs (reference trainer.py:342,
        dataset.py:197-202)."""
        self.dataset.mosaic_enabled = False
        self.dataset.hyp = {**self.dataset.hyp, "mosaic": 0.0, "mixup": 0.0, "copy_paste": 0.0}

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        if self.drop_last:
            idx = idx[: (n // self.batch_size) * self.batch_size]
        return idx

    def __iter__(self):
        if self.batch_plan is not None:
            batches = self.batch_plan
        else:
            idx = self._indices()
            batches = [idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(max_workers=self.workers) as pool:
                for bi, batch_idx in enumerate(batches):
                    if stop.is_set():
                        return
                    rngs = [
                        np.random.default_rng((self.seed + self.epoch) * 1_000_003 + int(j))
                        for j in batch_idx
                    ]
                    samples = list(pool.map(
                        lambda a: self.dataset.get_sample(int(a[0]), a[1]), zip(batch_idx, rngs)
                    ))
                    q.put(collate(samples, self.max_boxes))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


def build_dataloader(dataset, batch_size: int = 16, shuffle: bool = True, seed: int = 0,
                     workers: int = None, max_boxes: int | None = None) -> DataLoader:
    return DataLoader(dataset, batch_size=batch_size, shuffle=shuffle, seed=seed,
                      workers=workers, max_boxes=max_boxes)
