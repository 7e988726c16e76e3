"""YOLO-format detection dataset.

Parity surface: reference ultralytics/data/base.py:21 (BaseDataset: image
globbing, rect-aware load_image resize), dataset.py:45 (YOLODataset: label
txt parse + cache, transform build) and data/utils.py:254 (check_det_dataset
data.yaml validation). Differences, TPU-first:

- __getitem__ returns fixed-schema numpy (img uint8 BGR, boxes xyxy px, cls)
  and the loader pads labels to max_boxes — no ragged collate.
- label caching uses one .npz per dataset split keyed by a hash of the file
  list (the reference pickles a .cache dict per labels dir).
"""

from __future__ import annotations

import hashlib
import math
from pathlib import Path

import cv2
import numpy as np

from yolo_ad_refine_tpu.data import augment as A
from yolo_ad_refine_tpu.utils import LOGGER, yaml_load

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}


def check_det_dataset(data: str | Path | dict) -> dict:
    """Parse a data.yaml (path/train/val/names) into resolved paths.

    Reference: data/utils.py:254-424 minus auto-download (zero-egress env).
    """
    if isinstance(data, (str, Path)):
        d = yaml_load(data)
        d["yaml_file"] = str(data)
        base = Path(d.get("path") or Path(data).parent)
        if not base.is_absolute():
            base = (Path(data).parent / base).resolve()
    else:
        d = dict(data)
        base = Path(d.get("path", "."))
    names = d.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    d["names"] = names or {i: f"class{i}" for i in range(d.get("nc", 80))}
    d["nc"] = len(d["names"])
    for split in ("train", "val", "test"):
        if d.get(split):
            p = Path(d[split])
            d[split] = str(p if p.is_absolute() else base / p)
    return d


def img2label_path(img_path: str) -> str:
    """images/xxx.jpg -> labels/xxx.txt (reference data/utils.py:45)."""
    sa, sb = f"{Path(img_path).parts[-2]}", "labels"
    p = Path(img_path)
    parent = p.parent
    if parent.name == "images" or "images" in parent.parts:
        parts = list(p.parts)
        idx = len(parts) - 1 - parts[::-1].index("images")
        parts[idx] = sb
        return str(Path(*parts).with_suffix(".txt"))
    del sa
    return str(p.with_suffix(".txt"))


def xyxyxyxy2xywhr_np(corners: np.ndarray) -> np.ndarray:
    """(n, 4, 2) corner quads -> (n, 5) xywhr, r in radians [0, pi/2)
    (reference utils/ops.py:xyxyxyxy2xywhr using cv2.minAreaRect)."""
    if not len(corners):
        return np.zeros((0, 5), np.float32)
    out = []
    for pts in corners:
        (cx, cy), (w, h), angle = cv2.minAreaRect(pts.astype(np.float32))
        r = (angle / 180.0 * np.pi) % np.pi  # regularize to [0, pi/2) using
        if r >= np.pi / 2:  # the (w,h,r) == (h,w,r+pi/2) equivalence
            w, h, r = h, w, r - np.pi / 2
        out.append([cx, cy, w, h, r])
    return np.asarray(out, np.float32)


class YOLODataset:
    """Detection dataset over an image dir/list with YOLO txt labels."""

    def __init__(self, img_path: str | Path, imgsz: int = 640, augment: bool = False,
                 hyp: dict | None = None, max_boxes: int = 128, nc: int = 80,
                 fraction: float = 1.0, cache: bool = True, task: str = "detect",
                 kpt_shape: tuple | None = None, flip_idx: list | None = None,
                 cache_images: str | bool = False):
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp or {}
        self.max_boxes = max_boxes
        self.nc = nc
        self.task = task
        # pose: (K, ndim) keypoint layout; inferred from label width if None.
        # flip_idx maps each keypoint to its horizontal mirror (reference
        # data/augment.py RandomFlip); fliplr is disabled for pose without it.
        self.kpt_shape = tuple(kpt_shape) if kpt_shape else None
        self.flip_idx = list(flip_idx) if flip_idx else None
        self.im_files = self._glob_images(img_path)
        if fraction < 1.0:
            self.im_files = self.im_files[: max(1, int(len(self.im_files) * fraction))]
        self.label_files = [img2label_path(f) for f in self.im_files]
        self.labels = self._load_labels(cache)
        # image cache (reference base.py:189-259 cache_images): 'ram' keeps
        # the resized arrays in memory; 'disk' writes .npy sidecars decoded
        # once and memory-mapped after
        self.cache_images = {True: "ram"}.get(cache_images, cache_images)
        self._ram: list = [None] * len(self.im_files)
        self.mosaic_enabled = self.augment and self.hyp.get("mosaic", 1.0) > 0
        # rect val: per-image STATIC letterbox target (h, w), set by
        # set_rectangle(); None -> square (imgsz, imgsz)
        self.rect_shapes: np.ndarray | None = None
        self.rect_order: np.ndarray | None = None

    def set_rectangle(self, batch_size: int, nbuckets: int = 4, stride: int = 32,
                      pad: float = 0.5):
        """TPU-native rect batching: K STATIC aspect-ratio buckets.

        The reference (base.py:261-284 set_rectangle + LetterBox auto) gives
        every val batch its own minimal rectangular shape — a different
        XLA-compiled executable per batch. Here images are sorted by aspect
        ratio and split into ``nbuckets`` contiguous groups; each group
        letterboxes to ONE shape covering its extreme ratio (same
        ceil-to-stride arithmetic as the reference), so the whole val run
        compiles at most ``nbuckets`` forward executables while recovering
        most of the padding the square letterbox wastes.

        Returns the bucket-grouped batch plan (list of index arrays, each a
        full batch from a single bucket) for the DataLoader.
        """
        n = len(self.im_files)
        ars = np.empty(n, np.float64)
        for i in range(n):
            # decode-once for shape; RAM/disk cache reuses the decode
            _, (h0, w0) = self.load_image(i)
            ars[i] = h0 / w0
        order = np.argsort(ars)
        self.rect_shapes = np.full((n, 2), self.imgsz, np.int32)
        nbuckets = max(1, min(nbuckets, n))
        groups = np.array_split(order, nbuckets)
        for g in groups:
            if not len(g):
                continue
            mini, maxi = float(ars[g].min()), float(ars[g].max())
            shape = [1.0, 1.0]
            if maxi < 1:       # all wide: shrink height to the tallest
                shape = [maxi, 1.0]
            elif mini > 1:     # all tall: shrink width to the widest
                shape = [1.0, 1.0 / mini]
            hw = np.ceil(np.array(shape) * self.imgsz / stride + pad).astype(int) * stride
            self.rect_shapes[g] = np.minimum(hw, self.imgsz)
        # batch plan: batches never straddle buckets (one shape per batch)
        plan = []
        for g in groups:
            for k in range(0, len(g), batch_size):
                plan.append(np.asarray(g[k : k + batch_size]))
        self.rect_order = order
        return plan

    @staticmethod
    def _glob_images(img_path) -> list[str]:
        p = Path(img_path)
        files: list[str] = []
        if p.is_dir():
            files = [str(f) for f in sorted(p.rglob("*")) if f.suffix[1:].lower() in IMG_FORMATS]
        elif p.is_file() and p.suffix == ".txt":  # file listing image paths
            root = p.parent
            for line in p.read_text().splitlines():
                line = line.strip()
                if line:
                    f = Path(line)
                    files.append(str(f if f.is_absolute() else (root / f).resolve()))
        elif p.is_file():
            files = [str(p)]
        if not files:
            raise FileNotFoundError(f"no images found in {img_path}")
        return files

    def _load_labels(self, cache: bool) -> list[dict]:
        cache_path = None
        if cache and len(self.im_files) > 1:
            # key = version + task + image list + label file sizes/mtimes, so a
            # task switch or an edited label file invalidates the cache
            # (mirrors the reference's cache hash+version check, data/utils.py:167)
            key = hashlib.sha1(f"v2:{self.task}:".encode())
            key.update("".join(self.im_files).encode())
            for lf in self.label_files:
                try:
                    st = Path(lf).stat()
                    key.update(f"{st.st_size}:{st.st_mtime_ns};".encode())
                except OSError:
                    key.update(b"missing;")
            h = key.hexdigest()[:16]
            cache_path = Path(self.im_files[0]).parent / f".yat_labels_{h}.npz"
            if cache_path.exists():
                try:
                    z = np.load(cache_path, allow_pickle=True)
                    return list(z["labels"])
                except Exception:  # noqa: BLE001 - stale cache
                    pass
        labels = []
        n_missing = 0
        segment_task = getattr(self, "task", "detect") == "segment"
        pose_task = getattr(self, "task", "detect") == "pose"
        obb_task = getattr(self, "task", "detect") == "obb"
        for lf in self.label_files:
            rows = np.zeros((0, 5), np.float32)
            segments: list = []
            kpts = None
            corners = None
            if Path(lf).exists():
                raw = [x.split() for x in Path(lf).read_text().splitlines() if x.strip()]
                if raw and obb_task:
                    # OBB rows (DOTA-style): cls x1 y1 x2 y2 x3 y3 x4 y4
                    # normalized corners (reference data/utils.py xyxyxyxy)
                    vals = np.asarray(raw, np.float32)
                    corners = vals[:, 1:9].reshape(-1, 4, 2).clip(0, 1)
                    cx, cy = corners[..., 0].mean(-1), corners[..., 1].mean(-1)
                    w = corners[..., 0].max(-1) - corners[..., 0].min(-1)
                    h = corners[..., 1].max(-1) - corners[..., 1].min(-1)
                    rows = np.stack([vals[:, 0], cx, cy, w, h], -1)
                elif raw and pose_task:
                    # pose rows: cls x y w h (kx ky [kv]) * K (reference
                    # data/utils.py verify_image_label keypoint branch)
                    extra = len(raw[0]) - 5
                    if self.kpt_shape is None:
                        self.kpt_shape = (extra // 3, 3) if extra % 3 == 0 else (extra // 2, 2)
                    nk, ndim = self.kpt_shape
                    vals = np.asarray(raw, np.float32)
                    rows = vals[:, :5]
                    rows[:, 1:] = rows[:, 1:].clip(0, 1)
                    k = vals[:, 5 : 5 + nk * ndim].reshape(-1, nk, ndim)
                    if ndim == 2:  # no visibility flag: mark all visible
                        k = np.concatenate([k, np.ones((*k.shape[:2], 1), np.float32)], -1)
                    kpts = k
                elif raw and segment_task and any(len(r) > 5 for r in raw):
                    # segmentation rows: cls x1 y1 x2 y2 ... (normalized polygon)
                    parsed = []
                    for r in raw:
                        vals = np.asarray(r, np.float32)
                        poly = vals[1:].reshape(-1, 2).clip(0, 1)
                        segments.append(poly)
                        x1, y1 = poly.min(0)
                        x2, y2 = poly.max(0)
                        parsed.append([vals[0], (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                    rows = np.asarray(parsed, np.float32)
                elif raw:
                    rows = np.asarray(raw, dtype=np.float32)[:, :5]
                    rows[:, 1:] = rows[:, 1:].clip(0, 1)
            else:
                n_missing += 1
            # drop exact-duplicate rows (reference data/utils.py:143-148
            # verify_image_label) — keeps first occurrence, original order
            if len(rows) > 1:
                key = rows
                if kpts is not None:
                    key = np.concatenate([rows, kpts.reshape(len(rows), -1)], 1)
                elif corners is not None:
                    key = np.concatenate([rows, corners.reshape(len(rows), -1)], 1)
                _, keep = np.unique(key, axis=0, return_index=True)
                if len(keep) < len(rows):
                    keep = np.sort(keep)
                    rows = rows[keep]
                    if kpts is not None:
                        kpts = kpts[keep]
                    if corners is not None:
                        corners = corners[keep]
                    if segments:
                        segments = [segments[k] for k in keep]
            lab = {"cls": rows[:, 0], "xywhn": rows[:, 1:5]}
            if segment_task:
                lab["segments"] = segments
            if pose_task:
                nk = self.kpt_shape[0] if self.kpt_shape else 0
                lab["keypoints"] = (
                    kpts if kpts is not None else np.zeros((len(rows), nk, 3), np.float32)
                )
            if obb_task:
                lab["corners"] = (
                    corners if corners is not None else np.zeros((0, 4, 2), np.float32)
                )
            labels.append(lab)
        if n_missing:
            LOGGER.warning(f"{n_missing}/{len(self.im_files)} label files missing (treated as background)")
        if cache_path is not None:
            try:
                np.savez_compressed(cache_path, labels=np.asarray(labels, dtype=object))
            except Exception:  # noqa: BLE001
                pass
        return labels

    def __len__(self):
        return len(self.im_files)

    # -- raw loading ---------------------------------------------------------
    def load_image(self, i: int):
        """Load BGR image, resize long side to imgsz (reference base.py:151),
        with optional RAM/disk caching of the resized result."""
        if self.cache_images == "ram" and self._ram[i] is not None:
            im, shape0 = self._ram[i]
            return im.copy(), shape0
        npy = None
        if self.cache_images == "disk":
            # imgsz is part of the sidecar name: the cached array is the
            # imgsz-resized decode, so a cache written at a smaller imgsz must
            # not be served for a larger one (it would silently cap resolution)
            npy = Path(self.im_files[i]).with_suffix(f".yat{self.imgsz}.npz")
            if npy.exists():
                try:
                    z = np.load(npy)
                    return z["img"], tuple(int(v) for v in z["shape0"])
                except Exception:  # noqa: BLE001 - stale/corrupt sidecar
                    pass
        im = cv2.imread(self.im_files[i])
        if im is None:
            raise FileNotFoundError(f"image not found: {self.im_files[i]}")
        h0, w0 = im.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            # ceil, not floor: reference base.py:171 — a 1px size difference
            # shifts every downstream pixel and moves mAP
            im = cv2.resize(
                im,
                (min(math.ceil(w0 * r), self.imgsz), min(math.ceil(h0 * r), self.imgsz)),
                interpolation=cv2.INTER_LINEAR)
        if self.cache_images == "ram":
            self._ram[i] = (im.copy(), (h0, w0))
        elif self.cache_images == "disk" and npy is not None:
            np.savez(npy, img=im, shape0=np.asarray([h0, w0]))
        return im, (h0, w0)

    def load_item(self, i: int, with_shape: bool = False):
        """(img BGR resized, boxes xyxy px in resized coords, cls[, (h0, w0)])."""
        img, (h0, w0) = self.load_image(i)
        h, w = img.shape[:2]
        lab = self.labels[i]
        xywhn = lab["xywhn"]
        if len(xywhn):
            b = xywhn.copy()
            cx, cy, bw, bh = b[:, 0] * w, b[:, 1] * h, b[:, 2] * w, b[:, 3] * h
            boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        else:
            boxes = np.zeros((0, 4), np.float32)
        out = (img, boxes.astype(np.float32), lab["cls"].astype(np.float32))
        return (*out, (h0, w0)) if with_shape else out

    # -- transforms -----------------------------------------------------------
    def get_sample(self, i: int, rng: np.random.Generator | None = None, mosaic: bool | None = None):
        """Full train/val transform pipeline for one index.

        Returns dict(img uint8 HWC BGR imgsz x imgsz, bboxes (n,4) xyxy px,
        cls (n,), ori_shape, ratio_pad).
        """
        rng = rng or np.random.default_rng()
        hyp = self.hyp
        if mosaic is None:
            mosaic = self.mosaic_enabled and rng.random() < hyp.get("mosaic", 1.0)
        if self.task == "segment":
            return self._get_segment_sample(i, rng)
        if self.task == "pose":
            return self._get_pose_sample(i, rng)
        if self.task == "obb":
            return self._get_obb_sample(i, rng)

        if self.augment and mosaic:
            idxs = [i] + list(rng.integers(0, len(self), 3))
            items = [self.load_item(j) for j in idxs]
            img, boxes, cls = A.mosaic4(items, self.imgsz, rng)
            img, boxes, cls = A.random_perspective(
                img, boxes, cls, rng,
                degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
                scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
                perspective=hyp.get("perspective", 0.0),
                border=(-self.imgsz // 2, -self.imgsz // 2),
            )
            if hyp.get("mixup", 0.0) > 0 and rng.random() < hyp["mixup"]:
                j = int(rng.integers(0, len(self)))
                items2 = [self.load_item(k) for k in [j] + list(rng.integers(0, len(self), 3))]
                img2, boxes2, cls2 = A.mosaic4(items2, self.imgsz, rng)
                img2, boxes2, cls2 = A.random_perspective(
                    img2, boxes2, cls2, rng,
                    degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0),
                    border=(-self.imgsz // 2, -self.imgsz // 2),
                )
                img, boxes, cls = A.mixup(img, boxes, cls, img2, boxes2, cls2, rng)
            ori_shape = (self.imgsz, self.imgsz)
            ratio_pad = ((1.0, 1.0), (0.0, 0.0))
        else:
            img, boxes, cls, (h0, w0) = self.load_item(i, with_shape=True)
            r1 = img.shape[0] / h0  # long-side pre-resize factor
            target = (tuple(int(v) for v in self.rect_shapes[i])
                      if self.rect_shapes is not None else self.imgsz)
            img, ratio, pad = A.letterbox(img, target, scaleup=self.augment)
            boxes = A.apply_letterbox_to_boxes(boxes, ratio, pad) if len(boxes) else boxes
            if self.augment:
                img, boxes, cls = A.random_perspective(
                    img, boxes, cls, rng,
                    degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0), border=(0, 0),
                )
            ori_shape = (h0, w0)
            # total original->final gain and pad, for scale_boxes at val time
            ratio_pad = ((ratio[0] * r1, ratio[1] * r1), pad)

        if self.augment:
            img = np.ascontiguousarray(img)
            img = A.extra_augment(img, rng)
            A.augment_hsv(img, rng, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7),
                          hyp.get("hsv_v", 0.4))
            if rng.random() < hyp.get("flipud", 0.0):
                img, boxes = A.flip_ud(img, boxes)
            if rng.random() < hyp.get("fliplr", 0.5):
                img, boxes = A.flip_lr(img, boxes)

        return {
            "img": np.ascontiguousarray(img),
            "bboxes": boxes.astype(np.float32),
            "cls": cls.astype(np.float32),
            "ori_shape": tuple(ori_shape),
            "ratio_pad": ratio_pad,
            "im_file": self.im_files[i % len(self)],
        }

    def _get_obb_sample(self, i: int, rng: np.random.Generator):
        """OBB-task sample: letterbox + hsv/fliplr, corner quads transformed
        with the image then converted to xywhr (reference ops.py
        xyxyxyxy2xywhr via cv2.minAreaRect; angle radians in [0, pi/2))."""
        img, _, cls, (h0, w0) = self.load_item(i, with_shape=True)
        r1 = img.shape[0] / h0
        h, w = img.shape[:2]
        corners = self.labels[i]["corners"].copy()  # (n, 4, 2) normalized
        if len(corners):
            corners *= np.asarray([w, h], np.float32)
        img, ratio, pad = A.letterbox(img, self.imgsz, scaleup=self.augment)
        if len(corners):
            corners = corners * ratio[0] + np.asarray(pad, np.float32)
        if self.augment:
            img = np.ascontiguousarray(img)
            A.augment_hsv(img, rng, self.hyp.get("hsv_h", 0.015), self.hyp.get("hsv_s", 0.7),
                          self.hyp.get("hsv_v", 0.4))
            if rng.random() < self.hyp.get("fliplr", 0.5):
                img = np.ascontiguousarray(np.fliplr(img))
                if len(corners):
                    corners[..., 0] = img.shape[1] - corners[..., 0]
        rboxes = xyxyxyxy2xywhr_np(corners)
        return {
            "img": np.ascontiguousarray(img),
            "bboxes": rboxes.astype(np.float32),  # (n, 5) xywhr px
            "cls": cls.astype(np.float32),
            "ori_shape": (h0, w0),
            "ratio_pad": ((ratio[0] * r1, ratio[1] * r1), pad),
            "im_file": self.im_files[i % len(self)],
        }

    def _get_pose_sample(self, i: int, rng: np.random.Generator):
        """Pose-task sample: letterbox + hsv, keypoints transformed with the
        boxes. fliplr needs flip_idx (left/right joint swap) and is skipped
        without it — mirroring a person without swapping joints corrupts GT."""
        img, boxes, cls, (h0, w0) = self.load_item(i, with_shape=True)
        r1 = img.shape[0] / h0
        h, w = img.shape[:2]
        kpts = self.labels[i]["keypoints"].copy()  # (n, K, 3) normalized
        if len(kpts):
            kpts[..., 0] *= w
            kpts[..., 1] *= h
        img, ratio, pad = A.letterbox(img, self.imgsz, scaleup=self.augment)
        boxes = boxes * ratio[0] + np.asarray([*pad, *pad], np.float32)
        if len(kpts):
            vis = kpts[..., 2:] > 0
            kpts[..., :2] = (kpts[..., :2] * ratio[0] + np.asarray(pad, np.float32)) * vis
        if self.augment:
            img = np.ascontiguousarray(img)
            A.augment_hsv(img, rng, self.hyp.get("hsv_h", 0.015), self.hyp.get("hsv_s", 0.7),
                          self.hyp.get("hsv_v", 0.4))
            if self.flip_idx is not None and rng.random() < self.hyp.get("fliplr", 0.5):
                img = np.ascontiguousarray(np.fliplr(img))
                boxes = np.stack(
                    [img.shape[1] - boxes[:, 2], boxes[:, 1],
                     img.shape[1] - boxes[:, 0], boxes[:, 3]], -1
                ) if len(boxes) else boxes
                if len(kpts):
                    kpts = kpts[:, self.flip_idx]
                    vis = kpts[..., 2:] > 0
                    kpts[..., 0] = (img.shape[1] - kpts[..., 0]) * vis[..., 0]
        return {
            "img": np.ascontiguousarray(img),
            "bboxes": boxes.astype(np.float32),
            "cls": cls.astype(np.float32),
            "keypoints": kpts.astype(np.float32),
            "ori_shape": (h0, w0),
            "ratio_pad": ((ratio[0] * r1, ratio[1] * r1), pad),
            "im_file": self.im_files[i % len(self)],
        }

    def _load_segment_item(self, i: int):
        """(img resized, polygons px, cls) for mosaic assembly."""
        img, _, cls, _ = self.load_item(i, with_shape=True)
        h, w = img.shape[:2]
        polys = [s * np.asarray([w, h], np.float32)
                 for s in self.labels[i].get("segments", [])]
        return img, polys, cls

    def _get_segment_sample(self, i: int, rng: np.random.Generator):
        """Segment-task sample. Train: mosaic4 + affine with point-wise
        polygon warping (reference augment.py Mosaic/RandomPerspective with
        segments); else letterbox. Boxes are recomputed from the final
        polygons."""
        hyp = self.hyp
        if self.augment and self.mosaic_enabled and rng.random() < hyp.get("mosaic", 1.0):
            idxs = [i] + list(rng.integers(0, len(self), 3))
            items = [self._load_segment_item(j) for j in idxs]
            img, segments, cls = A.mosaic4_segments(items, self.imgsz, rng)
            # reference transform order: Mosaic -> CopyPaste -> RandomPerspective
            img, segments, cls = A.copy_paste_flip(
                img, segments, cls, hyp.get("copy_paste", 0.0), rng
            )
            img, segments, cls = A.random_perspective_segments(
                img, segments, cls, rng,
                degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
                scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
                perspective=hyp.get("perspective", 0.0),
                border=(-self.imgsz // 2, -self.imgsz // 2),
            )
            img = np.ascontiguousarray(img)
            A.augment_hsv(img, rng, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7),
                          hyp.get("hsv_v", 0.4))
            if rng.random() < hyp.get("fliplr", 0.5):
                img = np.ascontiguousarray(np.fliplr(img))
                segments = [np.stack([img.shape[1] - s[:, 0], s[:, 1]], -1)
                            for s in segments]
            boxes = (
                np.stack([
                    np.asarray([s[:, 0].min(), s[:, 1].min(), s[:, 0].max(), s[:, 1].max()])
                    for s in segments
                ]) if segments else np.zeros((0, 4), np.float32)
            )
            return {
                "img": img,
                "bboxes": boxes.astype(np.float32),
                "cls": np.asarray(cls, np.float32),
                "segments": segments,
                "ori_shape": (self.imgsz, self.imgsz),
                "ratio_pad": ((1.0, 1.0), (0.0, 0.0)),
                "im_file": self.im_files[i % len(self)],
            }
        img, _, cls, (h0, w0) = self.load_item(i, with_shape=True)
        r1 = img.shape[0] / h0
        h, w = img.shape[:2]
        segments = [s * np.asarray([w, h], np.float32) for s in self.labels[i].get("segments", [])]
        img, ratio, pad = A.letterbox(img, self.imgsz, scaleup=self.augment)
        segments = [s * ratio[0] + np.asarray(pad, np.float32) for s in segments]
        if self.augment:
            img = np.ascontiguousarray(img)
            img, segments, cls = A.copy_paste_flip(
                img, segments, cls, hyp.get("copy_paste", 0.0), rng
            )
            A.augment_hsv(img, rng, self.hyp.get("hsv_h", 0.015), self.hyp.get("hsv_s", 0.7),
                          self.hyp.get("hsv_v", 0.4))
            if rng.random() < self.hyp.get("fliplr", 0.5):
                img = np.ascontiguousarray(np.fliplr(img))
                segments = [np.stack([img.shape[1] - s[:, 0], s[:, 1]], -1) for s in segments]
        boxes = (
            np.stack([
                np.asarray([s[:, 0].min(), s[:, 1].min(), s[:, 0].max(), s[:, 1].max()])
                for s in segments
            ]) if segments else np.zeros((0, 4), np.float32)
        )
        return {
            "img": np.ascontiguousarray(img),
            "bboxes": boxes.astype(np.float32),
            "cls": cls.astype(np.float32),
            "segments": segments,
            "ori_shape": (h0, w0),
            "ratio_pad": ((ratio[0] * r1, ratio[1] * r1), pad),
            "im_file": self.im_files[i % len(self)],
        }
