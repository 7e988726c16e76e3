"""Track-and-classify action recognition over a video stream.

Reference analogue: examples/YOLOv8-Action-Recognition/action_recognition.py
(detect+track people, buffer per-track crops, run a video classifier over
the crop window, annotate the label). The reference downloads pretrained
TorchVision/HuggingFace video classifiers; this environment is zero-egress,
so the classifier here is any YAT classification model (a `*-cls.yaml`
config or a trained checkpoint from `yolo_ad_refine_tpu classify train`) —
applied per-crop with a majority vote over the sliding frame window, which
is the same temporal-aggregation contract.

Usage:
    python examples/action_recognition.py VIDEO \
        [--det-model yolo11n.yaml] [--cls-model yolo11n-cls.yaml] \
        [--window 8] [--crop-size 224] [--imgsz 320]
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict, deque, Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def letterbox_crop(img: np.ndarray, xyxy, size: int) -> np.ndarray:
    """Square-resize a box crop with gray padding (reference crops then
    lets the video model resize; one canonical crop keeps shapes static)."""
    import cv2

    x1, y1, x2, y2 = (int(max(0, v)) for v in xyxy)
    crop = img[y1:y2, x1:x2]
    if crop.size == 0:
        return np.full((size, size, 3), 114, np.uint8)
    h, w = crop.shape[:2]
    r = size / max(h, w)
    crop = cv2.resize(crop, (max(1, int(w * r)), max(1, int(h * r))))
    out = np.full((size, size, 3), 114, np.uint8)
    out[: crop.shape[0], : crop.shape[1]] = crop
    return out


class CropClassifier:
    """Batched classify-model forward over (N, S, S, 3) uint8 crops."""

    def __init__(self, cfg: str, names=None, crop_size: int = 224):
        import jax
        import jax.numpy as jnp

        from yolo_ad_refine_tpu.models.model import build_detection_model

        self.model = build_detection_model(cfg, imgsz=crop_size)
        self.names = names or {i: str(i) for i in range(self.model.nc)}
        self.crop_size = crop_size
        self._fwd = jax.jit(
            lambda v, x: jax.nn.softmax(self.model.graph.apply(v, x, train=False), -1))
        self._jnp = jnp

    def __call__(self, crops: np.ndarray) -> list[tuple[str, float]]:
        x = self._jnp.asarray(crops, self._jnp.float32) / 255.0
        p = np.asarray(self._fwd(self.model.variables, x))
        top = p.argmax(-1)
        return [(self.names.get(int(c), str(int(c))), float(p[i, c]))
                for i, c in enumerate(top)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--det-model", default="yolo11n.yaml")
    ap.add_argument("--cls-model", default="yolo11n-cls.yaml")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--window", type=int, default=8,
                    help="frames per track aggregated into one vote")
    ap.add_argument("--crop-size", type=int, default=224)
    ap.add_argument("--person-class", type=int, default=0)
    args = ap.parse_args()

    from yolo_ad_refine_tpu import YOLO

    det = YOLO(args.det_model, imgsz=args.imgsz)
    cls = CropClassifier(args.cls_model, crop_size=args.crop_size)

    votes: dict[int, deque] = defaultdict(lambda: deque(maxlen=args.window))
    labels: dict[int, str] = {}

    n_frames = 0
    for res in det.track(args.video, conf=args.conf, imgsz=args.imgsz):
        n_frames += 1
        if res.boxes is None or len(res.boxes) == 0:
            continue
        ids = res.boxes.id
        if ids is None:
            continue
        keep = [i for i in range(len(res.boxes))
                if int(res.boxes.cls[i]) == args.person_class]
        if not keep:
            continue
        crops = np.stack([
            letterbox_crop(res.orig_img, res.boxes.xyxy[i], args.crop_size)
            for i in keep])
        for i, (name, conf) in zip(keep, cls(crops)):
            tid = int(ids[i])
            votes[tid].append(name)
            labels[tid] = Counter(votes[tid]).most_common(1)[0][0]

    for tid, label in sorted(labels.items()):
        print(f"track {tid}: {label} ({len(votes[tid])} frame votes)")
    print(f"{n_frames} frames processed, {len(labels)} tracks classified")


if __name__ == "__main__":
    main()
