"""Sliced (SAHI-style) inference for small objects in large images.

Reference analogue: examples/YOLOv8-SAHI-Inference-Video (sahi package
slicing + per-slice predict + merged NMS). TPU-native differences: the
slice grid is STATIC (every tile is the same size, so one compiled forward
serves all tiles, batched), and the merge is the framework's fixed-shape
NMS over offset-shifted boxes.

Usage:
    python examples/sahi_tiled_inference.py IMAGE [MODEL.yaml] \
        [--tile 640] [--overlap 0.2] [--conf 0.25]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def tile_grid(h: int, w: int, tile: int, overlap: float):
    """Static tile origins covering (h, w) with the given fractional overlap."""
    stride = max(1, int(tile * (1 - overlap)))
    ys = list(range(0, max(h - tile, 0) + 1, stride)) or [0]
    xs = list(range(0, max(w - tile, 0) + 1, stride)) or [0]
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)
    return [(y, x) for y in ys for x in xs]


def sliced_predict(model, img: np.ndarray, tile: int = 640, overlap: float = 0.2,
                   conf: float = 0.25, iou: float = 0.5, max_det: int = 300):
    """Run the model over a static tile grid and merge with global NMS.

    Returns (boxes xyxy in full-image px, scores, classes).
    """
    import jax.numpy as jnp

    from yolo_ad_refine_tpu.ops.nms import non_max_suppression

    m = getattr(model, "model", model)  # YOLO facade or bare DetectionModel
    h, w = img.shape[:2]
    pad_h, pad_w = max(0, tile - h), max(0, tile - w)
    if pad_h or pad_w:
        img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=114)
        h, w = img.shape[:2]
    grid = tile_grid(h, w, tile, overlap)
    batch = np.stack([img[y : y + tile, x : x + tile] for (y, x) in grid])
    x_in = jnp.asarray(batch[..., ::-1].astype(np.float32) / 255.0)
    y, _ = m.apply(m.variables, x_in, train=False)
    det, cnt, _ = non_max_suppression(y, conf_thres=conf, iou_thres=iou,
                                      max_det=max_det)
    det = np.asarray(det)
    cnt = np.asarray(cnt)
    rows = []
    for ti, (oy, ox) in enumerate(grid):
        d = det[ti, : int(cnt[ti])].copy()
        d[:, [0, 2]] += ox
        d[:, [1, 3]] += oy
        rows.append(d)
    allrows = np.concatenate(rows, 0) if rows else np.zeros((0, 6), np.float32)
    if not len(allrows):
        return allrows[:, :4], allrows[:, 4], allrows[:, 5]
    # merged class-aware NMS over the union (fixed-shape under jit);
    # entry contract is (B, N, 4+nc) channels-last xywh + class scores
    nc = int(allrows[:, 5].max()) + 1
    merged = np.zeros((1, len(allrows), 4 + nc), np.float32)
    merged[0, :, 0:2] = (allrows[:, :2] + allrows[:, 2:4]) / 2  # xy center
    merged[0, :, 2:4] = allrows[:, 2:4] - allrows[:, :2]        # wh
    merged[0, np.arange(len(allrows)), 4 + allrows[:, 5].astype(int)] = allrows[:, 4]
    det2, cnt2, _ = non_max_suppression(
        jnp.asarray(merged), conf_thres=conf, iou_thres=iou,
        max_det=max_det, nc=nc)
    d = np.asarray(det2)[0, : int(np.asarray(cnt2)[0])]
    return d[:, :4], d[:, 4], d[:, 5]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("model", nargs="?", default="yolo11n.yaml")
    ap.add_argument("--tile", type=int, default=640)
    ap.add_argument("--overlap", type=float, default=0.2)
    ap.add_argument("--conf", type=float, default=0.25)
    args = ap.parse_args()

    import cv2

    from yolo_ad_refine_tpu import YOLO

    img = cv2.imread(args.image)
    model = YOLO(args.model, imgsz=args.tile)
    boxes, scores, classes = sliced_predict(model, img, tile=args.tile,
                                            overlap=args.overlap, conf=args.conf)
    print(f"{len(boxes)} detections over "
          f"{len(tile_grid(*img.shape[:2], args.tile, args.overlap))} tiles")
    for b, s, c in zip(boxes, scores, classes):
        print(f"  cls={int(c)} conf={s:.3f} box={np.round(b, 1).tolist()}")


if __name__ == "__main__":
    main()
