"""Inference result containers.

Parity surface: reference engine/results.py:187-1741 (Results/Boxes): user
access to boxes in xyxy/xywh/normalized forms, .plot() annotation,
.save_txt(), .tojson(), .verbose(). Host-side numpy — results are small.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


class Boxes:
    """(n, 6) detections [x1, y1, x2, y2, conf, cls] or (n, 7) tracking rows
    [x1, y1, x2, y2, track_id, conf, cls], original-image pixels."""

    def __init__(self, data: np.ndarray, orig_shape: tuple):
        data = np.asarray(data, dtype=np.float32)
        if data.ndim == 1:
            data = data.reshape(-1, 6)
        assert data.shape[-1] in (6, 7), f"expected 6 or 7 columns, got {data.shape}"
        self.data = data
        self.is_track = data.shape[-1] == 7
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def id(self):
        return self.data[:, 4] if self.is_track else None

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.concatenate([(b[:, :2] + b[:, 2:]) / 2, b[:, 2:] - b[:, :2]], -1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.asarray([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.asarray([w, h, w, h], np.float32)


class Results:
    """Per-image result: boxes + metadata + render/save helpers."""

    def __init__(self, orig_img: np.ndarray, path: str, names: dict, boxes: np.ndarray,
                 speed: dict | None = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape)
        self.speed = speed or {}

    def __len__(self):
        return len(self.boxes)

    def plot(self, line_width: int | None = None, font_scale: float = 0.5):
        """Draw detections on a copy of the original (BGR) image."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape) / 2 * 0.003), 2)
        for i, row in enumerate(self.boxes.data):
            x1, y1, x2, y2 = row[:4]
            conf, cls = row[-2], row[-1]
            c = int(cls)
            color = tuple(int(x) for x in np.array([37, 255, 153]) * ((c * 17 + 29) % 7 + 1) % 255)
            p1, p2 = (int(x1), int(y1)), (int(x2), int(y2))
            cv2.rectangle(img, p1, p2, color, lw)
            tid = f"id:{int(row[4])} " if self.boxes.is_track else ""
            label = f"{tid}{self.names.get(c, c)} {conf:.2f}"
            tw, th = cv2.getTextSize(label, 0, font_scale, 1)[0]
            cv2.rectangle(img, p1, (p1[0] + tw, p1[1] - th - 3), color, -1)
            cv2.putText(img, label, (p1[0], p1[1] - 2), 0, font_scale, (255, 255, 255), 1)
        return img

    def save(self, filename: str | Path):
        import cv2

        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(filename), self.plot())
        return filename

    def save_txt(self, txt_file: str | Path, save_conf: bool = False):
        lines = []
        for x, c, conf in zip(self.boxes.xywhn, self.boxes.cls, self.boxes.conf):
            row = (int(c), *x.tolist()) + ((float(conf),) if save_conf else ())
            lines.append(("%g " * len(row)).rstrip() % row)
        p = Path(txt_file)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("\n".join(lines) + ("\n" if lines else ""))
        return p

    def tojson(self) -> str:
        out = []
        for row in self.boxes.data:
            x1, y1, x2, y2 = row[:4]
            entry = {
                "name": str(self.names.get(int(row[-1]), int(row[-1]))),
                "class": int(row[-1]),
                "confidence": round(float(row[-2]), 5),
                "box": {"x1": float(x1), "y1": float(y1), "x2": float(x2), "y2": float(y2)},
            }
            if self.boxes.is_track:
                entry["track_id"] = int(row[4])
            out.append(entry)
        return json.dumps(out, indent=2)

    def verbose(self) -> str:
        if not len(self.boxes):
            return "(no detections)"
        counts = {}
        for c in self.boxes.cls.astype(int):
            counts[c] = counts.get(c, 0) + 1
        return ", ".join(f"{n} {self.names.get(c, c)}{'s' * (n > 1)}" for c, n in counts.items())
