"""Detection heatmap accumulation (parity: reference solutions/heatmap.py)."""

from __future__ import annotations

import numpy as np


class Heatmap:
    """Accumulates per-pixel presence of detections, renders a color overlay."""

    def __init__(self, shape: tuple[int, int], decay: float = 0.99, colormap: int | None = None):
        self.heat = np.zeros(shape, np.float32)
        self.decay = decay
        self.colormap = colormap

    def update(self, results):
        self.heat *= self.decay
        h, w = self.heat.shape
        for row in results.boxes.data:
            x1, y1, x2, y2 = (int(max(0, v)) for v in row[:4])
            self.heat[min(y1, h) : min(y2, h), min(x1, w) : min(x2, w)] += 1.0
        return self.heat

    def render(self, frame: np.ndarray | None = None, alpha: float = 0.5) -> np.ndarray:
        import cv2

        norm = self.heat / (self.heat.max() + 1e-9)
        cmap = self.colormap if self.colormap is not None else cv2.COLORMAP_JET
        colored = cv2.applyColorMap((norm * 255).astype(np.uint8), cmap)
        if frame is None:
            return colored
        return cv2.addWeighted(frame, 1 - alpha, colored, alpha, 0)
