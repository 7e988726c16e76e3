"""Queue length monitoring in a region (parity: reference solutions/queue_management.py)."""

from __future__ import annotations

from yolo_ad_refine_tpu.solutions.object_counter import _point_in_polygon


class QueueManager:
    def __init__(self, region: list[tuple]):
        assert len(region) >= 3, "queue region must be a polygon"
        self.region = [tuple(map(float, p)) for p in region]
        self.count = 0
        self.history: list[int] = []

    def update(self, results) -> int:
        n = 0
        for row in results.boxes.data:
            cx, cy = float((row[0] + row[2]) / 2), float((row[1] + row[3]) / 2)
            if _point_in_polygon((cx, cy), self.region):
                n += 1
        self.count = n
        self.history.append(n)
        return n
