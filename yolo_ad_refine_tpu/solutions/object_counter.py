"""Line/region object counting over tracked detections.

Parity surface: reference solutions/object_counter.py — counts in/out
crossings of a line (or entries into a polygon region) per track id.
"""

from __future__ import annotations




def _side_of_line(p, a, b) -> float:
    return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])


def _point_in_polygon(p, poly) -> bool:
    x, y = p
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1:
            inside = not inside
    return inside


class ObjectCounter:
    """Counts objects crossing a line or inside a region.

    region: 2 points = counting line; >=3 points = polygon region.
    """

    def __init__(self, region: list[tuple], classes: list[int] | None = None):
        assert len(region) >= 2, "region needs >= 2 points"
        self.region = [tuple(map(float, p)) for p in region]
        self.classes = set(classes) if classes else None
        self.in_count = 0
        self.out_count = 0
        self.counted_ids: set[int] = set()
        self.class_counts: dict[int, dict[str, int]] = {}
        self._last_side: dict[int, float] = {}
        self._was_inside: dict[int, bool] = {}

    def update(self, results) -> dict:
        """Feed one frame's Results (track rows required for id-based counting)."""
        boxes = results.boxes
        if boxes.id is None:
            return self.summary()
        for row in boxes.data:
            tid = int(row[4])
            cls = int(row[-1])
            if self.classes is not None and cls not in self.classes:
                continue
            cx, cy = float((row[0] + row[2]) / 2), float((row[1] + row[3]) / 2)
            if len(self.region) == 2:
                side = _side_of_line((cx, cy), self.region[0], self.region[1])
                prev = self._last_side.get(tid)
                if prev is not None and side * prev < 0 and tid not in self.counted_ids:
                    if side > 0:
                        self.in_count += 1
                        self._bump(cls, "in")
                    else:
                        self.out_count += 1
                        self._bump(cls, "out")
                    self.counted_ids.add(tid)
                self._last_side[tid] = side
            else:
                inside = _point_in_polygon((cx, cy), self.region)
                was = self._was_inside.get(tid, False)
                if inside and not was and tid not in self.counted_ids:
                    self.in_count += 1
                    self._bump(cls, "in")
                    self.counted_ids.add(tid)
                self._was_inside[tid] = inside
        return self.summary()

    def _bump(self, cls: int, direction: str):
        self.class_counts.setdefault(cls, {"in": 0, "out": 0})[direction] += 1

    def summary(self) -> dict:
        return {"in": self.in_count, "out": self.out_count, "classwise": self.class_counts}
