"""Solution app tests (parity surface: reference tests/test_solutions.py)."""

import numpy as np

from yolo_ad_refine_tpu.engine.results import Results
from yolo_ad_refine_tpu.solutions import (
    DistanceCalculator,
    Heatmap,
    ObjectCounter,
    QueueManager,
    SpeedEstimator,
)


def frame_results(rows):
    """rows: list of (x1, y1, x2, y2, tid, conf, cls)."""
    img = np.zeros((200, 200, 3), np.uint8)
    boxes = np.asarray(rows, np.float32).reshape(-1, 7)
    return Results(img, "f.jpg", {0: "obj"}, boxes)


class TestObjectCounter:
    def test_line_crossing_in_and_out(self):
        counter = ObjectCounter(region=[(100, 0), (100, 200)])  # vertical line x=100
        # track 1 moves left->right (crosses in), track 2 right->left (out)
        for t in range(5):
            counter.update(frame_results([
                (80 + 10 * t, 50, 90 + 10 * t, 60, 1, 0.9, 0),
                (120 - 10 * t, 150, 130 - 10 * t, 160, 2, 0.9, 0),
            ]))
        s = counter.summary()
        assert s["in"] + s["out"] == 2
        assert s["in"] == 1 and s["out"] == 1

    def test_region_entry(self):
        counter = ObjectCounter(region=[(50, 50), (150, 50), (150, 150), (50, 150)])
        counter.update(frame_results([(0, 0, 10, 10, 7, 0.9, 0)]))  # outside
        counter.update(frame_results([(95, 95, 105, 105, 7, 0.9, 0)]))  # entered
        counter.update(frame_results([(96, 96, 106, 106, 7, 0.9, 0)]))  # still in: no double count
        assert counter.summary()["in"] == 1

    def test_class_filter(self):
        counter = ObjectCounter(region=[(100, 0), (100, 200)], classes=[1])
        for t in range(4):
            counter.update(frame_results([(80 + 15 * t, 50, 90 + 15 * t, 60, 3, 0.9, 0)]))
        assert counter.summary()["in"] == 0  # class 0 filtered out


class TestHeatmap:
    def test_accumulates_and_renders(self):
        hm = Heatmap((200, 200), decay=1.0)
        for _ in range(3):
            hm.update(frame_results([(10, 10, 30, 30, 1, 0.9, 0)]))
        assert hm.heat[20, 20] == 3.0
        assert hm.heat[100, 100] == 0.0
        frame = np.zeros((200, 200, 3), np.uint8)
        out = hm.render(frame)
        assert out.shape == (200, 200, 3)


class TestSpeed:
    def test_constant_velocity(self):
        # 10 px/frame at 30 fps, 10 px/m -> 1 m/frame * 30 = 30 m/s = 108 km/h
        est = SpeedEstimator(fps=30, pixels_per_meter=10)
        for t in range(5):
            est.update(frame_results([(10 * t, 50, 20 + 10 * t, 60, 1, 0.9, 0)]))
        assert abs(est.speeds[1] - 108.0) < 1.0


class TestQueueAndDistance:
    def test_queue_count(self):
        q = QueueManager(region=[(0, 0), (100, 0), (100, 100), (0, 100)])
        n = q.update(frame_results([
            (10, 10, 20, 20, 1, 0.9, 0),
            (50, 50, 60, 60, 2, 0.9, 0),
            (150, 150, 160, 160, 3, 0.9, 0),  # outside
        ]))
        assert n == 2

    def test_distance(self):
        d = DistanceCalculator(pixels_per_meter=10)
        out = d.update(frame_results([
            (0, 0, 20, 20, 1, 0.9, 0),      # center (10, 10)
            (30, 40, 50, 60, 2, 0.9, 0),    # center (40, 50): dist 50 px = 5 m
        ]))
        assert abs(out[(1, 2)]["meters"] - 5.0) < 1e-3
