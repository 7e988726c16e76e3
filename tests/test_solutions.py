"""Solution app tests (parity surface: reference tests/test_solutions.py)."""

import numpy as np
import pytest

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


class TestAIGym:
    def test_rep_counting(self):
        from yolo_ad_refine_tpu.solutions import AIGym

        gym = AIGym(kpts=(5, 7, 9), up_angle=145.0, down_angle=90.0)

        def pose_results(angle_deg, tid=1):
            """One person whose monitored joint sits at the given angle."""
            img = np.zeros((200, 200, 3), np.uint8)
            boxes = np.asarray([[50, 50, 150, 150, tid, 0.9, 0]], np.float32)
            k = np.zeros((1, 17, 3), np.float32)
            rad = np.deg2rad(angle_deg)
            k[0, 5] = (100 + 50, 100, 1)                        # a
            k[0, 7] = (100, 100, 1)                             # b (vertex)
            k[0, 9] = (100 + 50 * np.cos(rad), 100 + 50 * np.sin(rad), 1)
            return Results(img, "f.jpg", {0: "person"}, boxes, keypoints=k)

        # up -> down -> up -> down = 2 reps
        for ang in (170, 60, 170, 60):
            gym.update(pose_results(ang))
        s = gym.summary()
        assert s["count"][1] == 2
        assert s["stage"][1] == "down"

    def test_angle_estimate(self):
        from yolo_ad_refine_tpu.solutions.ai_gym import estimate_pose_angle

        assert abs(estimate_pose_angle((1, 0), (0, 0), (0, 1)) - 90.0) < 1e-6
        assert abs(estimate_pose_angle((1, 0), (0, 0), (-1, 0)) - 180.0) < 1e-6


class TestAnalytics:
    def test_line_and_pie_render(self):
        from yolo_ad_refine_tpu.solutions import Analytics

        for chart in ("line", "pie", "bar", "area"):
            an = Analytics(chart_type=chart, names={0: "obj"})
            for f in range(3):
                frame = an.update(f, frame_results(
                    [(10, 10, 30, 30, 1, 0.9, 0)] * (f + 1)))
            assert frame.ndim == 3 and frame.shape[-1] == 3 and frame.dtype == np.uint8
        assert an.totals == [1, 2, 3]

    @pytest.mark.slow
    def test_rolling_window(self):
        from yolo_ad_refine_tpu.solutions import Analytics
        from yolo_ad_refine_tpu.solutions.analytics import MAX_POINTS

        an = Analytics(chart_type="line")
        for f in range(MAX_POINTS + 10):
            an.update(f, frame_results([(10, 10, 30, 30, 1, 0.9, 0)]))
        assert len(an.frames) == MAX_POINTS


class TestParkingManager:
    def test_occupancy(self, tmp_path):
        import json

        from yolo_ad_refine_tpu.solutions import ParkingManager

        slots = [{"points": [[0, 0], [100, 0], [100, 100], [0, 100]]},
                 {"points": [[100, 0], [200, 0], [200, 100], [100, 100]]}]
        p = tmp_path / "slots.json"
        p.write_text(json.dumps(slots))
        pm = ParkingManager(p)
        s = pm.update(frame_results([(10, 10, 50, 50, 1, 0.9, 0)]))  # slot 0
        assert s["Occupancy"] == 1 and s["Available"] == 1
        assert s["slots"] == [True, False]
        img = pm.annotate(np.zeros((200, 200, 3), np.uint8))
        assert img.any()  # polygons drawn

    def test_headless_inference_helper_importable(self):
        from yolo_ad_refine_tpu.solutions import run_headless  # noqa: F401


class TestAnnotatedPipelines:
    """Round-3 enrichment: the reference's annotated-frame pipelines
    (region overlay, box labels, track trails, count displays)."""

    def test_counter_annotated_frame(self):
        from yolo_ad_refine_tpu.solutions import ObjectCounter

        counter = ObjectCounter(region=[(100, 0), (100, 200)],
                                names={0: "obj"})
        img = np.zeros((200, 200, 3), np.uint8)
        for t in range(5):
            out = counter.count(img.copy(), frame_results([
                (80 + 10 * t, 50, 90 + 10 * t, 60, 1, 0.9, 0)]))
        assert out.any()  # region + boxes + trails drew something
        assert counter.summary()["in"] + counter.summary()["out"] == 1

    def test_queue_annotated_frame(self):
        from yolo_ad_refine_tpu.solutions import QueueManager

        q = QueueManager(region=[(0, 0), (100, 0), (100, 100), (0, 100)])
        img = np.zeros((200, 200, 3), np.uint8)
        # frame 1: track has no history yet -> not counted (reference
        # queue_management.py:50-53 prev_position gate)
        q.process_queue(img.copy(), frame_results([(10, 10, 20, 20, 1, 0.9, 0)]))
        assert q.count == 0
        out = q.process_queue(img.copy(),
                              frame_results([(12, 12, 22, 22, 1, 0.9, 0)]))
        assert q.count == 1
        assert out.any()

    def test_heatmap_radial_and_blend(self):
        from yolo_ad_refine_tpu.solutions import Heatmap

        hm = Heatmap((200, 200))
        img = np.zeros((200, 200, 3), np.uint8)
        out = hm.generate_heatmap(img, frame_results([(40, 40, 80, 80, 1, 0.9, 0)]))
        # +2 inside the inscribed circle, untouched outside the box
        assert hm.heat[60, 60] == 2.0
        assert hm.heat[41, 41] == 0.0  # corner outside the circle
        assert hm.heat[150, 150] == 0.0
        assert out.shape == (200, 200, 3) and out.any()

    def test_heatmap_with_region_counts(self):
        from yolo_ad_refine_tpu.solutions import Heatmap

        hm = Heatmap((200, 200), region=[(0, 100), (200, 100)], names={0: "obj"})
        img = np.zeros((200, 200, 3), np.uint8)
        for t in range(5):
            hm.generate_heatmap(img.copy(), frame_results([
                (50, 80 + 10 * t, 70, 100 + 10 * t, 3, 0.9, 0)]))
        s = hm.counter.summary()
        assert s["in"] + s["out"] == 1  # crossed the line once
