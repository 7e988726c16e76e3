"""Tracker tests: Kalman sanity, BYTE association behavior, BOTSORT GMC,
end-to-end track() over a synthetic video of a moving box."""

import numpy as np
import pytest

from yolo_ad_refine_tpu.trackers import BOTSORT, BYTETracker
from yolo_ad_refine_tpu.trackers.kalman import KalmanFilterXYAH


class TestKalman:
    def test_initiate_predict_update(self):
        kf = KalmanFilterXYAH()
        m, c = kf.initiate(np.array([10.0, 20.0, 0.5, 8.0]))
        assert m.shape == (8,) and c.shape == (8, 8)
        m2, c2 = kf.predict(m, c)
        np.testing.assert_allclose(m2[:4], m[:4])  # zero velocity -> same position
        m3, c3 = kf.update(m2, c2, np.array([12.0, 22.0, 0.5, 8.0]))
        assert 10.0 < m3[0] <= 12.0  # pulled toward the measurement
        assert np.trace(c3[:4, :4]) < np.trace(c2[:4, :4])  # uncertainty shrinks


def det(x, y, s=20.0, score=0.9, cls=0):
    return np.array([x, y, x + s, y + s], np.float32), score, cls


class TestBYTE:
    def run_sequence(self, tracker, positions, score=0.9):
        outs = []
        for pos in positions:
            boxes = np.stack([det(x, y)[0] for x, y in pos]) if pos else np.zeros((0, 4), np.float32)
            scores = np.full(len(pos), score, np.float32)
            clses = np.zeros(len(pos), np.float32)
            outs.append(tracker.update(boxes, scores, clses))
        return outs

    def test_stable_identity(self):
        """A smoothly moving box keeps one track id."""
        tracker = BYTETracker()
        positions = [[(10 + 3 * t, 10 + 2 * t)] for t in range(10)]
        outs = self.run_sequence(tracker, positions)
        ids = {int(o[0, 4]) for o in outs if len(o)}
        assert len(ids) == 1
        assert len(outs[-1]) == 1

    def test_two_objects_two_ids(self):
        tracker = BYTETracker()
        positions = [[(10 + t, 10), (200 - t, 200)] for t in range(8)]
        outs = self.run_sequence(tracker, positions)
        last = outs[-1]
        assert len(last) == 2
        assert len({int(r[4]) for r in last}) == 2

    def test_occlusion_reassociation(self):
        """Track survives a short dropout via the lost-track pool."""
        tracker = BYTETracker(track_buffer=30)
        pos = [[(50 + 2 * t, 50)] for t in range(5)]
        pos += [[]] * 3  # occluded
        pos += [[(50 + 2 * t, 50)] for t in range(8, 12)]
        outs = self.run_sequence(tracker, pos)
        first_id = int(outs[0][0, 4]) if len(outs[0]) else int(outs[1][0, 4])
        last_id = int(outs[-1][0, 4])
        assert first_id == last_id

    def test_low_conf_byte_association(self):
        """Low-confidence detections keep an existing track alive (the BYTE trick)
        but never start new tracks."""
        tracker = BYTETracker(track_high_thresh=0.5, track_low_thresh=0.1,
                              new_track_thresh=0.5)
        b, s, c = det(10, 10, score=0.9)
        tracker.update(np.stack([b]), np.array([0.9]), np.array([0.0]))
        # weak detection of the same object
        b2, _, _ = det(12, 11, score=0.3)
        out = tracker.update(np.stack([b2]), np.array([0.3]), np.array([0.0]))
        assert len(out) == 1  # track continued by the low-conf det
        # a weak detection far away must NOT create a track
        b3, _, _ = det(300, 300, score=0.3)
        out = tracker.update(np.stack([b2, b3]), np.array([0.3, 0.3]), np.array([0.0, 0.0]))
        assert len(out) == 1


class TestBOTSORT:
    def test_with_camera_motion(self):
        import cv2

        tracker = BOTSORT()
        rng = np.random.default_rng(0)
        base = rng.integers(0, 120, (240, 320, 3), dtype=np.uint8)
        ids = []
        for t in range(6):
            frame = np.roll(base, shift=2 * t, axis=1)  # camera pans right
            x = 100 + 2 * t
            cv2.rectangle(frame, (x, 100), (x + 30, 130), (255, 255, 255), -1)
            b = np.array([[x, 100, x + 30, 130]], np.float32)
            out = tracker.update(b, np.array([0.9]), np.array([0.0]), img=frame)
            if len(out):
                ids.append(int(out[0, 4]))
        assert len(set(ids)) == 1


class TestTrackE2E:
    def test_track_over_frames(self, tmp_path):
        """YOLO.track on a synthetic video: moving colored box keeps its id."""
        import cv2

        from yolo_ad_refine_tpu.models.model import build_detection_model
        from yolo_ad_refine_tpu.engine.track import track

        vid = tmp_path / "v.avi"
        w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 10, (128, 128))
        for t in range(6):
            frame = np.full((128, 128, 3), 30, np.uint8)
            cv2.rectangle(frame, (20 + 5 * t, 40), (60 + 5 * t, 80), (0, 0, 255), -1)
            w.write(frame)
        w.release()

        tiny = {
            "nc": 3,
            "backbone": [
                [-1, 1, "Conv", [16, 3, 2]],
                [-1, 1, "Conv", [32, 3, 2]],
                [-1, 1, "Conv", [64, 3, 2]],
                [-1, 1, "Conv", [128, 3, 2]],
                [-1, 1, "Conv", [256, 3, 2]],
            ],
            "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
        }
        model = build_detection_model(tiny, imgsz=64)
        results = track(model, str(vid), imgsz=64, conf=1e-5, max_det=5,
                        tracker_args={"new_track_thresh": 0.0, "track_high_thresh": 1e-6,
                                      "track_low_thresh": 1e-7})
        assert len(results) == 6
        # rows are (n, 7) with a track-id column
        for r in results:
            if len(r.boxes):
                assert r.boxes.data.shape[1] == 7
                assert r.boxes.id is not None
                r.plot()  # id renders without error
