"""Inference source loaders: images, directories, videos, streams, arrays.

Parity surface: reference data/loaders.py:33-523 (LoadImagesAndVideos,
LoadStreams, LoadPilAndNumpy) + build.py:148 (check_source dispatch).
Everything yields (path, frame BGR, metadata) host-side.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path

import cv2
import numpy as np

from yolo_ad_refine_tpu.data.dataset import IMG_FORMATS
from yolo_ad_refine_tpu.utils import LOGGER

VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv", "webm"}


class LoadImagesAndVideos:
    """Iterate image files and video frames (reference loaders.py:251)."""

    def __init__(self, source: str | Path, vid_stride: int = 1):
        p = Path(source)
        if p.is_dir():
            files = sorted(f for f in p.rglob("*") if f.suffix[1:].lower() in IMG_FORMATS | VID_FORMATS)
        elif p.is_file():
            files = [p]
        else:
            raise FileNotFoundError(f"source not found: {source}")
        self.files = files
        self.vid_stride = vid_stride

    def __iter__(self):
        for f in self.files:
            if f.suffix[1:].lower() in VID_FORMATS:
                cap = cv2.VideoCapture(str(f))
                idx = 0
                while True:
                    ok = cap.grab()
                    if not ok:
                        break
                    idx += 1
                    if idx % self.vid_stride:
                        continue
                    ok, frame = cap.retrieve()
                    if not ok:
                        break
                    yield str(f), frame, {"frame": idx, "video": True}
                cap.release()
            else:
                im = cv2.imread(str(f))
                if im is None:
                    LOGGER.warning(f"skipping unreadable {f}")
                    continue
                yield str(f), im, {"frame": 0, "video": False}


class LoadStreams:
    """Threaded webcam/RTSP reader (reference loaders.py:33)."""

    def __init__(self, source: str = "0", vid_stride: int = 1, buffer: bool = False):
        self.source = int(source) if str(source).isdigit() else source
        self.vid_stride = vid_stride
        self.buffer = buffer
        self.cap = cv2.VideoCapture(self.source)
        if not self.cap.isOpened():
            raise ConnectionError(f"failed to open stream {source}")
        self.frame = None
        self.running = True
        self.lock = threading.Lock()
        self.thread = threading.Thread(target=self._reader, daemon=True)
        self.thread.start()

    def _reader(self):
        n = 0
        while self.running and self.cap.isOpened():
            n += 1
            self.cap.grab()
            if n % self.vid_stride == 0:
                ok, frame = self.cap.retrieve()
                if ok:
                    with self.lock:
                        self.frame = frame
            time.sleep(0.0)

    def __iter__(self):
        i = 0
        while self.running:
            with self.lock:
                frame = None if self.frame is None else self.frame.copy()
            if frame is None:
                time.sleep(0.01)
                continue
            i += 1
            yield str(self.source), frame, {"frame": i, "video": True}

    def close(self):
        self.running = False
        self.thread.join(timeout=1)
        self.cap.release()


def load_inference_source(source, vid_stride: int = 1):
    """Dispatch source type (reference build.py:148 check_source)."""
    if isinstance(source, np.ndarray):
        def gen():
            yield "image0.jpg", source, {"frame": 0, "video": False}

        return gen()
    s = str(source)
    if s.isdigit() or s.startswith(("rtsp://", "rtmp://", "http://", "https://", "tcp://")):
        return LoadStreams(s, vid_stride)
    return LoadImagesAndVideos(source, vid_stride)
