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


class LoadImagesNative:
    """GIL-free threaded JPEG decode+letterbox batches (csrc/yat_loader.cpp).

    The high-throughput path for directory-scale inference where the
    original frames aren't needed per-pixel (benchmarking, validation-style
    sweeps): yields (paths, imgs (b, s, s, 3) BGR uint8, meta (b, 5)
    [h0, w0, ratio, dw, dh]) with boxes rescalable to original coordinates
    from meta alone. Falls back is the caller's job (raises RuntimeError
    when the native library can't build).
    """

    def __init__(self, source, imgsz: int, batch: int = 16, threads: int = 4):
        from pathlib import Path

        from yolo_ad_refine_tpu.ops.native import NativeBatchLoader

        p = Path(source)
        if p.is_dir():
            self.paths = sorted(
                q for q in p.iterdir() if q.suffix.lower() in (".jpg", ".jpeg")
            )
        else:
            self.paths = [p]
        self._inner = NativeBatchLoader(self.paths, imgsz, batch, threads)
        self._cursor = 0

    def __iter__(self):
        for imgs, meta in self._inner:
            n = imgs.shape[0]
            paths = self.paths[self._cursor : self._cursor + n]
            self._cursor += n
            yield paths, imgs, meta
        self._inner.close()
