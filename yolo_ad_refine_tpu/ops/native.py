"""ctypes bindings for the native C++ host ops (csrc/yat_ops.cpp).

Compiled on first use with g++ into ~/.cache/yolo_ad_refine_tpu/libyat_ops.so
(no pybind11 in this environment — plain C ABI over numpy buffers). Falls
back to None when no compiler is available; callers must guard.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

from yolo_ad_refine_tpu.utils import LOGGER, ROOT

_LIB = None
_TRIED = False
CSRC = ROOT.parent / "csrc" / "yat_ops.cpp"


def _build_lib() -> Path | None:
    if not CSRC.exists():
        return None
    cache = Path(os.environ.get("YAT_NATIVE_CACHE",
                                os.path.expanduser("~/.cache/yolo_ad_refine_tpu")))
    cache.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha1(CSRC.read_bytes()).hexdigest()[:12]
    so = cache / f"libyat_ops_{tag}.so"
    if so.exists():
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(CSRC), "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        LOGGER.info(f"built native ops: {so.name}")
        return so
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        LOGGER.warning(f"native ops build failed ({e}); using pure-python fallbacks")
        return None


def get_lib():
    """Load (building if needed) the native library; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _build_lib()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            lib.yat_nms.restype = ctypes.c_int
            lib.yat_nms.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
                ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.yat_letterbox.restype = None
            lib.yat_letterbox.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
            ]
            _LIB = lib
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def nms_native(boxes: np.ndarray, scores: np.ndarray, cls: np.ndarray,
               iou_thres: float = 0.45, conf_thres: float = 0.25, max_det: int = 300,
               max_wh: float = 7680.0, agnostic: bool = False) -> np.ndarray | None:
    """Greedy NMS in C++. Returns kept indices (score-descending) or None."""
    lib = get_lib()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    cls = np.ascontiguousarray(cls, np.float32)
    keep = np.zeros(len(boxes), np.int32)
    n = lib.yat_nms(_fptr(boxes), _fptr(scores), _fptr(cls), len(boxes),
                    iou_thres, conf_thres, max_det, max_wh, int(agnostic),
                    keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n]


def letterbox_native(img: np.ndarray, size: int, scaleup: bool = True):
    """C++ letterbox. Returns (out uint8 (size,size,3), ratio, (dw, dh)) or None."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((size, size, 3), np.uint8)
    meta = np.zeros(3, np.float32)
    lib.yat_letterbox(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                      size, int(scaleup),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fptr(meta))
    return out, (float(meta[0]), float(meta[0])), (float(meta[1]), float(meta[2]))


# ---------------------------------------------------------------------------
# Native threaded image loader (csrc/yat_loader.cpp): libjpeg decode +
# letterbox on a std::thread pool — the reference's DataLoader-worker
# equivalent (reference data/build.py:127) without Python/GIL in the loop.
# ---------------------------------------------------------------------------

LOADER_CSRC = ROOT.parent / "csrc" / "yat_loader.cpp"
_LOADER_LIB = None
_LOADER_TRIED = False


def get_loader_lib():
    global _LOADER_LIB, _LOADER_TRIED
    if _LOADER_LIB is None and not _LOADER_TRIED:
        _LOADER_TRIED = True
        if not LOADER_CSRC.exists():
            return None
        cache = Path(os.environ.get("YAT_NATIVE_CACHE",
                                    os.path.expanduser("~/.cache/yolo_ad_refine_tpu")))
        cache.mkdir(parents=True, exist_ok=True)
        tag = hashlib.sha1(LOADER_CSRC.read_bytes()).hexdigest()[:12]
        so = cache / f"libyat_loader_{tag}.so"
        if not so.exists():
            cmd = ["g++", "-O3", "-shared", "-fPIC", str(LOADER_CSRC),
                   "-o", str(so), "-ljpeg"]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                LOGGER.info(f"built native loader: {so.name}")
            except (subprocess.SubprocessError, FileNotFoundError) as e:
                LOGGER.warning(f"native loader build failed ({e})")
                return None
        lib = ctypes.CDLL(str(so))
        lib.yat_load_image.restype = ctypes.c_int
        lib.yat_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ]
        lib.yat_loader_create.restype = ctypes.c_void_p
        lib.yat_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.yat_loader_next.restype = ctypes.c_int
        lib.yat_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.yat_loader_destroy.restype = None
        lib.yat_loader_destroy.argtypes = [ctypes.c_void_p]
        _LOADER_LIB = lib
    return _LOADER_LIB


def load_image_native(path: str, imgsz: int):
    """Decode+letterbox one JPEG natively. Returns (img (s,s,3) BGR uint8,
    (h0, w0), ratio, (dw, dh)) or None when unavailable/not a jpeg."""
    lib = get_loader_lib()
    if lib is None:
        return None
    out = np.empty((imgsz, imgsz, 3), np.uint8)
    meta = np.zeros(5, np.float32)
    rc = lib.yat_load_image(str(path).encode(), imgsz,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            _fptr(meta))
    if rc != 0:
        return None
    return out, (int(meta[0]), int(meta[1])), float(meta[2]), (float(meta[3]), float(meta[4]))


class NativeBatchLoader:
    """Threaded decode+letterbox batches over a list of JPEG paths.

    Iterates (imgs (b, s, s, 3) uint8 BGR, meta (b, 5) [h0, w0, r, dw, dh]).
    """

    def __init__(self, paths, imgsz: int, batch: int, threads: int = 4):
        lib = get_loader_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.paths = [str(p) for p in paths]
        self.imgsz = imgsz
        self.batch = batch
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._keepalive = arr
        self._h = lib.yat_loader_create(arr, len(self.paths), imgsz, batch,
                                        threads)

    def __iter__(self):
        while True:
            imgs = np.empty((self.batch, self.imgsz, self.imgsz, 3), np.uint8)
            meta = np.zeros((self.batch, 5), np.float32)
            n = self._lib.yat_loader_next(
                self._h, imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                _fptr(meta))
            if n == 0:
                break
            yield imgs[:n], meta[:n]

    def close(self):
        if self._h:
            self._lib.yat_loader_destroy(self._h)
            self._h = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:  # noqa: BLE001,S110 - interpreter teardown
            pass
