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
