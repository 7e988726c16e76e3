"""Build + drive the standalone C++ inference example end to end.

A mock KServe-v2 server returns a synthetic (1, 84, n) prediction tensor
with two strong, well-separated boxes placed in LETTERBOXED coordinates;
the C++ app must letterbox the jpeg, post the tensor, NMS the response and
print boxes mapped back to original-image coordinates.

Parity surface: reference examples/YOLOv8-CPP-Inference (native pre/post
against a deployed model).
"""

import json
import shutil
import subprocess
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
SRC = ROOT / "examples" / "cpp_inference"

IMG_W, IMG_H = 320, 240  # original image (landscape -> letterbox pads top)
IMGSZ = 160
NC = 80


def _expected_meta():
    r = min(IMGSZ / IMG_H, IMGSZ / IMG_W, 1.0)
    nw, nh = round(IMG_W * r), round(IMG_H * r)
    dw, dh = (IMGSZ - nw) / 2, (IMGSZ - nh) / 2
    return r, round(dw - 0.1), round(dh - 0.1)


def _make_preds():
    """(1, 84, n) tensor: two confident boxes + noise floor."""
    n = 64
    p = np.zeros((1, 4 + NC, n), np.float32)
    p[0, :4] = 10.0  # degenerate tiny boxes everywhere
    r, dw, dh = _expected_meta()
    # box A: center (100, 100) size (60, 40) in ORIGINAL coords, class 3
    p[0, 0, 0], p[0, 1, 0] = 100 * r + dw, 100 * r + dh
    p[0, 2, 0], p[0, 3, 0] = 60 * r, 40 * r
    p[0, 3 + 4, 0] = 0.9
    # box B: duplicate of A shifted 2px (should be NMS-suppressed)
    p[0, 0, 1], p[0, 1, 1] = 102 * r + dw, 100 * r + dh
    p[0, 2, 1], p[0, 3, 1] = 60 * r, 40 * r
    p[0, 3 + 4, 1] = 0.6
    # box C: far corner, class 7
    p[0, 0, 2], p[0, 1, 2] = 250 * r + dw, 180 * r + dh
    p[0, 2, 2], p[0, 3, 2] = 40 * r, 40 * r
    p[0, 7 + 4, 2] = 0.8
    return p


class _Server(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        assert self.path == "/v2/models/yolo/infer"
        total = int(self.headers["Content-Length"])
        jlen = int(self.headers["Inference-Header-Content-Length"])
        raw = self.rfile.read(total)
        header = json.loads(raw[:jlen])
        shape = header["inputs"][0]["shape"]
        assert shape == [1, 3, IMGSZ, IMGSZ], shape
        x = np.frombuffer(raw[jlen:], np.float32).reshape(shape)
        # the letterbox pad rows must carry the 114/255 fill
        assert abs(float(x[0, 0, 0, 0]) - 114 / 255) < 1e-3
        y = _make_preds()
        hb = json.dumps({
            "outputs": [{"name": "output0", "datatype": "FP32",
                         "shape": list(y.shape),
                         "parameters": {"binary_data_size": y.nbytes}}]
        }).encode()
        body = hb + y.tobytes()
        self.send_response(200)
        self.send_header("Inference-Header-Content-Length", str(len(hb)))
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    out = tmp_path_factory.mktemp("cppex") / "yat_infer"
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-Wall", "-o", str(out),
         str(SRC / "yat_infer.cpp"), "-ljpeg"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return out


def test_cpp_example_end_to_end(binary, tmp_path):
    import cv2

    img = np.full((IMG_H, IMG_W, 3), 80, np.uint8)
    jpg = tmp_path / "in.jpg"
    cv2.imwrite(str(jpg), img)

    srv = HTTPServer(("127.0.0.1", 0), _Server)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        r = subprocess.run(
            [str(binary), "127.0.0.1", str(srv.server_port), "yolo",
             str(jpg), str(IMGSZ), "0.25"],
            capture_output=True, text=True, timeout=30)
    finally:
        srv.shutdown()
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().split("\n")
    assert lines[0].startswith("2 detections"), r.stdout  # B suppressed
    dets = {}
    for ln in lines[1:]:
        parts = dict(kv.split("=") for kv in ln.replace("box=", "box=").split(" ", 2))
        cls = int(parts["cls"])
        box = [float(v) for v in
               ln.split("[")[1].rstrip("]").split(",")]
        dets[cls] = box
    assert set(dets) == {3, 7}
    # class-3 box back in original coordinates: center (100,100) size (60,40)
    x1, y1, x2, y2 = dets[3]
    assert abs((x1 + x2) / 2 - 100) < 3 and abs((y1 + y2) / 2 - 100) < 3
    assert abs((x2 - x1) - 60) < 3 and abs((y2 - y1) - 40) < 3
