"""Triton client tests against a local mock KServe-v2 server.

Parity surface: reference utils/triton.py TritonRemoteModel (url parsing,
dtype coercion, alphabetical output ordering) — validated here over the
REST binary-tensor protocol with an in-process http.server that doubles the
input, so no Triton install or network egress is needed.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from yolo_ad_refine_tpu.utils.triton import TritonRemoteModel


class _MockTriton(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        assert self.path == "/v2/models/yolo"
        meta = {
            "name": "yolo",
            "inputs": [{"name": "images", "datatype": "FP32",
                        "shape": [-1, 3, 640, 640]}],
            "outputs": [{"name": "output1", "datatype": "FP32", "shape": [-1]},
                        {"name": "output0", "datatype": "FP32", "shape": [-1]}],
        }
        body = json.dumps(meta).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        assert self.path == "/v2/models/yolo/infer"
        total = int(self.headers["Content-Length"])
        jlen = int(self.headers["Inference-Header-Content-Length"])
        raw = self.rfile.read(total)
        header = json.loads(raw[:jlen])
        x = np.frombuffer(raw[jlen:], np.float32).reshape(
            header["inputs"][0]["shape"])
        y0 = (x * 2).astype(np.float32)          # output0 = 2x
        y1 = (x + 1).astype(np.float32)          # output1 = x+1
        out_header = {
            "outputs": [
                {"name": "output0", "datatype": "FP32", "shape": list(y0.shape),
                 "parameters": {"binary_data_size": y0.nbytes}},
                {"name": "output1", "datatype": "FP32", "shape": list(y1.shape),
                 "parameters": {"binary_data_size": y1.nbytes}},
            ]
        }
        hb = json.dumps(out_header).encode()
        body = hb + y0.tobytes() + y1.tobytes()
        self.send_response(200)
        self.send_header("Inference-Header-Content-Length", str(len(hb)))
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _MockTriton)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_url_parsing_and_metadata(server):
    m = TritonRemoteModel(f"http://{server}/yolo")
    assert m.endpoint == "yolo"
    assert m.input_names == ["images"]
    assert m.output_names == ["output0", "output1"]  # sorted
    assert m.np_input_formats == [np.float32]


def test_infer_roundtrip_and_dtype_coercion(server):
    m = TritonRemoteModel(f"http://{server}/yolo")
    x = np.arange(12, dtype=np.float16).reshape(1, 3, 2, 2)  # wrong dtype
    y0, y1 = m(x)
    assert y0.dtype == np.float16  # cast back to caller dtype
    np.testing.assert_allclose(y0.astype(np.float32),
                               x.astype(np.float32) * 2)
    np.testing.assert_allclose(y1.astype(np.float32),
                               x.astype(np.float32) + 1)


def test_autobackend_dispatches_triton(server):
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend

    ab = AutoBackend(f"http://{server}/yolo")
    assert ab.kind == "triton"
    x = np.ones((1, 4), np.float32)
    np.testing.assert_allclose(ab._fn(x), x * 2)
