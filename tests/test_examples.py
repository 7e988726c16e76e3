"""Example-app surface tests (reference examples/ dir: SAHI slicing,
int8 TFLite, region counter — SURVEY.md §2.8 native/python example apps)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))


def test_tile_grid_covers_image():
    from sahi_tiled_inference import tile_grid

    for (h, w, t, ov) in ((640, 640, 320, 0.2), (700, 500, 320, 0.25),
                          (200, 900, 320, 0.0)):
        grid = tile_grid(h, w, t, ov)
        cov = np.zeros((h, w), bool)
        for (y, x) in grid:
            cov[y : y + t, x : x + t] = True
        assert cov.all(), (h, w, t, ov)


@pytest.mark.slow
def test_sliced_predict_runs_and_merges():
    from sahi_tiled_inference import sliced_predict

    from yolo_ad_refine_tpu.models.model import build_detection_model

    cfg = {
        "nc": 2,
        "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]], [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
    }
    model = build_detection_model(cfg, imgsz=64)
    img = np.random.default_rng(0).integers(0, 255, (100, 150, 3), np.uint8)
    boxes, scores, classes = sliced_predict(model, img, tile=64, overlap=0.25,
                                            conf=1e-6, max_det=50)
    assert boxes.shape[1] == 4 and len(scores) == len(boxes) == len(classes)
    if len(boxes):
        # merged boxes live in FULL-image coordinates, not tile-local
        assert boxes[:, 2].max() > 64 or boxes[:, 0].max() <= 150


@pytest.mark.slow
def test_int8_tflite_export_roundtrip(tmp_path):
    pytest.importorskip("tensorflow")
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter
    from yolo_ad_refine_tpu.models.model import build_detection_model

    cfg = {
        "nc": 2,
        "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]], [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
    }
    model = build_detection_model(cfg, imgsz=64)
    x = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), np.uint8)
    import jax.numpy as jnp

    y_ref, _ = model.graph.apply(model.variables,
                                 jnp.asarray(x, jnp.float32) / 255.0, train=False)
    path = Exporter(model, imgsz=64)("tflite", tmp_path / "m", int8=True,
                                     n_calib=4)
    backend = AutoBackend(path)
    y = np.asarray(backend(x.astype(np.float32)))
    # int8 PTQ is lossy: demand the same shape and a correlated output
    assert y.shape == np.asarray(y_ref).shape
    a, b = np.asarray(y_ref).ravel(), y.ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr


@pytest.mark.slow
def test_region_counter_example_wires(tmp_path):
    """Drive the example's counting path on a tiny synthetic video."""
    import cv2

    vid = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    w.release()

    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, str(Path(__file__).parent.parent / "examples" / "region_counter.py"),
         str(vid), "--imgsz", "64"],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "YAT_FORCE_CPU": "1"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "region 'left'" in r.stdout and "frames processed" in r.stdout
