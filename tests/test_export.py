"""Export-format tests (parity surface: reference tests/test_exports.py).

Each format is exported AND re-loaded via AutoBackend, then run on an input,
checking output parity against the in-framework forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

TINY = {
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


@pytest.fixture(scope="module")
def model():
    from yolo_ad_refine_tpu.models.model import build_detection_model

    return build_detection_model(TINY, imgsz=64)


@pytest.fixture(scope="module")
def reference_output(model):
    x = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    y, _ = model.graph.apply(model.variables, jnp.asarray(x, jnp.float32) / 255.0, train=False)
    return x, np.asarray(y)


def test_export_checkpoint_roundtrip(model, reference_output, tmp_path):
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter

    x, y_ref = reference_output
    path = Exporter(model, imgsz=64)("checkpoint", tmp_path / "m")
    backend = AutoBackend(path)
    y = np.asarray(backend(jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(y, y_ref, atol=1e-3)


def test_export_stablehlo_roundtrip(model, reference_output, tmp_path):
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter

    x, y_ref = reference_output
    path = Exporter(model, imgsz=64)("stablehlo", tmp_path / "m")
    assert path.exists() and path.stat().st_size > 1000
    backend = AutoBackend(path)
    y = np.asarray(backend(jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(y, y_ref, atol=1e-3)


@pytest.mark.slow
def test_export_saved_model_roundtrip(model, reference_output, tmp_path):
    pytest.importorskip("tensorflow")
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter

    x, y_ref = reference_output
    path = Exporter(model, imgsz=64)("saved_model", tmp_path / "m")
    backend = AutoBackend(path)
    y = np.asarray(backend(x.astype(np.float32)))
    np.testing.assert_allclose(y, y_ref, atol=1e-2)


@pytest.mark.slow
def test_export_tflite_roundtrip(model, reference_output, tmp_path):
    pytest.importorskip("tensorflow")
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter

    x, y_ref = reference_output
    path = Exporter(model, imgsz=64)("tflite", tmp_path / "m")
    backend = AutoBackend(path)
    y = np.asarray(backend(x.astype(np.float32)))
    np.testing.assert_allclose(y, y_ref, atol=1e-2, rtol=1e-2)


@pytest.mark.slow
def test_export_pb_roundtrip(model, reference_output, tmp_path):
    """Frozen TF GraphDef (reference exporter.py export_pb +
    autobackend.py wrap_frozen_graph)."""
    pytest.importorskip("tensorflow")
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter

    x, y_ref = reference_output
    path = Exporter(model, imgsz=64)("pb", tmp_path / "m")
    assert path.exists() and path.stat().st_size > 1000
    backend = AutoBackend(path)
    y = np.asarray(backend(x.astype(np.float32)))
    np.testing.assert_allclose(y, y_ref, atol=1e-2)


def test_unsupported_format_message(model):
    from yolo_ad_refine_tpu.engine.exporter import Exporter, UnsupportedFormat

    with pytest.raises(UnsupportedFormat, match="TensorRT"):
        Exporter(model)("engine")
    with pytest.raises(UnsupportedFormat, match="unknown format"):
        Exporter(model)("bogus")


def test_model_flops(model):
    from yolo_ad_refine_tpu.utils.benchmarks import model_flops

    g = model_flops(model, 64)
    assert g > 0.001  # tiny model still has measurable GFLOPs


@pytest.mark.slow
def test_standalone_val_partial_final_batch(tmp_path):
    """ADVICE r4: a final partial batch (n_val % batch != 0) must be padded
    up to the exported artifact's fixed batch, not crash set_tensor."""
    pytest.importorskip("tensorflow")
    from yolo_ad_refine_tpu.data import DataLoader, YOLODataset
    from yolo_ad_refine_tpu.data.synthetic import make_shapes_dataset
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter
    from yolo_ad_refine_tpu.engine.validator import DetectionValidator
    from yolo_ad_refine_tpu.models.model import DetectionModel

    cfg = {
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
    imgsz = 64
    model = DetectionModel(cfg)
    model.init(imgsz=imgsz)
    data = make_shapes_dataset(tmp_path / "ds", n_train=2, n_val=6,
                               imgsz=imgsz, max_objects=2)
    path = Exporter(model, imgsz=imgsz, batch=4)("tflite", tmp_path / "m")

    from pathlib import Path as _P

    ds = YOLODataset(str(_P(data["path"]) / data["val"]), imgsz=imgsz,
                     augment=False, nc=3, max_boxes=8)
    v = DetectionValidator(
        args={"imgsz": imgsz, "iou": 0.7, "max_det": 16, "max_boxes": 8,
              "batch": 4, "conf": 0.001, "plots": False, "task": "detect"},
        dataloader=DataLoader(ds, batch_size=4))
    # 6 images / batch 4 -> final batch of 2: must not raise
    res = v(model=model, backend=AutoBackend(path))
    assert "metrics/mAP50(B)" in res
