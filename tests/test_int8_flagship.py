"""Flagship int8 PTQ gate (VERDICT r4 #5).

The 5-conv toy gate (test_int8_accuracy.py) misses the quantization-risky
flagship surface: DCN offsets/masks, TSSA attention, the EDFFN FFT sidecar.
This exports the round-4 trained flagship checkpoint
(runs/full_train_synth/flagship, mAP50 0.886 @320 synthetic shapes) to
fp32 AND int8 TFLite with real calibration images and asserts the int8
mAP50 degradation stays under 3 points via the standalone AutoBackend val
path. Parity surface: reference examples/YOLOv8-OpenCV-int8-tflite-Python.
"""

from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

CKPT = Path(__file__).parent.parent / "runs/full_train_synth/flagship/weights/best"
IMGSZ = 256  # flagship minimum (CrossScaleAttention); keeps the gate in RAM on the 1-vCPU host


@pytest.mark.skipif(not CKPT.exists(), reason="trained flagship ckpt absent")
def test_flagship_int8_map_degradation(tmp_path):
    pytest.importorskip("tensorflow")
    from yolo_ad_refine_tpu.data import DataLoader, YOLODataset
    from yolo_ad_refine_tpu.data.synthetic import make_shapes_dataset
    from yolo_ad_refine_tpu.engine.checkpoint import load_checkpoint
    from yolo_ad_refine_tpu.engine.exporter import AutoBackend, Exporter
    from yolo_ad_refine_tpu.engine.validator import DetectionValidator

    import gc

    data = make_shapes_dataset(tmp_path / "ds", n_train=16, n_val=16,
                               imgsz=IMGSZ, max_objects=5)
    model = load_checkpoint(CKPT)

    exporter = Exporter(model, imgsz=IMGSZ)
    fp_path = exporter("tflite", tmp_path / "fp")
    int8_path = exporter("tflite", tmp_path / "q", int8=True,
                         data=tmp_path / "ds" / "train" / "images",
                         n_calib=8)
    del exporter
    gc.collect()

    val_ds = YOLODataset(str(Path(data["path"]) / data["val"]), imgsz=IMGSZ,
                         augment=False, nc=3, max_boxes=16)
    args = {"imgsz": IMGSZ, "iou": 0.7, "max_det": 64, "max_boxes": 16,
            "batch": 1, "conf": 0.001, "plots": False, "task": "detect"}

    def map50(path):
        v = DetectionValidator(args=args,
                               dataloader=DataLoader(val_ds, batch_size=1))
        m = v(model=model, backend=AutoBackend(path))["metrics/mAP50(B)"]
        gc.collect()
        return m

    m_fp = map50(fp_path)
    m_int8 = map50(int8_path)
    assert m_fp > 0.3, f"fp32 TFLite mAP50 too low to gate on: {m_fp}"
    assert m_fp - m_int8 < 0.03, (
        f"int8 PTQ lost {100 * (m_fp - m_int8):.1f} mAP50 points "
        f"(fp {m_fp:.3f} -> int8 {m_int8:.3f})")
