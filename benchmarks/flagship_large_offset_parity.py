"""Flagship large-offset DCN parity on the TPU default path (VERDICT r4 #1).

Builds the flagship at 640, pushes the head's offset-conv bias so the DCN
sees 5-15 px offsets (the range real converged checkpoints log —
results.csv train/dcn_offset_max reached 17), and asserts the widened mxu2
kernel (dcn_radius=16) matches the exact UNBOUNDED gather end-to-end:
decoded predictions + NMS detections. Writes
benchmarks/artifacts/flagship_large_offset_parity.json.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from yolo_ad_refine_tpu.models.model import DetectionModel  # noqa: E402
from yolo_ad_refine_tpu.models.parser import load_model_cfg  # noqa: E402
from yolo_ad_refine_tpu.ops.nms import non_max_suppression  # noqa: E402
from yolo_ad_refine_tpu.utils import ROOT  # noqa: E402

B, IMGSZ = 4, 640


def main():
    cfg = load_model_cfg(str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"))
    cfg["scale"] = "n"
    cfg["dcn_radius"] = 16.0
    model = DetectionModel(cfg, dtype=jnp.float32)
    model.init(jax.random.PRNGKey(0), imgsz=256)

    # large synthetic offsets: bias in [-14, 14] like a converged checkpoint
    params = model.variables["params"]
    hp = params[f"modules_{model.head_spec.i}"]
    r = np.random.default_rng(7)
    bias = np.array(hp["spatial_conv_offset"]["bias"])
    bias[:18] = r.uniform(-14.0, 14.0, 18)
    hp["spatial_conv_offset"]["bias"] = jnp.asarray(bias)

    x = jnp.asarray(r.random((B, IMGSZ, IMGSZ, 3), np.float32), jnp.float32)

    os.environ["YAT_DCN_IMPL"] = "exact"
    y_ref = jax.jit(lambda x: model.apply(model.variables, x, train=False)[0])(x)
    y_ref = np.asarray(jax.device_get(y_ref))
    os.environ["YAT_DCN_IMPL"] = "mxu2"
    y_mx = jax.jit(lambda xx: model.apply(model.variables, xx, train=False)[0])(x)
    y_mx = np.asarray(jax.device_get(y_mx))

    diff = np.abs(y_mx - y_ref)
    box_scale = max(1.0, float(np.abs(y_ref[..., :4]).max()))
    rel_box = float(diff[..., :4].max() / box_scale)
    cls_max = float(diff[..., 4:].max())

    det_r, cnt_r, _ = jax.jit(lambda y: non_max_suppression(
        jnp.asarray(y), conf_thres=0.25, iou_thres=0.7, max_det=100))(y_ref)
    det_m, cnt_m, _ = jax.jit(lambda y: non_max_suppression(
        jnp.asarray(y), conf_thres=0.25, iou_thres=0.7, max_det=100))(y_mx)
    det_diff = float(np.abs(np.asarray(det_r) - np.asarray(det_m)).max())
    cnt_eq = bool((np.asarray(cnt_r) == np.asarray(cnt_m)).all())

    out = {
        "device": str(jax.devices()[0]),
        "imgsz": IMGSZ, "batch": B, "dcn_radius": 16,
        "offset_bias_range_px": [-14.0, 14.0],
        "rel_box_maxdiff": rel_box, "cls_prob_maxdiff": cls_max,
        "nms_det_maxdiff": det_diff, "nms_counts_equal": cnt_eq,
        "pass": rel_box < 1e-3 and cls_max < 1e-3 and cnt_eq,
    }
    p = Path("benchmarks/artifacts/flagship_large_offset_parity.json")
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
