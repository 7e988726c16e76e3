"""Full-dataset cross-stack mAP parity (round-2 VERDICT item 2).

Both stacks run their COMPLETE val pipelines — letterbox -> forward -> NMS
-> matching -> ap_per_class — over the same 64-image dataset with identical
transplanted weights:

- torch reference: ultralytics YOLO.val() (engine/validator.py:106-219 +
  models/yolo/detect/val.py:125-228), rect=False to match our static-shape
  square letterbox (the documented semantic departure).
- ours: engine.validator.DetectionValidator over the same data.yaml.

This closes the north-star claim (BASELINE.json "mAP50-95 within 0.2") end
to end: letterbox rounding, scale_boxes conventions, NMS tie-breaking and
the metric stack all sit inside the compared span. Labels are synthetic —
parity only needs both stacks to see the same labels, not a trained model.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """64 textured images + random box labels in YOLO layout."""
    import cv2

    root = tmp_path_factory.mktemp("fullval")
    (root / "val" / "images").mkdir(parents=True)
    (root / "val" / "labels").mkdir(parents=True)
    rng = np.random.default_rng(7)
    for i in range(64):
        h, w = int(rng.integers(240, 400)), int(rng.integers(240, 400))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        # blobs give the random-weight net spatially varying activations
        for _ in range(6):
            c = tuple(int(v) for v in rng.integers(0, 255, 3))
            cv2.circle(img, (int(rng.integers(0, w)), int(rng.integers(0, h))),
                       int(rng.integers(10, 60)), c, -1)
        cv2.imwrite(str(root / "val" / "images" / f"{i}.jpg"), img)
        lines = []
        for _ in range(int(rng.integers(1, 5))):
            bw, bh = rng.uniform(0.1, 0.4, 2)
            cx = rng.uniform(bw / 2, 1 - bw / 2)
            cy = rng.uniform(bh / 2, 1 - bh / 2)
            cls = int(rng.integers(0, 3))
            lines.append(f"{cls} {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
        (root / "val" / "labels" / f"{i}.txt").write_text("\n".join(lines))
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: val/images\nval: val/images\nnc: 80\n"
        "names:\n" + "\n".join(f"  {i}: c{i}" for i in range(80)) + "\n")
    return root


def _calibrated_torch_model(cfg_path, sample_imgs):
    """Seeded reference model with calibrated BN and lifted cls bias (same
    recipe as tests/test_e2e_parity.py — random init alone collapses
    activations and produces zero detections)."""
    import torch

    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _build_torch_reference

    torch.manual_seed(11)
    tmodel = _build_torch_reference(str(REF / cfg_path))
    tmodel.float()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = None
            m.reset_running_stats()
    tmodel.train()
    with torch.no_grad():
        tmodel(torch.from_numpy(sample_imgs))
    tmodel.eval()
    nc_t = tmodel.yaml.get("nc", 80) if hasattr(tmodel, "yaml") else 80
    with torch.no_grad():
        for m in tmodel.modules():
            if (isinstance(m, torch.nn.Conv2d) and m.out_channels == nc_t
                    and m.bias is not None):
                m.bias += 5.0
    return tmodel


@pytest.mark.parametrize("cfg,tol", [
    ("ultralytics/cfg/models/11/yolo11.yaml", 1e-3),
    # flagship: fp32 rFFT (EDFFN) + DCN evaluate in different op orders than
    # torch -> ~1e-3 confidence noise can flip knife-edge TP matches
    ("z-yaml/yolo11-701-YOLO-AD-Refine.yaml", 3e-3),
])
def test_fullval_map_parity(dataset, cfg, tol):
    import cv2
    import torch

    import jax.numpy as jnp  # noqa: F401 (ensures jax initialized on CPU)

    from yolo_ad_refine_tpu.data.augment import letterbox
    from yolo_ad_refine_tpu.engine.validator import DetectionValidator
    from yolo_ad_refine_tpu.models.model import DetectionModel
    from yolo_ad_refine_tpu.utils.torch_import import import_torch_state_dict

    imgsz = 320

    # calibration batch: first 4 val images, letterboxed like val-time
    imgs = []
    for i in range(4):
        im0 = cv2.imread(str(dataset / "val" / "images" / f"{i}.jpg"))
        im, _, _ = letterbox(im0, imgsz, scaleup=False)
        imgs.append(im[..., ::-1].astype(np.float32) / 255.0)
    sample = np.stack(imgs).transpose(0, 3, 1, 2).copy()

    tmodel = _calibrated_torch_model(cfg, sample)
    # snapshot BEFORE torch val: the reference validator fuses conv+bn in
    # place (engine/validator.py model.fuse()), which would leave a
    # bias-carrying BN-free state dict that cannot transplant
    import copy

    sd = copy.deepcopy(tmodel.state_dict())

    # --- torch reference full val pipeline -------------------------------
    from ultralytics.models.yolo.detect import DetectionValidator as TorchVal

    targs = dict(model=None, data=str(dataset / "data.yaml"), imgsz=imgsz,
                 batch=8, rect=False, plots=False, save_json=False,
                 save_txt=False, save_hybrid=False, conf=0.001, iou=0.7,
                 max_det=300, half=False, device="cpu", task="detect",
                 mode="val", split="val", verbose=False)
    tval = TorchVal(args=targs)
    with torch.no_grad():
        tres = tval(model=tmodel)
    t_map50 = float(tres["metrics/mAP50(B)"])
    t_map = float(tres["metrics/mAP50-95(B)"])

    # --- our full val pipeline -------------------------------------------
    ours = DetectionModel(str(REF / cfg))
    ours.init(imgsz=imgsz)
    ours.variables = import_torch_state_dict(
        sd, ours.variables, strict=True,
        deconv_layers=ours.deconv_layer_indices)
    val = DetectionValidator(args={"data": str(dataset / "data.yaml"),
                                   "imgsz": imgsz, "batch": 8, "conf": 0.001,
                                   "iou": 0.7, "max_det": 300,
                                   "plots": False})
    jres = val(model=ours)
    j_map50 = float(jres["metrics/mAP50(B)"])
    j_map = float(jres["metrics/mAP50-95(B)"])

    # both pipelines must actually score something for parity to be a claim
    assert t_map50 > 0.001, f"torch val produced no matches (mAP50={t_map50})"
    assert abs(j_map50 - t_map50) < tol, (j_map50, t_map50)
    assert abs(j_map - t_map) < tol, (j_map, t_map)
    # per-class precision/recall agreement
    t_p = float(tres.get("metrics/precision(B)", 0.0))
    t_r = float(tres.get("metrics/recall(B)", 0.0))
    j_p = float(jres.get("metrics/precision(B)", 0.0))
    j_r = float(jres.get("metrics/recall(B)", 0.0))
    assert abs(j_p - t_p) < 10 * tol, (j_p, t_p)
    assert abs(j_r - t_r) < 10 * tol, (j_r, t_r)
