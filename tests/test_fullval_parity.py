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
the metric stack all sit inside the compared span. Labels are generated
from the calibrated torch model's OWN detections (random labels would give
mAP=0.0 on both sides — vacuous parity), so mAP is high and every
pipeline-convention difference moves it.

The calibration and label design keep the instrument's own noise floor
below the asserted tolerance (see inline comments): logits are linearly
mapped so nothing saturates sigmoid (saturation mass-ties detections and
NMS/top-k order becomes implementation-defined), labels are EVERY det
above a high conf with degenerate hot images dropped (so "TP <=> above
label conf" holds pooled across images and greedy matching never resolves
fp-level IoU near-ties).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.parity,
    pytest.mark.skipif(not REF.exists(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    """64 textured images (no labels — each cfg labels them from its own
    calibrated torch model's detections)."""
    import cv2

    root = tmp_path_factory.mktemp("fullval_imgs")
    rng = np.random.default_rng(7)
    for i in range(64):
        h, w = int(rng.integers(240, 400)), int(rng.integers(240, 400))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        # blobs give the random-weight net spatially varying activations
        for _ in range(6):
            c = tuple(int(v) for v in rng.integers(0, 255, 3))
            cv2.circle(img, (int(rng.integers(0, w)), int(rng.integers(0, h))),
                       int(rng.integers(10, 60)), c, -1)
        cv2.imwrite(str(root / f"{i}.jpg"), img)
    return root


def _label_from_torch_predictions(tmodel, images, root, imgsz):
    """YOLO-layout dataset whose labels are the torch model's own detections
    (conf>=0.25). The model then 'finds' its labels during val, so mAP is
    high and sensitive to letterbox/NMS/matching convention differences."""
    import cv2
    import shutil
    import torch

    from ultralytics.utils.ops import non_max_suppression, scale_boxes

    from yolo_ad_refine_tpu.data.augment import letterbox

    import math

    (root / "val" / "images").mkdir(parents=True)
    (root / "val" / "labels").mkdir(parents=True)
    n_boxes = 0
    n_imgs = 0
    for f in sorted(images.glob("*.jpg"), key=lambda p: int(p.stem)):
        im0 = cv2.imread(str(f))
        # replicate the val pipeline exactly: load_image long-side resize
        # with CEIL'd dims (reference base.py:171), then letterbox pad — a
        # single-step letterbox rounds sizes differently and the noise-model
        # detections do not survive a 1px shift
        h0, w0 = im0.shape[:2]
        r = imgsz / max(h0, w0)
        pre = cv2.resize(
            im0, (min(math.ceil(w0 * r), imgsz), min(math.ceil(h0 * r), imgsz)),
            interpolation=cv2.INTER_LINEAR) if r != 1 else im0
        im, _, _ = letterbox(pre, imgsz, scaleup=False)
        x = torch.from_numpy(
            im[..., ::-1].astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
        with torch.no_grad():
            pred = tmodel(x)[0]
        # Labels = ALL dets above a HIGH threshold (0.7), uncapped. Three
        # regimes were measured before landing here:
        # - dense labels (every det >= 0.25): greedy matching resolves
        #   fp-level IoU near-ties among hundreds of mutual overlaps —
        #   ~1e-2 cross-stack mAP noise carrying no pipeline information;
        # - capped labels (top-8 >= 0.25): hot images keep unlabeled dets
        #   ABOVE the label conf, which out-rank other images' TPs in the
        #   pooled per-class AP — rank noise again;
        # - this design: "TP <=> conf >= 0.7" holds POOLED across images
        #   (no unlabeled det can out-rank a TP), labels stay sparse enough
        #   (NMS guarantees same-class mutual IoU < 0.7) that greedy
        #   matching is deterministic, and AP moves ONLY on
        #   pipeline-convention differences (letterbox rounding,
        #   scale_boxes, NMS keep-sets) — what this test measures.
        det = non_max_suppression(pred, conf_thres=0.7, iou_thres=0.7,
                                  max_det=1000)[0]
        # HOT images (degenerate activation blow-ups of the noise model,
        # >30 dets above the label conf) are dropped from the dataset
        # entirely: any cap or filter that leaves an unlabeled det above
        # the label conf re-breaks the pooled invariant.
        if len(det) > 30:
            continue
        det[:, :4] = scale_boxes(im.shape[:2], det[:, :4], im0.shape[:2])
        h0, w0 = im0.shape[:2]
        lines = []
        # no size filter — every det above the label conf MUST be a label
        for *xyxy, conf, cls in det.numpy():
            x1, y1, x2, y2 = xyxy
            cx, cy = (x1 + x2) / 2 / w0, (y1 + y2) / 2 / h0
            bw, bh = (x2 - x1) / w0, (y2 - y1) / h0
            lines.append(f"{int(cls)} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        n_boxes += len(lines)
        n_imgs += 1
        shutil.copy(f, root / "val" / "images" / f.name)
        (root / "val" / "labels" / f"{f.stem}.txt").write_text("\n".join(lines))
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: val/images\nval: val/images\nnc: 80\n"
        "names:\n" + "\n".join(f"  {i}: c{i}" for i in range(80)) + "\n")
    assert n_boxes >= 64, f"calibrated model produced too few boxes ({n_boxes})"
    assert n_imgs >= 32, f"too many hot images dropped ({n_imgs} kept)"
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
    # Reshape the cls-logit distribution so only a sparse TAIL crosses the
    # detection thresholds. A flat lift (+5.0) makes EVERY (anchor, class)
    # pair confident: ~168k NMS candidates per image trips the reference NMS
    # *time limit* on CPU (utils/ops.py:234) which silently drops preds, and
    # even a shift that parks the 30th-highest logit at conf~0.55 leaves
    # ~33k pairs above conf 0.05 (measured) — over the reference's
    # max_nms=30000 candidate cap, where both stacks' conf-order truncation
    # turns 1e-7 forward noise into macroscopic pred-set differences. So
    # apply a LINEAR map a*logit+b (weight AND bias scaling on the cls
    # convs): the 30*B-th highest raw logit lands at +1.5 (conf 0.82) and
    # the 600*B-th at -3.0 (conf 0.047), i.e. ~150 candidates/image above
    # the val conf of 0.05 — hundreds, not tens of thousands. Small
    # per-class jitter breaks cross-class knife-edge ties.
    with torch.no_grad():
        raw = tmodel(torch.from_numpy(sample_imgs))
        pred = raw[0] if isinstance(raw, (list, tuple)) else raw
        p_cls = pred[:, 4:, :].clamp(1e-9, 1 - 1e-9)
        logits = torch.log(p_cls) - torch.log1p(-p_cls)
        # Anchors: the GLOBAL max maps to +6.0 (conf 0.9975) — any higher
        # and hot images saturate sigmoid to conf==1.0f, mass-tieing their
        # dets so top-k truncation and NMS suppression order become
        # implementation-defined (measured: 114 vs 210 TPs among 600 tied
        # rows). The per-image MEDIAN 300th-highest maps to -3.2 (conf
        # 0.039, just under the val threshold) — per-image because a single
        # hot image otherwise owns a global quantile and every other image
        # maps to zero detections.
        flat = logits.reshape(logits.shape[0], -1)
        g_max = float(flat.max())
        q_lo = float(torch.topk(flat, 300, dim=1).values[:, -1].median())
        a = 9.2 / max(g_max - q_lo, 1e-3)
        b = 6.0 - a * g_max
    gen = torch.Generator().manual_seed(23)
    offsets = b + 0.2 * torch.rand(nc_t, generator=gen)
    with torch.no_grad():
        for m in tmodel.modules():
            if (isinstance(m, torch.nn.Conv2d) and m.out_channels == nc_t
                    and m.bias is not None):
                m.weight *= a
                m.bias.mul_(a).add_(offsets)
    return tmodel


@pytest.mark.parametrize("cfg,tol", [
    ("ultralytics/cfg/models/11/yolo11.yaml", 1e-3),
    # flagship: fp32 rFFT (EDFFN) + DCN evaluate in different op orders than
    # torch -> ~1e-3 confidence noise can flip knife-edge TP matches
    ("z-yaml/yolo11-701-YOLO-AD-Refine.yaml", 3e-3),
])
def test_fullval_map_parity(images, cfg, tol, tmp_path, monkeypatch):
    import cv2
    import torch

    import jax.numpy as jnp  # noqa: F401 (ensures jax initialized on CPU)

    from yolo_ad_refine_tpu.data.augment import letterbox
    from yolo_ad_refine_tpu.engine.validator import DetectionValidator
    from yolo_ad_refine_tpu.models.model import DetectionModel
    from yolo_ad_refine_tpu.utils.torch_import import import_torch_state_dict

    imgsz = 320

    # calibration batch: first 4 images, letterboxed like val-time
    imgs = []
    for i in range(4):
        im0 = cv2.imread(str(images / f"{i}.jpg"))
        im, _, _ = letterbox(im0, imgsz, scaleup=False)
        imgs.append(im[..., ::-1].astype(np.float32) / 255.0)
    sample = np.stack(imgs).transpose(0, 3, 1, 2).copy()

    tmodel = _calibrated_torch_model(cfg, sample)
    # labels = this model's own detections -> meaningfully high mAP
    dataset = _label_from_torch_predictions(tmodel, images, tmp_path, imgsz)
    # snapshot BEFORE torch val: the reference validator fuses conv+bn in
    # place (engine/validator.py model.fuse()), which would leave a
    # bias-carrying BN-free state dict that cannot transplant
    import copy

    sd = copy.deepcopy(tmodel.state_dict())

    # --- torch reference full val pipeline -------------------------------
    from ultralytics.models.yolo.detect import DetectionValidator as TorchVal

    # the reference NMS aborts on a WALL-CLOCK limit (utils/ops.py:234,
    # 2.0+0.05*bs s/batch) and silently returns empty preds for the rest of
    # the batch — nondeterministic truncation that no parity test can
    # tolerate; the calibration above keeps NMS fast, the patch makes a slow
    # CI host unable to fake a parity failure
    import functools

    from ultralytics.utils import ops as tops

    monkeypatch.setattr(
        tops, "non_max_suppression",
        functools.partial(tops.non_max_suppression, max_time_img=1e6))

    targs = dict(model=None, data=str(dataset / "data.yaml"), imgsz=imgsz,
                 batch=8, rect=False, plots=False, save_json=False,
                 save_txt=False, save_hybrid=False, conf=0.1, iou=0.7,
                 max_det=2000, half=False, device="cpu", task="detect",
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
                                   "imgsz": imgsz, "batch": 8, "conf": 0.1,
                                   "iou": 0.7, "max_det": 2000,
                                   "max_nms": 30000, "max_boxes": 512,
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
