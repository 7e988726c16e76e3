"""Golden numeric parity: our jitted loss vs the reference's torch
v8DetectionLoss (SlideLoss BCE + CIoU/NWD + DFL + TAL assigner) on identical
synthetic inputs.

The reference stack is imported from /root/reference with mmcv/torchvision/
timm stubbed (see test_parity). A dummy model namespace provides the handful
of attributes v8DetectionLoss reads (args/stride/nc/reg_max/no/parameters).
"""

from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

REF = Path("/root/reference")
NC = 5
STRIDES = (8, 16, 32)
IMGSZ = 64


def make_inputs(seed=0, b=2, n_gt=6):
    r = np.random.default_rng(seed)
    feats = []
    for s in STRIDES:
        h = IMGSZ // s
        feats.append(r.normal(0, 1.0, (b, h, h, 64 + NC)).astype(np.float32))
    # targets: normalized xywh + cls with ragged counts per image
    rows = []
    for bi in range(b):
        k = n_gt - bi  # vary counts
        for _ in range(k):
            cx, cy = r.uniform(0.2, 0.8, 2)
            w, h = r.uniform(0.1, 0.3, 2)
            rows.append([bi, r.integers(0, NC), cx, cy, w, h])
    return feats, np.asarray(rows, np.float32)


def reference_loss(feats_nhwc, targets):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _build_torch_reference  # installs stubs + sys.path

    _build_torch_reference(str(REF / "ultralytics/cfg/models/11/yolo11.yaml"))  # ensure import
    import torch

    from ultralytics.utils.loss import v8DetectionLoss

    class DummyDetect:
        stride = torch.tensor([8.0, 16.0, 32.0])
        nc = NC
        reg_max = 16

    dummy = SimpleNamespace(
        args=SimpleNamespace(box=7.5, cls=0.5, dfl=1.5),
        model=[None, DummyDetect()],
    )
    dummy.parameters = lambda: iter([torch.zeros(1)])
    crit = v8DetectionLoss(dummy, tal_topk=10)

    feats_nchw = [torch.from_numpy(f).permute(0, 3, 1, 2).contiguous() for f in feats_nhwc]
    batch = {
        "batch_idx": torch.from_numpy(targets[:, 0]),
        "cls": torch.from_numpy(targets[:, 1:2]),
        "bboxes": torch.from_numpy(targets[:, 2:6]),
    }
    total, comps = crit(feats_nchw, batch)
    return float(total), np.asarray(comps)


def our_loss(feats_nhwc, targets):
    import jax.numpy as jnp

    from yolo_ad_refine_tpu.ops.boxes import xywhn2xyxy
    from yolo_ad_refine_tpu.train.loss import DetectionLoss

    b = feats_nhwc[0].shape[0]
    max_boxes = 16
    cls = np.zeros((b, max_boxes, 1), np.float32)
    boxes = np.zeros((b, max_boxes, 4), np.float32)
    mask = np.zeros((b, max_boxes, 1), np.float32)
    for bi in range(b):
        rows = targets[targets[:, 0] == bi]
        n = len(rows)
        cls[bi, :n, 0] = rows[:, 1]
        boxes[bi, :n] = np.asarray(xywhn2xyxy(jnp.asarray(rows[:, 2:6]), IMGSZ, IMGSZ))
        mask[bi, :n, 0] = 1.0
    loss_fn = DetectionLoss(nc=NC, strides=STRIDES)
    out = loss_fn([jnp.asarray(f) for f in feats_nhwc], jnp.asarray(cls), jnp.asarray(boxes),
                  jnp.asarray(mask))
    return float(out.total), np.asarray(out.components)


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_matches_torch_reference(seed):
    feats, targets = make_inputs(seed)
    ref_total, ref_comps = reference_loss(feats, targets)
    our_total, our_comps = our_loss(feats, targets)
    # box, cls, dfl components (already gain-scaled in both)
    np.testing.assert_allclose(our_comps, ref_comps, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(our_total, ref_total, rtol=1e-5)


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_loss_matches_with_empty_targets():
    feats, _ = make_inputs(3)
    targets = np.zeros((0, 6), np.float32)
    ref_total, ref_comps = reference_loss(feats, targets)
    our_total, our_comps = our_loss(feats, targets)
    np.testing.assert_allclose(our_comps, ref_comps, rtol=1e-5, atol=1e-6)
