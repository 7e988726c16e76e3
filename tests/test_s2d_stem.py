"""s2d stem rewrite (ops/s2d_stem.py): exactness vs the module path.

The rewrite replaces yaml rows 0-1 (two k3 s2 Convs) with k2 s1 convs over
a space-to-depth(4) input, BN folded. It must be bit-level-close to the
normal path in f32 and transparent to routing (savelist, heads, strides).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from yolo_ad_refine_tpu.models.model import DetectionModel, build_detection_model
from yolo_ad_refine_tpu.ops.s2d_stem import stem_pair_eligible
from yolo_ad_refine_tpu.utils import ROOT


def _both_paths(model, x):
    os.environ["YAT_STEM_S2D"] = "0"
    slow = model.apply(model.variables, x, train=False)
    os.environ["YAT_STEM_S2D"] = "1"
    fast = model.apply(model.variables, x, train=False)
    os.environ.pop("YAT_STEM_S2D", None)
    return slow, fast


@pytest.mark.slow
def test_stem_s2d_matches_module_path_yolo11n():
    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11n.yaml"), dtype=jnp.float32, imgsz=64)
    assert model.stem_s2d_chans == (3, 16, 32)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))
    (y0, f0), (y1, f1) = _both_paths(model, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5, rtol=1e-4)
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stem_s2d_with_row1_in_savelist():
    # row 1 consumed later by index -> savelist contains 1; the fused
    # prologue must seed ys[1] so routing still resolves.
    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[3, 1], 1, "Concat", [1]],
        ],
        "head": [],
    }
    model = DetectionModel(cfg, dtype=jnp.float32)
    model.init(imgsz=64)
    assert 1 in model.meta["save"]
    assert model.stem_s2d_chans == (3, 16, 32)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3), np.float32))
    slow, fast = _both_paths(model, x)
    np.testing.assert_allclose(np.asarray(slow), np.asarray(fast), atol=1e-5)


def test_stem_s2d_ineligible_patterns():
    # first row not a k3 s2 Conv -> rewrite must stay off
    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [16, 6, 2, 2]],  # yolov5-style 6x6 stem
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [],
    }
    model = DetectionModel(cfg, dtype=jnp.float32)
    assert model.stem_s2d_chans is None
    assert stem_pair_eligible(model.specs, model.meta["save"]) is None


def test_stem_pair_maps_cover_every_tap_once():
    # every original weight element must appear in the transformed kernel
    # exactly once (the rewrite is a permutation + zero-fill, not a blend)
    from yolo_ad_refine_tpu.ops.s2d_stem import stem_pair_maps

    c0, c1, c2 = 3, 16, 32
    G0, G1 = stem_pair_maps(c0, c1, c2)
    # conv0's output keeps 4 spatial phases per channel -> each original
    # element appears once per phase (4x); conv1 collapses phases -> 1x.
    n0 = 9 * c0 * c1
    used0 = G0[G0 < n0]
    counts0 = np.bincount(used0.ravel(), minlength=n0)
    assert used0.size == 4 * n0 and np.all(counts0 == 4)
    n1 = 9 * c1 * c2
    used1 = G1[G1 < n1]
    counts1 = np.bincount(used1.ravel(), minlength=n1)
    assert used1.size == n1 and np.all(counts1 == 1)


@pytest.mark.slow
@pytest.mark.parametrize("imgsz", [128, 160])
def test_stem_s2d_flagship(imgsz):
    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.float32, imgsz=imgsz)
    assert model.stem_s2d_chans == (3, 16, 32)
    x = jnp.asarray(
        np.random.default_rng(3).random((1, imgsz, imgsz, 3), np.float32))
    (y0, _), (y1, _) = _both_paths(model, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5, rtol=1e-4)
