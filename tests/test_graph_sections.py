"""stop_at/resume_ys graph splitting (used by bench_bwd_sections.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.models.model import build_detection_model
from yolo_ad_refine_tpu.utils import ROOT


@pytest.mark.slow
def test_split_equals_full_forward():
    m = build_detection_model(str(ROOT / "cfg" / "models" / "yolo11n.yaml"),
                              dtype=jnp.float32, imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    full = m.graph.apply(m.variables, x, train=False, stop_at_head=True)
    out, ys = m.graph.apply(m.variables, x, train=False, stop_at=11)
    feats = m.graph.apply(m.variables, out, train=False, start_at=11,
                          full_input_h=64, resume_ys=dict(ys),
                          stop_at_head=True)
    assert len(full) == len(feats)
    for a, b in zip(full, feats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
