"""Fusion SDI mode + GSConv cross-stack parity (reference block.py:1457-1537).

SDI is live-reachable reference surface (parse_model wires Fusion['SDI'],
tasks.py:1061-1069) though no shipped z-yaml uses it. A tiny detect model
with an SDI node fusing three scales (one pooled down, one passed through,
one bilinearly upsampled with align_corners=True) is built in BOTH stacks
from the same yaml, weights transplanted, eval outputs compared.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference")

SDI_CFG = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],   # 2 P3/8
        [-1, 1, "Conv", [128, 3, 2]],  # 3 P4/16
        [-1, 1, "Conv", [256, 3, 2]],  # 4 P5/32
    ],
    "head": [
        # target = P4 (idx 3): P3 pooled down, P4 kept, P5 upsampled
        [[3, 2, 4], 1, "Fusion", ["SDI"]],     # 5 -> 128ch @ P4
        [-1, 1, "Conv", [128, 3, 1]],          # 6
        [[2, 6, 4], 1, "Detect", ["nc"]],
    ],
}


def _write_yaml(tmp_path):
    import yaml

    p = tmp_path / "sdi_tiny.yaml"
    p.write_text(yaml.safe_dump(SDI_CFG))
    return str(p)


def test_gsconv_shuffle_semantics():
    """The pairwise shuffle: out[j*(n/2)+i] == cat[2i+j] (reference
    block.py:1473-1479 reshape/permute chain)."""
    from yolo_ad_refine_tpu.nn.block import GSConv

    m = GSConv(c2=8, k=1)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 4, 4, 6)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x, mutable=["batch_stats"])[0]
    assert y.shape == (2, 4, 4, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_fusion_sdi_builds_and_runs():
    from yolo_ad_refine_tpu.nn.block import Fusion

    xs = [
        jnp.asarray(np.random.default_rng(i).normal(0, 1, (2, hw, hw, c)),
                    jnp.float32)
        for i, (hw, c) in enumerate([(8, 32), (16, 16), (4, 64)])
    ]
    m = Fusion(inc_list=(32, 16, 64), fusion="SDI")
    v = m.init(jax.random.PRNGKey(0), xs)
    y = m.apply(v, xs, mutable=["batch_stats"])[0]
    assert y.shape == (2, 8, 8, 32)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.slow
def test_sdi_model_logits_parity(tmp_path):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _build_torch_reference

    import torch

    from yolo_ad_refine_tpu.models.model import DetectionModel
    from yolo_ad_refine_tpu.utils.torch_import import import_torch_state_dict

    cfg = _write_yaml(tmp_path)
    torch.manual_seed(0)
    tmodel = _build_torch_reference(cfg)
    tmodel.eval().float()

    ours = DetectionModel(cfg)
    ours.init(imgsz=64)
    ours.variables = import_torch_state_dict(
        tmodel.state_dict(), ours.variables, strict=True)

    r = np.random.default_rng(0)
    img = r.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        t_y = tmodel(torch.from_numpy(img).permute(0, 3, 1, 2).contiguous())[0]
    t_y = t_y.numpy().transpose(0, 2, 1)
    j_y = np.asarray(ours(jnp.asarray(img), train=False)[0])

    assert j_y.shape == t_y.shape
    np.testing.assert_allclose(j_y[..., 4:], t_y[..., 4:], atol=2e-5)
    np.testing.assert_allclose(j_y[..., :4], t_y[..., :4], atol=2e-3)
