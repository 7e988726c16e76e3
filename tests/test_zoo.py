"""Stock model zoo: bundled yamls parse, and param counts match the torch
reference builds of the corresponding configs (same DFL-frozen-16 convention
as tests/test_parity.py).
"""

from pathlib import Path

import pytest

REF = Path("/root/reference")

# (bundled yaml, reference yaml) pairs — param counts must match
PAIRS = [
    ("yolov8.yaml", "ultralytics/cfg/models/v8/yolov8.yaml"),
    ("yolov8-seg.yaml", "ultralytics/cfg/models/v8/yolov8-seg.yaml"),
    ("yolov8-obb.yaml", "ultralytics/cfg/models/v8/yolov8-obb.yaml"),
    ("yolov5.yaml", "ultralytics/cfg/models/v5/yolov5.yaml"),
    ("yolov3.yaml", "ultralytics/cfg/models/v3/yolov3.yaml"),
    ("yolov10n.yaml", "ultralytics/cfg/models/v10/yolov10n.yaml"),
    ("yolov10s.yaml", "ultralytics/cfg/models/v10/yolov10s.yaml"),
    ("yolov9c.yaml", "ultralytics/cfg/models/v9/yolov9c.yaml"),
]


def _our_param_count(cfg_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ad_refine_tpu.models.model import DetectionModel

    m = DetectionModel(str(cfg_path))
    shapes = jax.eval_shape(
        lambda: m.graph.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                             train=False)
    )
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize("ours,ref", PAIRS)
def test_zoo_param_parity(ours, ref):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import DFL_FROZEN_PARAMS, _build_torch_reference

    from yolo_ad_refine_tpu.utils import ROOT

    ref_model = _build_torch_reference(str(REF / ref))
    ref_n = sum(p.numel() for p in ref_model.parameters())
    frozen = sum(p.numel() for _, p in ref_model.named_parameters()
                 if not p.requires_grad)
    our_n = _our_param_count(ROOT / "cfg" / "models" / ours)
    assert our_n == ref_n - frozen, f"{ours}: {our_n} vs torch {ref_n} (frozen {frozen})"
    del DFL_FROZEN_PARAMS


def test_bundled_yamls_all_parse():
    """Every bundled yaml compiles through the parser (channel bookkeeping)."""
    from yolo_ad_refine_tpu.models.model import DetectionModel
    from yolo_ad_refine_tpu.utils import ROOT

    for p in sorted((ROOT / "cfg" / "models").glob("*.yaml")):
        m = DetectionModel(str(p))
        assert len(m.specs) > 3, p.name
