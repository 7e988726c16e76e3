"""YOLO-World family: C2fAttn / ImagePoolingAttn / WorldDetect text routing.

Parity surface: reference nn/modules/block.py:418-523 (MaxSigmoidAttnBlock,
C2fAttn, ImagePoolingAttn), nn/tasks.py:600-696 (WorldModel predict loop with
ori_txt_feats routing), cfg/models/v8/yolov8-world{,v2}.yaml.

The offline hashed-n-gram text encoder (utils/text.py) replaces CLIP in this
zero-egress build; the cross-stack tests therefore feed BOTH stacks the same
explicit text features.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference")


@pytest.mark.slow
def test_offline_text_encoder_properties():
    from yolo_ad_refine_tpu.utils.text import encode_class_names

    a = encode_class_names(["person", "dog", "traffic light"], 512)
    b = encode_class_names(["person", "dog", "traffic light"], 512)
    np.testing.assert_array_equal(a, b)  # deterministic across calls
    assert a.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, atol=1e-5)
    # distinct names are far apart; related surface forms are close
    assert abs(float(a[0] @ a[1])) < 0.5
    c = encode_class_names(["traffic-light"], 512)
    assert float(a[2] @ c[0]) > float(a[0] @ c[0])


@pytest.mark.slow
def test_set_classes_changes_scores():
    from yolo_ad_refine_tpu import YOLO

    m = YOLO("yolov8-worldv2.yaml", imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    y0, _ = m.model(x, train=False)
    assert y0.shape[-1] == 84  # placeholder vocab = built-in nc
    m.set_classes(["person", "dog", "car"])
    y1, _ = m.model(x, train=False)
    assert y1.shape[-1] == 7  # 4 + 3 classes
    # vocabulary identity matters: different names -> different scores
    # (tiny at random init — the -10 contrastive bias saturates the sigmoid —
    # so compare exactly, not with allclose)
    m.set_classes(["zebra", "kite", "boat"])
    y2, _ = m.model(x, train=False)
    assert not np.array_equal(np.asarray(y1[..., 4:]), np.asarray(y2[..., 4:]))


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize("cfg", ["yolov8-worldv2.yaml", "yolov8-world.yaml"])
def test_world_param_parity(cfg):
    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _ensure_reference_importable

    _ensure_reference_importable()
    from ultralytics.nn.tasks import WorldModel

    from yolo_ad_refine_tpu.models.model import DetectionModel

    ref_cfg = str(REF / "ultralytics/cfg/models/v8" / cfg)
    tmodel = WorldModel(ref_cfg, verbose=False)
    ref_n = sum(p.numel() for p in tmodel.parameters())
    frozen = sum(p.numel() for n, p in tmodel.named_parameters()
                 if not p.requires_grad)

    ours = DetectionModel(cfg)
    var_shapes = jax.eval_shape(
        lambda: ours.graph.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False,
            text_feats=jnp.zeros((ours.nc, 512))))
    our_n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(var_shapes["params"]))
    assert our_n == ref_n - frozen, (cfg, our_n, ref_n, frozen)


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize("cfg", ["yolov8-worldv2.yaml", "yolov8-world.yaml"])
def test_world_logits_parity(cfg):
    """Transplanted weights + identical text features -> identical outputs
    through the full graph (C2fAttn gating, ImagePoolingAttn refinement in
    v1, BNContrastiveHead scoring)."""
    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _ensure_reference_importable

    _ensure_reference_importable()
    import torch

    from ultralytics.nn.tasks import WorldModel

    from yolo_ad_refine_tpu.models.model import DetectionModel
    from yolo_ad_refine_tpu.utils.torch_import import import_torch_state_dict

    torch.manual_seed(3)
    tmodel = WorldModel(str(REF / "ultralytics/cfg/models/v8" / cfg), verbose=False)
    tmodel.eval().float()

    rng = np.random.default_rng(0)
    text = rng.standard_normal((80, 512)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    img = rng.random((1, 64, 64, 3), dtype=np.float32)

    tmodel.txt_feats = torch.from_numpy(text)[None]
    with torch.no_grad():
        t_y = tmodel(torch.from_numpy(img).permute(0, 3, 1, 2).contiguous())[0]
    t_y = t_y.numpy().transpose(0, 2, 1)

    ours = DetectionModel(cfg)
    ours.init(imgsz=64)
    ours.variables = import_torch_state_dict(
        tmodel.state_dict(), ours.variables, strict=True)
    ours.text_feats = text
    j_y = np.asarray(ours(jnp.asarray(img), train=False)[0])

    assert j_y.shape == t_y.shape
    np.testing.assert_allclose(j_y[..., 4:], t_y[..., 4:], atol=2e-5)
    np.testing.assert_allclose(j_y[..., :4], t_y[..., :4], atol=2e-3)
