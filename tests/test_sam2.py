"""SAM2 family: parameter parity vs the torch reference builds + functional
smoke tests (image predict, fixed-slot video propagation).

Parity surface: reference models/sam/build.py:69-118 (_build_sam2:216-304),
modules/sam.py SAM2Model, modules/memory_attention.py, predict.py
SAM2VideoPredictor.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference")


def _count(tree):
    return sum(int(np.prod(np.asarray(x).shape)) for x in jax.tree.leaves(tree))


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize("variant", ["sam2_t", "sam2_b"])
def test_param_count_parity(variant):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _ensure_reference_importable

    _ensure_reference_importable()
    from ultralytics.models.sam.build import build_sam2_b, build_sam2_t

    tmodel = {"sam2_t": build_sam2_t, "sam2_b": build_sam2_b}[variant]()
    ref_n = sum(p.numel() for p in tmodel.parameters())

    from yolo_ad_refine_tpu.models.sam.sam2 import build_sam2

    # init at 128 px — parameter shapes are size-independent except the
    # prompt encoder's PE gaussian (size-independent too)
    net, variables = build_sam2(variant, image_size=128)
    ours_n = _count(variables["params"])
    # the PE gaussian matrix (2, 128) is a torch BUFFER but a (frozen) flax
    # param here, exactly as in test_sam.py's SAM1 parity
    assert ours_n - 256 == ref_n, f"{variant}: ours {ours_n} vs torch {ref_n}"


@pytest.mark.slow
def test_image_predict_smoke():
    from yolo_ad_refine_tpu.models.sam.sam2 import SAM2Predictor

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 120, 3), dtype=np.uint8)
    pred = SAM2Predictor(variant="sam2_test")
    masks, ious = pred.set_image(img).predict(points=[[60, 48]])
    assert masks.shape == (3, 96, 120)
    assert masks.dtype == bool
    assert ious.shape == (3,)
    assert np.all(np.diff(ious) <= 0)  # score-sorted


@pytest.mark.slow
def test_video_propagation_smoke():
    """Synthetic moving-square video: prompt frame 0, propagate 3 frames.
    The fixed-slot memory bank must accept growing memory without
    re-tracing (same executable every step)."""
    import cv2

    from yolo_ad_refine_tpu.models.sam.sam2 import SAM2VideoPredictor

    rng = np.random.default_rng(1)
    frames = []
    for i in range(4):
        f = rng.integers(0, 60, (128, 128, 3), dtype=np.uint8)
        x0 = 30 + 6 * i
        cv2.rectangle(f, (x0, 40), (x0 + 40, 80), (250, 240, 230), -1)
        frames.append(f)

    vp = SAM2VideoPredictor(variant="sam2_test")
    m0 = vp.add_points(frames[0], 0, points=[[50, 60]])
    assert m0.shape == (128, 128)

    out = list(vp.propagate(frames))
    assert [i for i, _ in out] == [1, 2, 3]
    for _, m in out:
        assert m.shape == (128, 128)
    # memory bank populated per frame
    assert set(vp.non_cond_frames) == {1, 2, 3}
    assert set(vp.cond_frames) == {0}


@pytest.mark.slow
def test_memory_attention_mask_blocks_padding():
    """Padded (invalid) memory slots must not influence the output."""
    from yolo_ad_refine_tpu.models.sam.sam2_modules import MemoryAttention

    rng = np.random.default_rng(2)
    b, n, c, mdim = 1, 16, 32, 16
    ma = MemoryAttention(d_model=c, num_layers=1, mem_dim=mdim)
    curr = jnp.asarray(rng.normal(0, 1, (b, n, c)), jnp.float32)
    cpos = jnp.asarray(rng.normal(0, 1, (b, n, c)), jnp.float32)
    mem_valid = jnp.asarray(rng.normal(0, 1, (b, n, mdim)), jnp.float32)
    pos_valid = jnp.asarray(rng.normal(0, 1, (b, n, mdim)), jnp.float32)
    junk = jnp.asarray(rng.normal(0, 9, (b, n, mdim)), jnp.float32)

    v = ma.init(jax.random.PRNGKey(0), curr, mem_valid, cpos, pos_valid)
    mask = jnp.concatenate([jnp.ones((b, n), bool), jnp.zeros((b, n), bool)], 1)
    y_masked = ma.apply(v, curr, jnp.concatenate([mem_valid, junk], 1), cpos,
                        jnp.concatenate([pos_valid, junk], 1), k_mask=mask)
    y_ref = ma.apply(v, curr, jnp.concatenate([mem_valid, mem_valid], 1), cpos,
                     jnp.concatenate([pos_valid, pos_valid], 1), k_mask=mask)
    np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_ref),
                               atol=1e-5)


def test_sam2_decoder_stability_fallback():
    """dynamic_multimask_via_stability: unstable single-mask output falls
    back to the best multimask candidate (reference decoders.py:464-518)."""
    from yolo_ad_refine_tpu.models.sam.sam2_modules import SAM2MaskDecoder

    dec = SAM2MaskDecoder(transformer_dim=32)
    # direct unit test of the selection rule
    masks = jnp.stack([
        jnp.stack([
            jnp.full((8, 8), 0.01),      # token-0: everything near threshold
            jnp.full((8, 8), -5.0),
            jnp.full((8, 8), 6.0),       # best multimask (iou below)
            jnp.full((8, 8), -5.0),
        ])], 0)
    ious = jnp.asarray([[0.9, 0.1, 0.8, 0.2]])
    out_masks, out_iou = dec._dynamic_multimask(masks, ious)
    # stability of token 0 = area(>0.05)/area(>-0.05) = 0 -> unstable
    np.testing.assert_allclose(float(out_iou[0, 0]), 0.8)
    np.testing.assert_allclose(float(out_masks[0, 0, 0, 0]), 6.0)
