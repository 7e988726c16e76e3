"""SAM family tests: param parity vs the reference torch build + behavior.

Parity surface: reference models/sam/build.py _build_sam (vit-b), modules/
encoders+decoders+transformer, predict.py prompts, amg.py generation.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ViT encoder compiles dominate; quick tier excludes

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def tiny_sam():
    from yolo_ad_refine_tpu.models.sam import SAM

    return SAM(variant="sam_test", img_size=128)


def _square_img():
    import cv2

    img = np.full((120, 160, 3), 230, np.uint8)
    cv2.rectangle(img, (30, 30), (90, 90), (10, 10, 10), -1)
    return img


class TestPredict:
    def test_point_prompt_shapes(self, tiny_sam):
        tiny_sam.set_image(_square_img())
        masks, iou = tiny_sam.predict(points=[[60, 60]])
        assert masks.shape == (3, 120, 160) and masks.dtype == bool
        assert iou.shape == (3,)
        assert (np.argsort(-iou) == np.arange(3)).all()  # sorted by score

    def test_box_prompt_single_mask(self, tiny_sam):
        tiny_sam.set_image(_square_img())
        masks, iou = tiny_sam.predict(box=[30, 30, 90, 90],
                                      multimask_output=False)
        assert masks.shape == (1, 120, 160)

    def test_multi_point_padding(self, tiny_sam):
        tiny_sam.set_image(_square_img())
        masks, _ = tiny_sam.predict(points=[[60, 60], [10, 10]], labels=[1, 0])
        assert masks.shape == (3, 120, 160)

    def test_generate_runs(self, tiny_sam):
        res = tiny_sam.generate(_square_img(), points_per_side=2,
                                pred_iou_thresh=-10.0,
                                stability_score_thresh=0.0)
        assert isinstance(res, list)
        for c in res:
            assert set(c) == {"segmentation", "bbox", "predicted_iou",
                              "stability_score"}


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_sam_b_param_parity():
    """Our sam_b parameter count equals the reference torch vit-b SAM."""
    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _ensure_reference_importable

    _ensure_reference_importable()
    from ultralytics.models.sam.build import build_sam_vit_b

    import jax

    from yolo_ad_refine_tpu.models.sam import build_sam

    tmodel = build_sam_vit_b()
    t_total = sum(p.numel() for p in tmodel.parameters())
    _, variables = build_sam("sam_b", img_size=1024)
    j_total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # the PE gaussian matrix (2, 128) is a torch BUFFER but a (frozen) flax
    # param here; image_encoder and mask_decoder totals are exactly equal
    assert j_total - 256 == t_total, (j_total, t_total)


def test_mobile_sam_predicts():
    from yolo_ad_refine_tpu.models.sam import SAM

    sam = SAM(variant="mobile_sam", img_size=128)
    sam.set_image(_square_img())
    masks, iou = sam.predict(points=[[60, 60]])
    assert masks.shape == (3, 120, 160)


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_mobile_sam_param_parity():
    """TinyViT mobile_sam parameter count equals the torch build."""
    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _ensure_reference_importable

    _ensure_reference_importable()
    from ultralytics.models.sam.build import build_mobile_sam

    import jax

    from yolo_ad_refine_tpu.models.sam import build_sam

    tmodel = build_mobile_sam()
    t_total = sum(p.numel() for p in tmodel.parameters())
    _, variables = build_sam("mobile_sam", img_size=1024)
    j_total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # PE gaussian matrix (2, 128): torch buffer, frozen flax param here
    assert j_total - 256 == t_total, (j_total, t_total, j_total - t_total)
