"""Classification task tests (parity surface: reference classify task + tests)."""

import numpy as np
import pytest

TINY_CLS = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
    ],
    "head": [[-1, 1, "Classify", ["nc"]]],
}


@pytest.fixture(scope="module")
def cls_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("clsds")
    colors = {"red": (0, 0, 255), "green": (0, 255, 0), "blue": (255, 0, 0)}
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cname, color in colors.items():
            d = root / split / cname
            d.mkdir(parents=True)
            for i in range(6):
                img = np.full((64, 64, 3), color, np.uint8)
                img = np.clip(img.astype(int) + rng.integers(-30, 30, img.shape), 0, 255)
                cv2.imwrite(str(d / f"{i}.jpg"), img.astype(np.uint8))
    return root


@pytest.mark.slow
def test_classify_head_forward():
    import jax.numpy as jnp

    from yolo_ad_refine_tpu.models.model import build_detection_model

    m = build_detection_model(TINY_CLS, imgsz=64)
    probs = m(jnp.zeros((2, 64, 64, 3)), train=False)
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    logits = m(jnp.zeros((2, 64, 64, 3)), train=True)
    assert logits.shape == (2, 3)


@pytest.mark.slow
def test_classify_trains_to_separate_colors(cls_dataset, tmp_path):
    from yolo_ad_refine_tpu.train.classify import ClassificationTrainer

    trainer = ClassificationTrainer(overrides={
        "model": TINY_CLS, "data": str(cls_dataset), "epochs": 8, "batch": 6,
        "imgsz": 64, "optimizer": "SGD", "lr0": 0.05, "warmup_epochs": 0.0,
        "project": str(tmp_path), "name": "cls",
    })
    results = trainer.train()
    # trivially separable colors: should be (near) perfect quickly
    assert results["top1"] >= 0.8, results
