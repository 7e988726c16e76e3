"""Resume test: train 2 epochs, resume to 4, verify continuity
(reference trainer.py:686-744 check_resume/resume_training)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

TINY = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
}


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("resume_ds")
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(8):
            img = rng.integers(0, 60, (96, 96, 3), dtype=np.uint8)
            cv2.rectangle(img, (20, 20), (60, 60), (255, 0, 0), -1)
            cv2.imwrite(str(root / split / "images" / f"{i}.jpg"), img)
            (root / split / "labels" / f"{i}.txt").write_text("0 0.4167 0.4167 0.4167 0.4167\n")
    return {"path": str(root), "train": "train/images", "val": "val/images",
            "names": {0: "a", 1: "b", 2: "c"}}


def test_resume_continues_training(toy_data, tmp_path):
    import jax

    from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

    common = {"model": TINY, "data": toy_data, "batch": 4, "imgsz": 64, "max_boxes": 8,
              "close_mosaic": 0, "warmup_epochs": 0.0, "optimizer": "SGD", "plots": False,
              "val": False}
    t1 = DetectionTrainer(overrides={**common, "epochs": 2,
                                     "project": str(tmp_path), "name": "run"})
    t1.train()
    step_after_2 = int(t1.state.step)
    params_after_2 = t1.state.params

    t2 = DetectionTrainer(overrides={**common, "epochs": 4, "project": str(tmp_path),
                                     "name": "run", "exist_ok": True,
                                     "resume": str(tmp_path / "run" / "weights" / "last")})
    t2._setup()
    assert t2.start_epoch == 2
    assert int(t2.state.step) == step_after_2
    # resumed params equal saved params
    d = jax.tree.map(lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
                     t2.state.params, params_after_2)
    assert max(jax.tree.leaves(d)) == 0.0
    # and training continues from epoch 2 to 4
    results = t2.train()
    csv = (tmp_path / "run" / "results.csv").read_text().splitlines()
    epochs_logged = [int(line.split(",")[0]) for line in csv[1:]]
    assert epochs_logged == [0, 1, 2, 3]


def test_resume_missing_ckpt_raises(toy_data, tmp_path):
    from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

    t = DetectionTrainer(overrides={"model": TINY, "data": toy_data, "epochs": 1,
                                    "batch": 4, "imgsz": 64, "project": str(tmp_path),
                                    "name": "nope", "resume": str(tmp_path / "missing")})
    with pytest.raises(FileNotFoundError, match="resume checkpoint"):
        t._setup()
