"""End-to-end engine tests on a tiny model + synthetic dataset.

Mirrors the reference's engine tests (tests/test_engine.py: drive
trainer/validator/predictor directly on a toy dataset at small imgsz).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# tiny 5-conv backbone + Detect head: small XLA program, fast CPU compile
TINY_CFG = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],   # 2 P3/8
        [-1, 1, "Conv", [128, 3, 2]],  # 3 P4/16
        [-1, 1, "Conv", [256, 3, 2]],  # 4 P5/32
    ],
    "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
}

TINY_AY_CFG = {**TINY_CFG, "head": [[[2, 3, 4], 1, "AYHead", ["nc"]]]}


@pytest.fixture(scope="session")
def toy_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("e2eds")
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.default_rng(hash(split) % 2**31)
        for i in range(8):
            img = rng.integers(0, 60, (96, 96, 3), dtype=np.uint8)
            lines = []
            for _ in range(2):
                bw = bh = int(rng.integers(20, 40))
                x1 = int(rng.integers(0, 96 - bw))
                y1 = int(rng.integers(0, 96 - bh))
                c = int(rng.integers(0, 3))
                color = [(255, 0, 0), (0, 255, 0), (0, 0, 255)][c]
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
                lines.append(
                    f"{c} {(x1 + bw / 2) / 96:.4f} {(y1 + bh / 2) / 96:.4f} {bw / 96:.4f} {bh / 96:.4f}"
                )
            cv2.imwrite(str(root / split / "images" / f"{i}.jpg"), img)
            (root / split / "labels" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    data = {
        "path": str(root),
        "train": "train/images",
        "val": "val/images",
        "names": {0: "red", 1: "green", 2: "blue"},
    }
    return data


class TestTrainer:
    @pytest.mark.slow
    def test_train_2_epochs(self, toy_dataset, tmp_path):
        from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

        trainer = DetectionTrainer(overrides={
            "model": TINY_CFG, "data": toy_dataset, "epochs": 2, "batch": 4,
            "imgsz": 64, "max_boxes": 8, "project": str(tmp_path), "name": "t",
            "close_mosaic": 0, "warmup_epochs": 0.0, "optimizer": "SGD",
            "workers": 2, "patience": 100,
        })
        results = trainer.train()
        assert "best_fitness" in results
        # artifacts
        from pathlib import Path

        save = Path(results["save_dir"])
        assert (save / "results.csv").exists()
        assert (save / "weights" / "last" / "weights.msgpack").exists()
        csv = (save / "results.csv").read_text().splitlines()
        assert len(csv) == 3  # header + 2 epochs
        # the returned model must be usable after training (donation safety)
        y, _ = trainer.model(jnp.zeros((1, 64, 64, 3)), train=False)
        assert np.isfinite(np.asarray(y)).all()

    @pytest.mark.slow
    def test_checkpoint_roundtrip(self, toy_dataset, tmp_path):
        from yolo_ad_refine_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
        from yolo_ad_refine_tpu.models.model import build_detection_model

        m = build_detection_model(TINY_CFG, imgsz=64)
        p = save_checkpoint(tmp_path / "ck", model=m, epoch=5, best_fitness=0.5)
        m2 = load_checkpoint(p)
        x = jnp.zeros((1, 64, 64, 3))
        y1, _ = m(x)
        y2, _ = m2(x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
        assert m2.ckpt_meta["epoch"] == 5


class TestValidatorPredictor:
    @pytest.mark.slow
    def test_validator_runs(self, toy_dataset):
        from yolo_ad_refine_tpu.engine.validator import DetectionValidator
        from yolo_ad_refine_tpu.models.model import build_detection_model

        m = build_detection_model(TINY_CFG, nc=3, imgsz=64)
        v = DetectionValidator(args={"data": toy_dataset, "imgsz": 64, "batch": 4,
                                     "max_boxes": 8})
        results = v(model=m)
        assert "metrics/mAP50(B)" in results
        assert 0.0 <= results["fitness"] <= 1.0

    def test_predictor_runs(self, toy_dataset, tmp_path):
        import cv2

        from yolo_ad_refine_tpu.engine.predictor import DetectionPredictor
        from yolo_ad_refine_tpu.models.model import build_detection_model

        m = build_detection_model(TINY_CFG, nc=3, imgsz=64)
        img = np.random.default_rng(0).integers(0, 255, (100, 120, 3), dtype=np.uint8)
        p = DetectionPredictor(overrides={"imgsz": 64, "conf": 0.0001, "batch": 2})
        results = p(source=img, model=m, names={0: "a", 1: "b", 2: "c"})
        assert len(results) == 1
        r = results[0]
        assert r.orig_shape == (100, 120)
        # boxes are scaled back to original image space
        if len(r.boxes):
            assert (r.boxes.xyxy[:, 2] <= 120 + 1).all()
            assert (r.boxes.xyxy[:, 3] <= 100 + 1).all()
        # plot + save_txt + json don't crash
        out = r.plot()
        assert out.shape == (100, 120, 3)
        r.save_txt(tmp_path / "out.txt", save_conf=True)
        r.tojson()


class TestAYHeadE2E:
    @pytest.mark.slow
    def test_ayhead_train_step(self, toy_dataset):
        """One gradient step through the full AYHead (deform conv included)."""
        from yolo_ad_refine_tpu.models.model import build_detection_model
        from yolo_ad_refine_tpu.train.loss import DetectionLoss
        from yolo_ad_refine_tpu.train.optim import build_optimizer
        from yolo_ad_refine_tpu.train.step import TrainState, make_train_step

        m = build_detection_model(TINY_AY_CFG, nc=3, imgsz=64)
        loss_fn = DetectionLoss(nc=3, strides=m.strides)
        tx, _, _ = build_optimizer(m.variables["params"], optimizer="SGD", epochs=1, nb=1,
                                   batch=2, nbs=2)  # nbs=batch: no accumulation, one real step
        state = TrainState.create(m.variables, tx)
        step = jax.jit(make_train_step(m.graph, loss_fn, tx))
        r = np.random.default_rng(0)
        batch = {
            "img": jnp.asarray(r.random((2, 64, 64, 3), dtype=np.float32)),
            "cls": jnp.asarray(r.integers(0, 3, (2, 8, 1)).astype(np.float32)),
            "bboxes": jnp.asarray(
                np.tile(np.asarray([8, 8, 40, 40], np.float32), (2, 8, 1))),
            "mask": jnp.ones((2, 8, 1)),
        }
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params actually changed
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
        assert max(jax.tree.leaves(d)) > 0
