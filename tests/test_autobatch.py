"""Autobatch: XLA memory-analysis batch picking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)


class TestAutobatch:
    def test_picks_power_of_two_within_budget(self):
        from yolo_ad_refine_tpu.utils.autobatch import autobatch

        def program(b):
            # ~b * 4 MB of temps per batch element
            def fn(x):
                return (x @ x.transpose(0, 2, 1)).sum()
            return fn, (jax.ShapeDtypeStruct((b, 1024, 1024), jnp.float32),)

        b = autobatch(program, fraction=0.5, max_batch=64)
        assert b in {2 ** i for i in range(0, 7)}

    def test_monotone_in_fraction(self):
        from yolo_ad_refine_tpu.utils.autobatch import autobatch

        def program(b):
            def fn(x):
                return (x * 2).sum()
            return fn, (jax.ShapeDtypeStruct((b, 512, 512), jnp.float32),)

        b_lo = autobatch(program, fraction=0.01, max_batch=1024)
        b_hi = autobatch(program, fraction=0.9, max_batch=1024)
        assert b_lo <= b_hi

    def test_trainer_batch_minus_one(self, tmp_path):
        """batch=-1 resolves to a concrete power-of-two before dataloaders."""
        import cv2

        from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        rng = np.random.default_rng(0)
        for i in range(2):
            cv2.imwrite(str(tmp_path / "images" / f"{i}.jpg"),
                        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
            (tmp_path / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        trainer = DetectionTrainer(overrides={
            "model": {"nc": 1, "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                                            [-1, 1, "Conv", [16, 3, 2]],
                                            [-1, 1, "Conv", [32, 3, 2]]],
                      "head": [[[0, 1, 2], 1, "Detect", ["nc"]]]},
            "data": {"path": str(tmp_path), "train": "images", "val": "images",
                     "names": {0: "a"}},
            "epochs": 1, "batch": -1, "imgsz": 32, "max_boxes": 4,
            "project": str(tmp_path), "name": "ab", "plots": False,
        })
        trainer._setup()
        assert trainer.batch_size >= 1
        assert trainer.batch_size & (trainer.batch_size - 1) == 0  # power of two
