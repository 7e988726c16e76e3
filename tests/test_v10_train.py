"""YOLOv10 dual-assignment training + NMS-free validation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

TINY_V10 = {
    "nc": 1,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "v10Detect", ["nc"]]],
}


@pytest.fixture(scope="module")
def det_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("v10ds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(2)
    for i in range(6):
        img = rng.integers(0, 60, (96, 96, 3), dtype=np.uint8)
        lines = []
        for _ in range(2):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w = h = 0.25
            cv2.rectangle(img, (int((cx - w / 2) * 96), int((cy - h / 2) * 96)),
                          (int((cx + w / 2) * 96), int((cy + h / 2) * 96)), (0, 0, 255), -1)
            lines.append(f"0 {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}")
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        (root / "labels" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    return root


class TestE2ELoss:
    def test_dual_branch_grads(self):
        from yolo_ad_refine_tpu.models.model import build_detection_model
        from yolo_ad_refine_tpu.train.loss import E2EDetectLoss

        m = build_detection_model(TINY_V10, nc=1, imgsz=64)
        loss_fn = E2EDetectLoss(nc=1, strides=m.strides)
        cls = jnp.zeros((1, 4, 1))
        boxes = jnp.asarray([[[8, 8, 40, 40], [20, 20, 60, 60], [0, 0, 0, 0],
                              [0, 0, 0, 0]]], jnp.float32)
        mask = jnp.asarray([[[1.0], [1.0], [0.0], [0.0]]])

        def f(params):
            preds = m.graph.apply(
                {"params": params, "batch_stats": m.variables.get("batch_stats", {})},
                jnp.zeros((1, 64, 64, 3)), train=True,
                rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
            )[0]
            return loss_fn(preds, cls, boxes, mask).total

        total, grads = jax.value_and_grad(f)(m.variables["params"])
        assert np.isfinite(float(total))
        # one2one branch params receive gradient (dual supervision)
        o2o = [float(jnp.abs(v).sum()) for k, v in
               jax.tree_util.tree_leaves_with_path(grads)
               if "one2one" in jax.tree_util.keystr(k)]
        assert o2o and sum(o2o) > 0

    def test_v10_training_e2e(self, det_dataset, tmp_path):
        from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

        trainer = DetectionTrainer(overrides={
            "model": TINY_V10,
            "data": {"path": str(det_dataset), "train": "images", "val": "images",
                     "names": {0: "box"}},
            "epochs": 2, "batch": 2, "imgsz": 64, "max_boxes": 8,
            "project": str(tmp_path), "name": "v10", "close_mosaic": 0,
            "warmup_epochs": 0.0, "optimizer": "SGD", "plots": False, "workers": 2,
        })
        results = trainer.train()
        assert "metrics/mAP50(B)" in results
        assert (tmp_path / "v10" / "weights" / "last" / "weights.msgpack").exists()
