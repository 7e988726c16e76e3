"""Classification task: dataset, trainer, validator.

Parity surface: reference models/yolo/classify/ (ClassificationTrainer/
Validator/Predictor over torchvision-style class folders) — the L6 task_map
generalization beyond detect. Compact but complete: folder dataset,
cross-entropy train step (same optimizer/EMA stack as detect), top1/top5
validation.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from yolo_ad_refine_tpu.data.dataset import IMG_FORMATS
from yolo_ad_refine_tpu.models.model import DetectionModel
from yolo_ad_refine_tpu.train.optim import build_optimizer, ema_update
from yolo_ad_refine_tpu.utils import LOGGER, increment_path


class ClassificationDataset:
    """Folder-per-class image dataset (train/val split dirs)."""

    def __init__(self, root: str | Path, imgsz: int = 224, augment: bool = False):
        import cv2  # noqa: F401

        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class folders under {root}")
        self.names = dict(enumerate(classes))
        self.samples = []
        for ci, cname in enumerate(classes):
            for f in sorted((self.root / cname).rglob("*")):
                if f.suffix[1:].lower() in IMG_FORMATS:
                    self.samples.append((str(f), ci))

    def __len__(self):
        return len(self.samples)

    def get(self, i: int, rng: np.random.Generator | None = None):
        import cv2

        path, label = self.samples[i]
        img = cv2.imread(path)
        img = cv2.resize(img, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        if self.augment and rng is not None and rng.random() < 0.5:
            img = np.ascontiguousarray(np.fliplr(img))
        return img[..., ::-1], label  # RGB

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0):
        idx = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        rng = np.random.default_rng(seed)
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            chunk = idx[i : i + batch_size]
            imgs, labels = zip(*(self.get(int(j), rng) for j in chunk))
            yield np.ascontiguousarray(np.stack(imgs)), np.asarray(labels, np.int32)


class ClassificationTrainer:
    """Cross-entropy training over a Classify-headed model."""

    def __init__(self, overrides: dict | None = None):
        from yolo_ad_refine_tpu.train.trainer import get_cfg

        self.args = get_cfg(overrides or {})
        self.args.setdefault("imgsz", 224)

    def train(self):
        args = self.args
        imgsz = int(args.get("imgsz") or 224)
        batch = int(args["batch"])
        epochs = int(args["epochs"])
        root = Path(args["data"])
        train_ds = ClassificationDataset(root / "train", imgsz, augment=True)
        val_ds = ClassificationDataset(root / "val" if (root / "val").exists() else root / "train",
                                       imgsz)
        nc = len(train_ds.names)

        model = DetectionModel(args["model"], nc=nc)
        model.init(jax.random.PRNGKey(int(args.get("seed", 0))), imgsz=imgsz)
        model.names = train_ds.names

        nb = max(len(train_ds) // batch, 1)
        tx, accumulate, _ = build_optimizer(
            model.variables["params"], optimizer=args.get("optimizer", "auto"),
            lr0=float(args["lr0"]), lrf=float(args["lrf"]), momentum=float(args["momentum"]),
            weight_decay=float(args["weight_decay"]), epochs=epochs, nb=nb, batch=batch,
            warmup_epochs=float(args.get("warmup_epochs", 3.0)), nc=nc,
        )
        del accumulate  # accumulation handled inside build_optimizer

        from yolo_ad_refine_tpu.train.step import TrainState

        state = TrainState.create(model.variables, tx)
        graph = model.graph

        @jax.jit
        def train_step(state, imgs, labels, rng):
            def loss_fn(params, stats):
                logits, mutated = graph.apply(
                    {"params": params, "batch_stats": stats},
                    imgs.astype(model.dtype) / 255.0, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                )
                loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
                return loss, mutated.get("batch_stats", stats)

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), state.params, updates)
            n = state.ema_updates + 1.0
            return state.replace(
                params=params, batch_stats=new_stats, opt_state=opt_state,
                ema_params=ema_update(state.ema_params, params, n),
                ema_batch_stats=ema_update(state.ema_batch_stats, new_stats, n),
                step=state.step + 1, ema_updates=n,
            ), loss

        rng = jax.random.PRNGKey(0)
        save_dir = increment_path(Path(args.get("project") or "runs") / (args.get("name") or "cls"),
                                  mkdir=True)
        best_top1 = 0.0
        for epoch in range(epochs):
            losses = []
            for imgs, labels in train_ds.batches(batch, shuffle=True, seed=epoch):
                rng, k = jax.random.split(rng)
                state, loss = train_step(state, jnp.asarray(imgs), jnp.asarray(labels), k)
                losses.append(loss)
            metrics = self.validate(model, state.ema_variables, val_ds, batch)
            best_top1 = max(best_top1, metrics["top1"])
            LOGGER.info(f"epoch {epoch + 1}/{epochs} loss {np.mean(jax.device_get(losses)):.3f} "
                        f"top1 {metrics['top1']:.3f} top5 {metrics['top5']:.3f}")
        model.variables = jax.device_get(state.ema_variables)
        from yolo_ad_refine_tpu.engine.checkpoint import save_checkpoint

        save_checkpoint(save_dir / "weights" / "best", model=model, names=train_ds.names)
        self.model = model
        return {"top1": best_top1, "save_dir": str(save_dir)}

    @staticmethod
    def validate(model, variables, dataset, batch: int) -> dict:
        graph = model.graph

        @jax.jit
        def fwd(imgs):
            return graph.apply(variables, imgs.astype(model.dtype) / 255.0, train=False)

        correct1 = correct5 = total = 0
        for imgs, labels in dataset.batches(batch, shuffle=False):
            probs = np.asarray(fwd(jnp.asarray(imgs)))
            top5 = np.argsort(-probs, axis=-1)[:, :5]
            correct1 += int((top5[:, 0] == labels).sum())
            correct5 += int((top5 == labels[:, None]).any(-1).sum())
            total += len(labels)
        total = max(total, 1)
        return {"top1": correct1 / total, "top5": correct5 / total}
