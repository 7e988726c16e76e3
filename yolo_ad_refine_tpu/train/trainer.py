"""Detection trainer: the full train loop.

Parity surface: reference engine/trainer.py:58-813 (BaseTrainer) +
models/yolo/detect/train.py:19-143 (DetectionTrainer). Capabilities carried
over: cfg merge from default.yaml + overrides, warmup lr/momentum schedules,
gradient accumulation to nbs=64, grad clip 10.0, EMA validation and EMA
checkpoints, fitness-driven best.pt (fork-flipped 0.9*mAP50 + 0.1*mAP),
EarlyStopping(patience), close_mosaic, results.csv, resume.

TPU-first: one jitted train step (forward+loss+grad+update+EMA) runs under a
data mesh — the whole DDP machinery (subprocess relaunch, NCCL groups,
DistributedSampler, world-size loss scaling, rank gating) is replaced by
sharding the batch across jax.devices() (see parallel/).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from yolo_ad_refine_tpu.data import DataLoader, YOLODataset, check_det_dataset
from yolo_ad_refine_tpu.engine.checkpoint import save_checkpoint
from yolo_ad_refine_tpu.engine.validator import DetectionValidator
from yolo_ad_refine_tpu.models.model import DetectionModel
from yolo_ad_refine_tpu.parallel import make_mesh_for_batch, make_parallel_train_step, shard_batch
from yolo_ad_refine_tpu.train.loss import DetectionLoss
from yolo_ad_refine_tpu.train.optim import build_optimizer
from yolo_ad_refine_tpu.train.step import TrainState, make_train_step
from yolo_ad_refine_tpu.utils import DEFAULT_CFG_PATH, LOGGER, colorstr, increment_path, yaml_load, yaml_save
from yolo_ad_refine_tpu.utils.callbacks import Callbacks
from yolo_ad_refine_tpu.utils.plotting import plot_images, plot_results


def get_cfg(overrides: dict | None = None) -> dict:
    """default.yaml + overrides merge with unknown-key fuzzy suggestions and
    type/range validation (cfg/config.py; reference cfg/__init__.py:225)."""
    from yolo_ad_refine_tpu.cfg.config import get_cfg as _get_cfg

    return _get_cfg(overrides)


def multi_scale_batch(batch: dict, imgsz: int, rng: np.random.Generator) -> dict:
    """Random-resize a batch to 0.5-1.5x imgsz, stride-64 rounded
    (reference detect/train.py:60-75).

    TPU note: resizing happens host-side and each distinct size compiles its
    own train-step executable (XLA static shapes); sizes are drawn from a
    small discrete grid so the compile set stays bounded.
    """
    import cv2

    lo = (int(imgsz * 0.5) // 64) * 64
    hi = (int(imgsz * 1.5) // 64) * 64
    sizes = list(range(max(lo, 64), hi + 1, 64))
    sz = int(sizes[rng.integers(0, len(sizes))])
    if sz == batch["img"].shape[1]:
        return batch
    scale = sz / batch["img"].shape[1]
    imgs = np.stack([
        cv2.resize(im, (sz, sz), interpolation=cv2.INTER_LINEAR) for im in batch["img"]
    ])
    out = dict(batch)
    out["img"] = imgs
    out["bboxes"] = batch["bboxes"].copy()
    out["bboxes"][..., :4] *= scale  # col 4 (obb angle) is scale-invariant
    if "keypoints" in batch:  # pose GT rides the same resize
        out["keypoints"] = batch["keypoints"].copy()
        out["keypoints"][..., :2] *= scale
    if "masks" in batch:  # segment index masks track the proto size (H/4)
        mh = sz // 4
        out["masks"] = np.stack([
            # cv2 can't resize int32; instance indices fit uint16 (max_boxes < 65536)
            cv2.resize(m.astype(np.uint16), (mh, mh), interpolation=cv2.INTER_NEAREST)
            for m in batch["masks"]
        ]).astype(batch["masks"].dtype)
    return out


class EarlyStopping:
    """Stop when fitness stalls (reference torch_utils.py:716-758)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(f"EarlyStopping: no improvement in last {self.patience} epochs.")
        return stop


class DetectionTrainer:
    """End-to-end detection training."""

    def __init__(self, overrides: dict | None = None, model: DetectionModel | None = None):
        self.args = get_cfg(overrides)
        self.model = model
        self.epochs = int(self.args["epochs"])
        self.batch_size = int(self.args["batch"])
        self.imgsz = int(self.args["imgsz"])
        name = self.args.get("name") or "train"
        self.save_dir = increment_path(Path(self.args.get("project") or "runs") / name,
                                       exist_ok=bool(self.args.get("exist_ok", False)), mkdir=True)
        self.wdir = self.save_dir / "weights"
        self.wdir.mkdir(parents=True, exist_ok=True)
        self.best_fitness = 0.0
        self.start_epoch = 0
        self.csv = self.save_dir / "results.csv"
        self.callbacks = Callbacks()
        from yolo_ad_refine_tpu.utils.callbacks import integration_callbacks

        for hook, fns in integration_callbacks(self.save_dir).items():
            for fn in fns:
                self.callbacks.add(hook, fn)
        self.current_epoch = 0
        self.last_epoch_scalars = {}

    # -- setup ------------------------------------------------------------
    def _setup(self):
        args = self.args
        data = check_det_dataset(args["data"])
        self.data = data
        hyp = {k: args[k] for k in (
            "hsv_h", "hsv_s", "hsv_v", "degrees", "translate", "scale", "shear",
            "perspective", "flipud", "fliplr", "mosaic", "mixup", "copy_paste")}
        max_boxes = int(args.get("max_boxes", 128))
        self.task = args.get("task", "detect")
        if self.batch_size == -1:  # reference autobatch (batch=-1)
            self.batch_size = self._autobatch(data["nc"], max_boxes)
            self.args["batch"] = self.batch_size
        task_kw = {}
        if self.task == "pose":
            task_kw = {"kpt_shape": data.get("kpt_shape"), "flip_idx": data.get("flip_idx")}
        train_ds = YOLODataset(data["train"], imgsz=self.imgsz, augment=True, hyp=hyp,
                               nc=data["nc"], max_boxes=max_boxes,
                               fraction=float(args.get("fraction", 1.0)), task=self.task,
                               cache_images=args.get("cache", False),
                               **task_kw)
        self.train_loader = DataLoader(train_ds, batch_size=self.batch_size, shuffle=True,
                                       seed=int(args.get("seed", 0)), drop_last=True)
        self.nb = max(len(self.train_loader), 1)

        if self.model is None:
            dtype = jnp.bfloat16 if args.get("amp", True) and jax.devices()[0].platform != "cpu" \
                else jnp.float32
            self.model = DetectionModel(args["model"], nc=data["nc"], dtype=dtype)
            self.model.init(jax.random.PRNGKey(int(args.get("seed", 0))), imgsz=self.imgsz)
        elif self.model.nc != data["nc"]:
            LOGGER.info(f"rebuilding model head for nc={data['nc']}")
            self.model = DetectionModel(self.model.yaml, nc=data["nc"], dtype=self.model.dtype)
            self.model.init(jax.random.PRNGKey(int(args.get("seed", 0))), imgsz=self.imgsz)

        # bf16 canary (reference checks.py:651 check_amp): fall back to fp32
        # when the architecture diverges numerically under bf16 compute
        if self.model.dtype != jnp.float32 and args.get("amp", True):
            from yolo_ad_refine_tpu.utils.checks import check_amp

            if not check_amp(self.model):
                self.model = DetectionModel(self.model.yaml, nc=data["nc"],
                                            dtype=jnp.float32)
                self.model.init(jax.random.PRNGKey(int(args.get("seed", 0))),
                                imgsz=self.imgsz)

        gains = dict(box_gain=float(args["box"]), cls_gain=float(args["cls"]),
                     dfl_gain=float(args["dfl"]))
        if self.task == "segment":
            from yolo_ad_refine_tpu.train.segment import SegmentationLoss

            self.loss_fn = SegmentationLoss(nc=data["nc"], strides=self.model.strides, **gains)
            self.extra_loss_keys = ("masks",)
            # the val-loss path uses the detection components of the seg loss
            self.val_loss_fn = self.loss_fn.det
        elif self.task == "pose":
            from yolo_ad_refine_tpu.train.pose import PoseLoss

            kpt_shape = tuple(getattr(self.model.head_spec.module, "kpt_shape", (17, 3)))
            self.loss_fn = PoseLoss(nc=data["nc"], strides=self.model.strides,
                                    kpt_shape=kpt_shape, **gains,
                                    pose_gain=float(args.get("pose", 12.0)),
                                    kobj_gain=float(args.get("kobj", 1.0)))
            self.extra_loss_keys = ("keypoints",)
            self.val_loss_fn = self.loss_fn.det
        elif self.task == "obb":
            from yolo_ad_refine_tpu.train.obb import OBBLoss

            self.loss_fn = OBBLoss(nc=data["nc"], strides=self.model.strides, **gains)
            self.extra_loss_keys = ()
            # OBBLoss consumes the head's full (feats, angle) train output,
            # which the eval path also returns — reuse it for val loss
            self.val_loss_fn = self.loss_fn
        elif getattr(self.model.head_spec, "name", "") == "RTDETRDecoder":
            from yolo_ad_refine_tpu.train.rtdetr import (
                RTDETRLoss, build_dn_attn_blocked, make_cdn_group,
            )

            nq = int(getattr(self.model.head_spec.module, "nq", 300))
            self.loss_fn = RTDETRLoss(nc=data["nc"], nq=nq, imgsz=self.imgsz,
                                      max_boxes=max_boxes)
            self.extra_loss_keys = ()
            self.val_loss_fn = self.loss_fn
            attn_blocked = jnp.asarray(build_dn_attn_blocked(self.loss_fn.dn_cfg, nq))
            nc_, imgsz_, cfg_ = data["nc"], float(self.imgsz), self.loss_fn.dn_cfg
            self.dn_fn = lambda batch, rng: make_cdn_group(
                batch["cls"], batch["bboxes"], batch["mask"], rng,
                nc=nc_, imgsz=imgsz_, cfg=cfg_, attn_blocked=attn_blocked,
            )
            if args.get("multi_scale"):
                LOGGER.warning("multi_scale is not supported for RT-DETR "
                               "(loss normalizes boxes by the static imgsz); disabling")
                self.args["multi_scale"] = False
        elif getattr(self.model.head_spec, "name", "") == "v10Detect":
            from yolo_ad_refine_tpu.train.loss import E2EDetectLoss

            self.loss_fn = E2EDetectLoss(nc=data["nc"], strides=self.model.strides, **gains)
            self.extra_loss_keys = ()
            self.val_loss_fn = self.loss_fn  # eval also returns the branch dict
        else:
            self.loss_fn = DetectionLoss(nc=data["nc"], strides=self.model.strides, **gains)
            self.extra_loss_keys = ()
            self.val_loss_fn = self.loss_fn
        tx, accumulate, self.lr_fns = build_optimizer(
            self.model.variables["params"],
            optimizer=args.get("optimizer", "auto"), lr0=float(args["lr0"]),
            lrf=float(args["lrf"]), momentum=float(args["momentum"]),
            weight_decay=float(args["weight_decay"]), epochs=self.epochs, nb=self.nb,
            batch=self.batch_size, nbs=int(args.get("nbs", 64)),
            warmup_epochs=float(args.get("warmup_epochs", 3.0)),
            warmup_momentum=float(args.get("warmup_momentum", 0.8)),
            warmup_bias_lr=float(args.get("warmup_bias_lr", 0.1)),
            cos_lr=bool(args.get("cos_lr", False)), nc=data["nc"],
        )
        # accumulation (sum semantics) + schedule unit mapping live inside
        # build_optimizer; the step only needs the count for EMA gating
        self.accumulate = accumulate
        self.tx = tx
        self.state = TrainState.create(self.model.variables, tx)

        # resume (reference trainer.py:686-744): restore params/EMA/optimizer/
        # epoch/best_fitness from a previous run's last checkpoint
        resume = args.get("resume")
        if resume:
            from yolo_ad_refine_tpu.engine.checkpoint import load_train_state

            ckpt = Path(resume) if isinstance(resume, (str, Path)) and Path(str(resume)).exists() \
                else self.wdir / "last"
            if not (Path(ckpt) / "train.msgpack").exists():
                raise FileNotFoundError(f"resume checkpoint not found at {ckpt}")
            self.state, self.start_epoch, self.best_fitness = load_train_state(
                ckpt, self.state, self.model
            )
            LOGGER.info(f"resuming from {ckpt} at epoch {self.start_epoch} "
                        f"(best fitness {self.best_fitness:.4f})")

        self.mesh = make_mesh_for_batch(self.batch_size)
        from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_train_enabled

        pro_meta = (self.model.prologue_meta if prologue_train_enabled()
                    and getattr(self.model, "prologue_meta", None) is not None
                    else None)
        step = make_train_step(self.model.graph, self.loss_fn, tx,
                               extra_loss_keys=self.extra_loss_keys,
                               accumulate=self.accumulate,
                               dn_fn=getattr(self, "dn_fn", None),
                               prologue_meta=pro_meta,
                               prologue_dtype=self.model.dtype)
        # fsdp=True: ZeRO-3 layout — params/optimizer/EMA sharded leaf-wise
        # over the mesh, XLA inserts all-gather/reduce-scatter (parallel/).
        self.train_step = make_parallel_train_step(
            step, self.mesh, fsdp=bool(args.get("fsdp")), state=self.state)

        self.validator = DetectionValidator(args={
            **{k: args[k] for k in ("imgsz", "iou", "max_det", "max_boxes")},
            "batch": self.batch_size, "conf": 0.001, "split": args.get("split", "val"),
            "plots": bool(args.get("plots", True)), "save_dir": str(self.save_dir),
            "task": self.task,
        })
        val_path = data.get(args.get("split", "val")) or data["train"]
        val_ds = YOLODataset(val_path, imgsz=self.imgsz, augment=False, nc=data["nc"],
                             max_boxes=max_boxes, task=self.task, **task_kw)
        self.val_loader = DataLoader(val_ds, batch_size=self.batch_size, shuffle=False)
        self.validator.names = data["names"]
        self.stopper = EarlyStopping(int(args.get("patience", 100)))
        yaml_save(self.save_dir / "args.yaml", self.args)

    def _autobatch(self, nc: int, max_boxes: int) -> int:
        """Pick batch from XLA memory analysis of the real detect train step
        (utils/autobatch.py; reference utils/autobatch.py check_train_batch_size)."""
        import jax.numpy as jnp

        from yolo_ad_refine_tpu.train.loss import DetectionLoss
        from yolo_ad_refine_tpu.train.step import TrainState, make_train_step
        from yolo_ad_refine_tpu.utils.autobatch import autobatch

        if self.model is None:
            dtype = jnp.bfloat16 if self.args.get("amp", True) and \
                jax.devices()[0].platform != "cpu" else jnp.float32
            self.model = DetectionModel(self.args["model"], nc=nc, dtype=dtype)
            self.model.init(jax.random.PRNGKey(int(self.args.get("seed", 0))),
                            imgsz=self.imgsz)
        import optax

        tx = optax.sgd(0.01, momentum=0.9)  # probe opt ~= default SGD state size
        det_loss = DetectionLoss(nc=nc, strides=self.model.strides)

        def loss_fn(preds, *targets):
            # task heads (Segment/Pose/OBB) return (feats, *extra) in train
            # mode; the probe charges the detection loss — the extra-branch
            # losses are a small constant on top of the fitted peak
            return det_loss(preds[0] if isinstance(preds, tuple) else preds, *targets)

        step = make_train_step(self.model.graph, loss_fn, tx)
        state = TrainState.create(self.model.variables, tx)

        def program(b):
            batch = {
                "img": jax.ShapeDtypeStruct((b, self.imgsz, self.imgsz, 3), jnp.uint8),
                "cls": jax.ShapeDtypeStruct((b, max_boxes, 1), jnp.float32),
                "bboxes": jax.ShapeDtypeStruct((b, max_boxes, 4), jnp.float32),
                "mask": jax.ShapeDtypeStruct((b, max_boxes, 1), jnp.float32),
            }
            return step, (state, batch, jax.random.PRNGKey(0))

        return autobatch(program, fraction=float(self.args.get("autobatch_fraction", 0.60)))

    # -- loop ----------------------------------------------------------------
    def train(self):
        self._setup()
        args = self.args
        LOGGER.info(
            f"{colorstr('trainer:')} {len(self.train_loader.dataset)} train imgs, "
            f"{len(self.val_loader.dataset)} val imgs, {self.epochs} epochs, "
            f"batch {self.batch_size} on {len(jax.devices())} device(s)"
        )
        close_mosaic = int(args.get("close_mosaic", 10))
        rng = jax.random.PRNGKey(int(args.get("seed", 0)))
        t_start = time.time()
        final_epoch = self.epochs - 1
        self.callbacks.run("on_train_start", self)

        for epoch in range(self.start_epoch, self.epochs):
            self.current_epoch = epoch
            self.callbacks.run("on_train_epoch_start", self)
            if close_mosaic and epoch == self.epochs - close_mosaic:
                LOGGER.info("Closing dataloader mosaic")
                self.train_loader.close_mosaic()
            self.train_loader.set_epoch(epoch)
            epoch_metrics = []  # device scalars; fetched once per epoch (no per-step sync)
            nbatch = 0
            ms_rng = np.random.default_rng(int(args.get("seed", 0)) + epoch)
            with self.mesh:
                for batch in self.train_loader:
                    if epoch == 0 and nbatch < 3 and self.args.get("plots", True):
                        plot_images(batch["img"], batch["bboxes"], batch["cls"],
                                    batch["mask"], self.data["names"],
                                    self.save_dir / f"train_batch{nbatch}.jpg")
                    nbatch += 1
                    if args.get("multi_scale"):
                        batch = multi_scale_batch(batch, self.imgsz, ms_rng)
                    rng, step_rng = jax.random.split(rng)
                    device_batch = shard_batch(
                        {k: batch[k] for k in
                         ("img", "cls", "bboxes", "mask", *self.extra_loss_keys)}, self.mesh
                    )
                    self.state, metrics = self.train_step(self.state, device_batch, step_rng)
                    epoch_metrics.append(
                        (metrics["box_loss"], metrics["cls_loss"], metrics["dfl_loss"],
                         metrics.get("dcn_offset_max", 0.0))
                    )
            fetched = np.asarray(jax.device_get(epoch_metrics))
            mloss = fetched[:, :3].mean(axis=0)
            # DCN offset-bound guard (DyDCNv2.radius): the bounded kernels
            # clip |offset| at the radius; approaching it means train-time
            # sampling is being clipped and a larger radius (or the exact
            # gather) should be considered.
            self.dcn_offset_max = float(fetched[:, 3].max())
            # running max over the whole run: recorded in checkpoints so
            # load_checkpoint can widen the DCN clip radius to cover the
            # trained offsets (reference mmcv kernel is unbounded)
            self.dcn_offset_max_run = max(self.dcn_offset_max,
                                          float(getattr(self, "dcn_offset_max_run", 0.0)))
            head_mod = getattr(getattr(self.model, "head_spec", None), "module", None)
            dcn_radius = float(getattr(head_mod, "dcn_radius", 3.0))
            if self.dcn_offset_max > 0.9 * dcn_radius:
                LOGGER.warning(
                    f"max |DCN offset| = {self.dcn_offset_max:.2f} is near/over the "
                    f"Pallas kernel bound (radius {dcn_radius:g}); sampling is "
                    f"clipped beyond it — consider raising DyDCNv2.radius"
                )

            # EMA validation (reference trainer.py:594-604)
            results = {}
            fitness = 0.0
            if args.get("val", True) or epoch == final_epoch:
                results = self.validator(
                    model=self.model,
                    variables=jax.tree.map(lambda x: x, self.state.ema_variables),
                    dataloader=self.val_loader, loss_fn=self.val_loss_fn,
                )
                fitness = results.get("fitness", 0.0)
            if fitness >= self.best_fitness:
                self.best_fitness = fitness

            self._log_epoch(epoch, mloss, results, time.time() - t_start)
            self.last_epoch_scalars = {
                "train/box_loss": float(mloss[0]), "train/cls_loss": float(mloss[1]),
                "train/dfl_loss": float(mloss[2]),
                **{k: float(v) for k, v in results.items() if isinstance(v, (int, float))},
            }
            self.callbacks.run("on_fit_epoch_end", self)
            self._save_ckpts(epoch, fitness)
            self.callbacks.run("on_model_save", self)
            if self.stopper(epoch, fitness):
                break

        # the train step donates the state buffers, which alias the model's
        # original variables — refresh the model with the final EMA weights
        # so the returned model is usable (and matches best.pt semantics)
        self.model.variables = jax.device_get(self.state.ema_variables)
        self.model.variables = jax.tree.map(jnp.asarray, self.model.variables)
        self.model.names = self.data["names"]

        if self.args.get("plots", True):
            plot_results(self.csv)
        # final eval of best.pt (reference trainer.py:670-684 final_eval)
        best = self.wdir / "best"
        if args.get("val", True) and (best / "weights.msgpack").exists():
            from flax import serialization

            LOGGER.info(f"Validating {best}...")
            best_vars = serialization.msgpack_restore((best / "weights.msgpack").read_bytes())
            best_vars = jax.tree.map(jnp.asarray, best_vars)
            results = self.validator(model=self.model, variables=best_vars,
                                     dataloader=self.val_loader)
        self.callbacks.run("on_train_end", self)
        LOGGER.info(f"training complete in {(time.time() - t_start) / 3600:.3f} h; "
                    f"best fitness {self.best_fitness:.4f}")
        return {"best_fitness": self.best_fitness, "save_dir": str(self.save_dir), **results}

    # -- logging / ckpt ---------------------------------------------------
    def _log_epoch(self, epoch, mloss, results, elapsed):
        # schema matches reference results.csv (weights/*/results.csv)
        keys = ["epoch", "time", "train/box_loss", "train/cls_loss", "train/dfl_loss",
                "metrics/precision(B)", "metrics/recall(B)", "metrics/mAP50(B)",
                "metrics/mAP50-95(B)", "val/box_loss", "val/cls_loss", "val/dfl_loss",
                "lr/pg0", "lr/pg1", "lr/pg2", "train/dcn_offset_max"]
        step = int(self.state.step)
        lrs = [float(self.lr_fns[k](step)) for k in ("pg0", "pg1", "pg2")]
        vals = [epoch, elapsed, *[float(x) for x in mloss],
                *[results.get(k, 0.0) for k in keys[5:12]], *lrs,
                float(getattr(self, "dcn_offset_max", 0.0))]
        header = not self.csv.exists()
        with open(self.csv, "a") as f:
            if header:
                f.write(",".join(keys) + "\n")
            f.write(",".join(f"{v:.6g}" if isinstance(v, float) else str(v) for v in vals) + "\n")
        LOGGER.info(
            f"epoch {epoch + 1}/{self.epochs} box {mloss[0]:.3f} cls {mloss[1]:.3f} "
            f"dfl {mloss[2]:.3f} mAP50 {results.get('metrics/mAP50(B)', 0.0):.4f} "
            f"fitness {results.get('fitness', 0.0):.4f}"
        )

    def _save_ckpts(self, epoch, fitness):
        if not self.args.get("save", True):
            return
        off_max = getattr(self, "dcn_offset_max_run", None)
        save_checkpoint(self.wdir / "last", model=self.model, state=self.state, epoch=epoch,
                        best_fitness=self.best_fitness, train_args=self.args,
                        include_optimizer=True, names=self.data["names"],
                        dcn_offset_max=off_max)
        if fitness >= self.best_fitness:
            save_checkpoint(self.wdir / "best", model=self.model, state=self.state, epoch=epoch,
                            best_fitness=self.best_fitness, train_args=self.args,
                            names=self.data["names"], dcn_offset_max=off_max)
