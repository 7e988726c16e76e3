"""Checkpoint save/load.

Parity surface: reference engine/trainer.py:507-541 (save_model: ckpt dict
with epoch, best_fitness, EMA-as-model weights, optimizer state, train_args,
date/version; last.pt/best.pt) and tasks.py:718-877 (safe loading). The
torch-pickle single file becomes a directory: variables as flax msgpack +
metadata yaml — no unpickling shims needed, and weights are framework-pure
arrays (the reference pickles whole nn.Modules and needs remapping hacks).

Checkpoints store the EMA weights as the model (reference semantics: best.pt
contains the EMA), plus raw params for exact resume.
"""

from __future__ import annotations

import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from yolo_ad_refine_tpu import __version__
from yolo_ad_refine_tpu.utils import LOGGER, yaml_load, yaml_save


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str | Path, *, model, state=None, epoch: int = -1,
                    best_fitness: float = 0.0, train_args: dict | None = None,
                    include_optimizer: bool = False, names: dict | None = None,
                    dcn_offset_max: float | None = None) -> Path:
    """Write a checkpoint directory: weights.msgpack (+train.msgpack) + meta.yaml."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    if state is not None:
        model_vars = {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
        raw_vars = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        model_vars = model.variables
        raw_vars = None

    (path / "weights.msgpack").write_bytes(serialization.msgpack_serialize(_to_host(model_vars)))
    if raw_vars is not None:
        train_blob = {"variables": _to_host(raw_vars)}
        if include_optimizer and state is not None:
            train_blob["ema_updates"] = np.asarray(state.ema_updates)
            train_blob["step"] = np.asarray(state.step)
            try:
                train_blob["opt_state"] = _to_host(serialization.to_state_dict(state.opt_state))
            except Exception as e:  # noqa: BLE001 - opt state is best-effort
                LOGGER.warning(f"optimizer state not serializable ({e}); resume will re-init it")
        (path / "train.msgpack").write_bytes(serialization.msgpack_serialize(train_blob))

    yaml_save(path / "meta.yaml", {
        "model_yaml": model.yaml,
        "nc": model.nc,
        # max |DCN offset| observed in training (train/dcn_offset_max):
        # load_checkpoint widens the bounded kernels' clip radius to cover
        # it (the reference's mmcv DCN is unbounded, head.py:751-782)
        "dcn_offset_max": (float(dcn_offset_max)
                           if dcn_offset_max is not None else None),
        "names": names or getattr(model, "names", None),
        "epoch": epoch,
        "best_fitness": float(best_fitness),
        "train_args": train_args or {},
        "date": datetime.datetime.now().isoformat(),
        "version": __version__,
    })
    return path


def load_checkpoint(path: str | Path, dtype=jnp.float32):
    """Rebuild a DetectionModel from a checkpoint directory."""
    from yolo_ad_refine_tpu.models.model import DetectionModel

    path = Path(path)
    if path.is_file():  # allow pointing at meta.yaml or weights.msgpack
        path = path.parent
    meta = yaml_load(path / "meta.yaml")
    model_yaml = meta["model_yaml"]
    # checkpoint-aware DCN radius: if training logged offsets beyond the
    # default clip bound, rebuild with a radius that covers them (+1 px
    # headroom — val images can push offsets slightly past the train max).
    off_max = meta.get("dcn_offset_max")
    if off_max:
        import math as _math

        if not isinstance(model_yaml, dict):  # legacy: a yaml path string
            from yolo_ad_refine_tpu.models.parser import load_model_cfg

            model_yaml = load_model_cfg(model_yaml)

        need = _math.ceil(float(off_max)) + 1
        have = float(model_yaml.get("dcn_radius", 3.0))
        if need > have:
            model_yaml = dict(model_yaml, dcn_radius=float(need))
            LOGGER.info(
                f"DCN radius {have:g} -> {need} (checkpoint dcn_offset_max "
                f"{float(off_max):.2f}; bounded kernels stay exact)")
    model = DetectionModel(model_yaml, nc=meta.get("nc"), dtype=dtype)
    blob = (path / "weights.msgpack").read_bytes()
    variables = serialization.msgpack_restore(blob)
    # msgpack_restore returns plain dicts; adopt directly (structure matches).
    # NOTE: no template init here — a dummy trace at a fixed small imgsz
    # breaks models with minimum-size constraints (the flagship's
    # CrossScaleAttentionTSSA needs >= 256 px input; a 64-px trace made
    # load_checkpoint crash on the flagship with a zero-dim resize).
    model.variables = jax.tree.map(jnp.asarray, variables)
    model.probe_strides()
    model.ckpt_meta = meta
    model.names = meta.get("names") or {i: f"class{i}" for i in range(model.nc)}
    LOGGER.info(f"loaded checkpoint {path} (epoch {meta.get('epoch')}, "
                f"fitness {meta.get('best_fitness'):.4f})")
    return model


def load_train_state(path: str | Path, state, model):
    """Restore a TrainState from a checkpoint dir for resume
    (reference trainer.py:718-744 resume_training).

    ``state`` is a freshly created TrainState used as the structure template;
    returns (state, start_epoch, best_fitness).
    """
    path = Path(path)
    meta = yaml_load(path / "meta.yaml")
    ema_vars = serialization.msgpack_restore((path / "weights.msgpack").read_bytes())
    blob = serialization.msgpack_restore((path / "train.msgpack").read_bytes())
    raw = blob["variables"]
    new_state = state.replace(
        params=jax.tree.map(jnp.asarray, raw["params"]),
        batch_stats=jax.tree.map(jnp.asarray, raw.get("batch_stats", {})),
        ema_params=jax.tree.map(jnp.asarray, ema_vars["params"]),
        ema_batch_stats=jax.tree.map(jnp.asarray, ema_vars.get("batch_stats", {})),
    )
    if "step" in blob:
        new_state = new_state.replace(
            step=jnp.asarray(blob["step"]), ema_updates=jnp.asarray(blob["ema_updates"])
        )
    if "opt_state" in blob:
        try:
            restored = serialization.from_state_dict(state.opt_state, blob["opt_state"])
            new_state = new_state.replace(opt_state=jax.tree.map(jnp.asarray, restored))
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"optimizer state restore failed ({e}); momentum restarts fresh")
    start_epoch = int(meta.get("epoch", -1)) + 1
    return new_state, start_epoch, float(meta.get("best_fitness", 0.0))
