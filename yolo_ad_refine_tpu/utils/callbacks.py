"""Callback hook system + integrations.

Parity surface: reference utils/callbacks/base.py:10-199 (the 25 hook points
and default-callback registry) and the integration callbacks (tensorboard.py,
csv via trainer). TensorBoard uses tf.summary when tensorflow is present;
other reference integrations (wandb/mlflow/comet/clearml/dvc/neptune) are
registered as no-op import-guarded hooks — zero-egress environment.
"""

from __future__ import annotations

from collections import defaultdict


from yolo_ad_refine_tpu.utils import LOGGER

# the reference's hook names (callbacks/base.py)
HOOKS = [
    # trainer
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    # validator
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    # predictor
    "on_predict_start", "on_predict_batch_start", "on_predict_batch_end",
    "on_predict_postprocess_end", "on_predict_end",
    # exporter
    "on_export_start", "on_export_end",
]


def get_default_callbacks() -> dict:
    return defaultdict(list, {h: [] for h in HOOKS})


class Callbacks:
    """Per-object callback registry (trainer/validator/predictor own one)."""

    def __init__(self):
        self._callbacks = get_default_callbacks()

    def add(self, event: str, callback):
        assert event in HOOKS, f"unknown hook '{event}'"
        self._callbacks[event].append(callback)

    def run(self, event: str, *args, **kwargs):
        for cb in self._callbacks.get(event, []):
            try:
                cb(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 - callbacks must not kill training
                LOGGER.warning(f"callback {getattr(cb, '__name__', cb)} for {event} failed: {e}")


# ---------------------------------------------------------------------------
# TensorBoard integration (reference utils/callbacks/tensorboard.py)
# ---------------------------------------------------------------------------


def tensorboard_callbacks(log_dir: str):
    """Returns {hook: fn} writing scalars via tf.summary, or {} if tf missing."""
    try:
        import tensorflow as tf
    except ImportError:
        return {}

    writer = tf.summary.create_file_writer(str(log_dir))

    def on_fit_epoch_end(trainer):
        with writer.as_default():
            for k, v in getattr(trainer, "last_epoch_scalars", {}).items():
                tf.summary.scalar(k, float(v), step=int(trainer.current_epoch))
            writer.flush()

    return {"on_fit_epoch_end": on_fit_epoch_end}


# ---------------------------------------------------------------------------
# MLflow integration (reference utils/callbacks/mlflow.py) — file-based local
# tracking works offline; enabled when the package is importable and the
# settings toggle is on.
# ---------------------------------------------------------------------------


def mlflow_callbacks(save_dir: str, run_name: str = "train"):
    """Returns {hook: fn} logging params/metrics to a local mlruns store."""
    try:
        import mlflow
    except ImportError:
        return {}
    from pathlib import Path

    uri = f"file://{Path(save_dir).resolve() / 'mlruns'}"

    def on_train_start(trainer):
        mlflow.set_tracking_uri(uri)
        mlflow.set_experiment("yolo_ad_refine_tpu")
        mlflow.start_run(run_name=run_name)
        params = {k: str(v) for k, v in trainer.args.items()
                  if isinstance(v, (int, float, str, bool))}
        mlflow.log_params(params)

    def on_fit_epoch_end(trainer):
        metrics = {k.replace("(", "").replace(")", ""): float(v)
                   for k, v in getattr(trainer, "last_epoch_scalars", {}).items()}
        mlflow.log_metrics(metrics, step=int(trainer.current_epoch))

    def on_train_end(trainer):
        for f in ("results.csv", "args.yaml"):
            p = Path(trainer.save_dir) / f
            if p.exists():
                mlflow.log_artifact(str(p))
        mlflow.end_run()

    return {"on_train_start": on_train_start, "on_fit_epoch_end": on_fit_epoch_end,
            "on_train_end": on_train_end}


def integration_callbacks(save_dir: str) -> dict:
    """Aggregate enabled integrations (reference callbacks/base.py:187
    add_integration_callbacks), gated by the settings toggles."""
    from yolo_ad_refine_tpu.utils.settings import get_settings

    s = get_settings()
    hooks: dict = {}
    sources = []
    if s.get("tensorboard", True):
        sources.append(tensorboard_callbacks(save_dir))
    if s.get("mlflow", False):
        sources.append(mlflow_callbacks(save_dir))
    for src in sources:
        for hook, fn in src.items():
            hooks.setdefault(hook, []).append(fn)
    return hooks
