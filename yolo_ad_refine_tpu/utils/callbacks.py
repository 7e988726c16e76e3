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
    for name in TRACKERS:
        default = name == "jsonl"  # the offline tracker is on by default
        if s.get(name, default):
            sources.append(tracker_callbacks(name, save_dir))
    for src in sources:
        for hook, fn in src.items():
            hooks.setdefault(hook, []).append(fn)
    return hooks


# ---------------------------------------------------------------------------
# Experiment-tracker integrations (reference utils/callbacks/{wb,comet,
# clearml,dvc,neptune}.py). Each activates only when its package imports —
# none ship in this zero-egress build — and shares one generic adapter so
# the hook wiring is tested without the SDKs. The always-available 'jsonl'
# tracker appends epoch records to <save_dir>/metrics.jsonl, giving every
# run a machine-readable offline log regardless of installed trackers.
# ---------------------------------------------------------------------------


class _TrackerAdapter:
    """start(params) / log(metrics, step) / finish(artifacts) protocol."""

    def callbacks(self, save_dir: str) -> dict:
        def on_train_start(trainer):
            params = {k: v for k, v in trainer.args.items()
                      if isinstance(v, (int, float, str, bool))}
            self.start(params, save_dir)

        def on_fit_epoch_end(trainer):
            self.log(dict(getattr(trainer, "last_epoch_scalars", {})),
                     int(trainer.current_epoch))

        def on_train_end(trainer):
            from pathlib import Path

            arts = [p for f in ("results.csv", "args.yaml", "results.png")
                    if (p := Path(trainer.save_dir) / f).exists()]
            self.finish(arts)

        return {"on_train_start": on_train_start,
                "on_fit_epoch_end": on_fit_epoch_end,
                "on_train_end": on_train_end}


class JsonlTracker(_TrackerAdapter):
    """Dependency-free offline tracker: one JSON line per epoch."""

    def start(self, params, save_dir):
        import json
        from pathlib import Path

        self.path = Path(save_dir) / "metrics.jsonl"
        self.path.write_text(json.dumps({"event": "start", "params": params}) + "\n")

    def log(self, metrics, step):
        import json

        with self.path.open("a") as f:
            f.write(json.dumps({"event": "epoch", "step": step,
                                "metrics": {k: float(v) for k, v in metrics.items()}}) + "\n")

    def finish(self, artifacts):
        import json

        with self.path.open("a") as f:
            f.write(json.dumps({"event": "end",
                                "artifacts": [str(a) for a in artifacts]}) + "\n")


class WandbTracker(_TrackerAdapter):
    """Weights & Biases (reference callbacks/wb.py)."""

    def start(self, params, save_dir):
        import wandb

        self.run = wandb.init(project="yolo_ad_refine_tpu", config=params,
                              dir=str(save_dir))

    def log(self, metrics, step):
        self.run.log(metrics, step=step)

    def finish(self, artifacts):
        for a in artifacts:
            self.run.save(str(a))
        self.run.finish()


class CometTracker(_TrackerAdapter):
    """Comet ML (reference callbacks/comet.py)."""

    def start(self, params, save_dir):
        import comet_ml

        self.exp = comet_ml.Experiment(project_name="yolo_ad_refine_tpu")
        self.exp.log_parameters(params)

    def log(self, metrics, step):
        self.exp.log_metrics(metrics, step=step)

    def finish(self, artifacts):
        for a in artifacts:
            self.exp.log_asset(str(a))
        self.exp.end()


class ClearmlTracker(_TrackerAdapter):
    """ClearML (reference callbacks/clearml.py)."""

    def start(self, params, save_dir):
        from clearml import Task

        self.task = Task.init(project_name="yolo_ad_refine_tpu", task_name="train")
        self.task.connect(params)

    def log(self, metrics, step):
        logger = self.task.get_logger()
        for k, v in metrics.items():
            logger.report_scalar("train", k, float(v), iteration=step)

    def finish(self, artifacts):
        for a in artifacts:
            self.task.upload_artifact(name=a.name, artifact_object=str(a))


class DvcTracker(_TrackerAdapter):
    """DVCLive (reference callbacks/dvc.py)."""

    def start(self, params, save_dir):
        from dvclive import Live

        self.live = Live(str(save_dir), save_dvc_exp=True)
        for k, v in params.items():
            self.live.log_param(k, v)

    def log(self, metrics, step):
        for k, v in metrics.items():
            self.live.log_metric(k, float(v))
        self.live.next_step()

    def finish(self, artifacts):
        for a in artifacts:
            self.live.log_artifact(str(a))
        self.live.end()


class NeptuneTracker(_TrackerAdapter):
    """Neptune (reference callbacks/neptune.py)."""

    def start(self, params, save_dir):
        import neptune

        self.run = neptune.init_run(project="yolo_ad_refine_tpu")
        self.run["parameters"] = params

    def log(self, metrics, step):
        for k, v in metrics.items():
            self.run[f"train/{k}"].append(float(v), step=step)

    def finish(self, artifacts):
        for a in artifacts:
            self.run[f"artifacts/{a.name}"].upload(str(a))
        self.run.stop()


TRACKERS = {
    "jsonl": (JsonlTracker, None),          # no import needed
    "wandb": (WandbTracker, "wandb"),
    "comet": (CometTracker, "comet_ml"),
    "clearml": (ClearmlTracker, "clearml"),
    "dvc": (DvcTracker, "dvclive"),
    "neptune": (NeptuneTracker, "neptune"),
}


def tracker_callbacks(name: str, save_dir: str) -> dict:
    """{hook: fn} for one tracker, {} when its package is unavailable."""
    cls, module = TRACKERS[name]
    if module is not None:
        import importlib.util

        if importlib.util.find_spec(module) is None:
            return {}
    return cls().callbacks(save_dir)
