"""YOLO user facade (reference engine/model.py:29 Model + models/yolo/model.py YOLO).

Mirrors the reference's user surface: YOLO(cfg_or_ckpt).train/val/predict.
Train/val/predict wiring lands with the engine layer; model building and
forward inference are live now.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp

from yolo_ad_refine_tpu.models.model import DetectionModel, build_detection_model
from yolo_ad_refine_tpu.utils import LOGGER, ROOT


def _resolve_cfg(model: str | Path) -> Path:
    """Find a model yaml by name: absolute path, cwd, or bundled cfg/models."""
    import re

    p = Path(model)
    if p.exists():
        return p
    unified_name = re.sub(r"(\d+)([nslmx])(.*)\.", r"\1\3.", p.name)
    for name in (p.name, unified_name):
        bundled = ROOT / "cfg" / "models" / name
        if bundled.exists():
            return Path(model) if name == p.name and p.exists() else bundled
    raise FileNotFoundError(f"model cfg '{model}' not found (looked in cwd and {ROOT / 'cfg' / 'models'})")


class YOLO:
    """User-facing model facade."""

    def __init__(self, model: str | Path = "yolo11n.yaml", task: str = "detect",
                 nc: int | None = None, dtype=jnp.float32, seed: int = 0, imgsz: int = 640,
                 verbose: bool = False):
        self.task = task
        self.ckpt_path = None
        model = str(model)
        if model.endswith((".yaml", ".yml")):
            from yolo_ad_refine_tpu.models.parser import guess_model_scale, load_model_cfg

            cfg = load_model_cfg(_resolve_cfg(model))
            if not cfg.get("scale") and guess_model_scale(model):
                cfg["scale"] = guess_model_scale(model)
            self.model: DetectionModel = build_detection_model(
                cfg, nc=nc, dtype=dtype, seed=seed, imgsz=imgsz, verbose=verbose
            )
        else:
            # checkpoint load path (orbax) — wired in engine.trainer
            from yolo_ad_refine_tpu.engine.checkpoint import load_checkpoint

            self.model, self.ckpt_path = load_checkpoint(model, dtype=dtype), model
        self.overrides = {"model": model, "task": task}

    # -- user surface (engine wiring) ---------------------------------------
    def train(self, **kwargs):
        from yolo_ad_refine_tpu.train.trainer import DetectionTrainer

        overrides = {**self.overrides, **kwargs, "mode": "train"}
        trainer = DetectionTrainer(overrides=overrides, model=self.model)
        results = trainer.train()
        self.model = trainer.model
        return results

    def val(self, **kwargs):
        from yolo_ad_refine_tpu.engine.validator import DetectionValidator

        overrides = {**self.overrides, **kwargs, "mode": "val"}
        validator = DetectionValidator(args=overrides)
        return validator(model=self.model)

    def predict(self, source=None, **kwargs):
        from yolo_ad_refine_tpu.engine.predictor import DetectionPredictor

        overrides = {**self.overrides, **kwargs, "mode": "predict"}
        predictor = DetectionPredictor(overrides=overrides)
        return predictor(source=source, model=self.model)

    def track(self, source=None, tracker: str = "bytetrack", **kwargs):
        from yolo_ad_refine_tpu.engine.track import track as _track

        return _track(self.model, source, tracker=tracker, **kwargs)

    def export(self, format: str = "stablehlo", imgsz: int = 640, batch: int = 1,  # noqa: A002
               half: bool = True, path: str | None = None):
        from yolo_ad_refine_tpu.engine.exporter import Exporter

        exporter = Exporter(self.model, imgsz=imgsz, batch=batch, half=half)
        return exporter(format, path or f"model_{format}")

    def tune(self, iterations: int = 10, space: dict | None = None, **kwargs):
        """Hyperparameter evolution (reference engine/model.py:811 Model.tune ->
        engine/tuner.py Tuner). Returns the best hyperparameter dict; artifacts
        (tune_results.csv, best_hyperparameters.yaml, best weights) land in
        <project>/tune*/."""
        from yolo_ad_refine_tpu.engine.tuner import Tuner

        overrides = {**self.overrides, **kwargs, "mode": "train"}
        tuner = Tuner(overrides, space=space)
        # fresh params per iteration so runs are independent
        model_cfg = self.model.yaml
        nc = self.model.nc
        dtype = self.model.dtype
        imgsz = int(overrides.get("imgsz", 640))

        def factory():
            return build_detection_model(model_cfg, nc=nc, dtype=dtype, imgsz=imgsz)

        return tuner(factory, iterations=iterations)

    def benchmark(self, **kwargs):
        """Format-matrix benchmark (reference utils/benchmarks.py:49)."""
        from yolo_ad_refine_tpu.utils.benchmarks import benchmark as _benchmark

        return _benchmark(self, **kwargs)

    def set_classes(self, names: list, text_embeddings=None):
        """Open-vocabulary class setup for WorldDetect models (reference
        YOLOWorld.set_classes). The reference encodes `names` with CLIP; CLIP
        weights cannot be fetched in this zero-egress build, so without an
        explicit `text_embeddings` (len(names), embed) the names are encoded
        by the deterministic offline hashed-n-gram encoder (utils/text.py) —
        functional, but without CLIP's zero-shot semantics."""
        import numpy as np

        if getattr(self.model.head_spec, "name", "") != "WorldDetect":
            raise ValueError("set_classes requires a WorldDetect (yolo-world) model")
        self.model.names = dict(enumerate(names))
        if text_embeddings is not None:
            t = np.asarray(text_embeddings, np.float32)
            assert t.ndim == 2 and t.shape[0] == len(names), t.shape
        else:
            from yolo_ad_refine_tpu.utils.text import encode_class_names

            embed = int(getattr(self.model.head_spec.module, "embed", 512) or 512)
            t = encode_class_names([str(n) for n in names], embed)
            LOGGER.warning("set_classes without text_embeddings: using the "
                           "offline hashed-n-gram text encoder (no CLIP in "
                           "this zero-egress build; zero-shot semantics are "
                           "degraded — pass CLIP embeddings for parity)")
        self.model.text_feats = t
        return self

    def info(self):
        return self.model.info()

    def __call__(self, source=None, **kwargs):
        return self.predict(source, **kwargs)
