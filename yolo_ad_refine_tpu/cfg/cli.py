"""Command-line interface.

Parity surface: reference cfg/__init__.py:678 (entrypoint): the `yolo`
console script's `task mode key=value` grammar, special modes, and fuzzy
config merging. Installed as the `yat` console script and runnable as
`python -m yolo_ad_refine_tpu`.

Usage:
    yat detect train data=coco128.yaml model=yolo11n.yaml epochs=3
    yat detect val model=runs/train/weights/best data=coco128.yaml
    yat detect predict model=runs/train/weights/best source=imgs/
    yat cfg | yat version | yat help
"""

from __future__ import annotations

import ast
import sys

from yolo_ad_refine_tpu.utils import DEFAULT_CFG_PATH, LOGGER, yaml_load, yaml_print

TASKS = {"detect", "segment", "pose", "obb", "classify"}
MODES = {"train", "val", "predict", "benchmark", "tune"}

HELP = __doc__


def parse_kv(args: list[str]) -> dict:
    """Parse k=v tokens with literal-eval values."""
    out = {}
    for a in args:
        if "=" not in a:
            raise SystemExit(f"argument '{a}' is not key=value (see `yat help`)")
        k, v = a.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        out[k] = v
    return out


def entrypoint(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("help", "-h", "--help"):
        print(HELP)
        return 0
    if argv[0] == "version":
        from yolo_ad_refine_tpu import __version__

        print(__version__)
        return 0
    if argv[0] == "cfg":
        yaml_print(yaml_load(DEFAULT_CFG_PATH))
        return 0
    if argv[0] == "checks":
        # environment report (reference cfg/__init__.py special mode ->
        # checks.collect_system_info)
        import platform

        import jax

        print(f"python   {platform.python_version()} on {platform.platform()}")
        print(f"jax      {jax.__version__}  backend={jax.default_backend()}")
        print(f"devices  {jax.devices()}")
        from yolo_ad_refine_tpu.ops.native import get_lib, get_loader_lib

        print(f"native ops    {'ok' if get_lib() else 'unavailable'}")
        print(f"native loader {'ok' if get_loader_lib() else 'unavailable'}")
        return 0
    if argv[0] == "settings":
        from yolo_ad_refine_tpu.utils.settings import get_settings

        s = get_settings()
        updates = parse_kv(argv[1:]) if len(argv) > 1 else {}
        if updates.pop("reset", False):
            s.reset()
        if updates:
            s.update(updates)
        for k, v in s.items():
            print(f"{k}: {v}")
        return 0

    task = "detect"
    if argv and argv[0] in TASKS:
        task = argv.pop(0)
    if not argv or argv[0] not in MODES:
        raise SystemExit(f"expected a mode in {sorted(MODES)} (see `yat help`)")
    mode = argv.pop(0)
    overrides = parse_kv(argv)

    from yolo_ad_refine_tpu import YOLO

    model_arg = overrides.pop("model", "yolo11n.yaml")
    imgsz = int(overrides.get("imgsz", 640))
    task = overrides.pop("task", task)  # `yat train task=segment ...` also works
    model = YOLO(model_arg, task=task, imgsz=imgsz)

    if mode == "train":
        results = model.train(task=task, **overrides)
        LOGGER.info(f"results: {results}")
    elif mode == "tune":
        iterations = int(overrides.pop("iterations", 10))
        best = model.tune(iterations=iterations, task=task, **overrides)
        LOGGER.info(f"best hyperparameters: {best}")
    elif mode == "val":
        results = model.val(**overrides)
        LOGGER.info(f"results: {results}")
    elif mode == "predict":
        source = overrides.pop("source", None)
        if source is None:
            raise SystemExit("predict requires source=<path>")
        model.predict(source=source, save=overrides.pop("save", True), **overrides)
    elif mode == "benchmark":
        import subprocess

        return subprocess.call([sys.executable, "bench.py"])
    return 0


if __name__ == "__main__":
    raise SystemExit(entrypoint())
