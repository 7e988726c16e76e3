"""Runtime utilities: logging, yaml IO, timers, misc helpers.

Capability parity with the reference's ``ultralytics/utils/__init__.py``
(LOGGER, yaml_load/yaml_save, colorstr, Profile) rebuilt for a JAX runtime:
the Profile timer blocks on device arrays instead of cuda.synchronize.
"""

from __future__ import annotations

import logging
import os
import re
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import yaml

RANK = int(os.getenv("RANK", -1))
ROOT = Path(__file__).resolve().parents[1]  # package root
DEFAULT_CFG_PATH = ROOT / "cfg" / "default.yaml"
NUM_THREADS = min(8, max(1, os.cpu_count() - 1))


def _enable_jax_compilation_cache() -> None:
    """Persist XLA compilations across processes (big win for CPU test runs
    and repeated TPU sessions; XLA compiles of the full detector graph can
    take minutes on the CPU backend)."""
    try:
        import jax

        if os.environ.get("YAT_FORCE_CPU") == "1":
            # the container's sitecustomize force-registers the axon TPU
            # backend and overrides JAX_PLATFORMS; this is the reliable
            # escape hatch for CPU-only work (tests, debugging).
            jax.config.update("jax_platforms", "cpu")

        # Key the cache dir on XLA_FLAGS: AOT entries record the compile
        # host's machine features, and the virtual-device test environment
        # (--xla_force_host_platform_device_count) compiles with different
        # CPU feature flags than plain runs — sharing one dir makes the
        # loader warn about SIGILL-risk feature mismatches on every entry.
        import hashlib

        tag = hashlib.sha1(os.environ.get("XLA_FLAGS", "").encode()).hexdigest()[:8]
        cache_dir = os.environ.get(
            "YAT_JAX_CACHE",
            os.path.expanduser(f"~/.cache/yolo_ad_refine_tpu/jax-{tag}"),
        )
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        # Seed from the shipped warm-cache artifact (docs/performance.md
        # "Compile hygiene"): cold TPU compiles of the full bench graphs run
        # ~10-20 min on a fresh machine (BENCH_r03 paid 1218 s); cache keys
        # are content-addressed (HLO + jax version + compile options), so
        # entries compiled on one host load on another with the same jax/
        # libtpu. Copy any repo-shipped entries not already present.
        seed = ROOT.parent / "benchmarks" / "warm_cache"
        if seed.is_dir():
            import shutil

            for f in seed.iterdir():
                dst = Path(cache_dir) / f.name
                if f.is_file() and not dst.exists():
                    try:
                        shutil.copy2(f, dst)
                    except OSError:
                        break
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_jax_compilation_cache()


def _make_logger(name: str = "yolo_ad_refine_tpu", verbose: bool = True) -> logging.Logger:
    level = logging.INFO if verbose and RANK in {-1, 0} else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        logger.addHandler(handler)
    logger.propagate = False
    return logger


LOGGER = _make_logger()


def emojis(string: str = "") -> str:
    """Return a platform-safe version of a string (no-op on linux)."""
    return string


def colorstr(*input):  # noqa: A002
    """Colorize a string with ANSI escape codes, e.g. colorstr('blue', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def yaml_load(file: str | Path, append_filename: bool = False) -> dict:
    """Load a yaml file to dict; optionally record the source path."""
    path = Path(file)
    with open(path, errors="ignore", encoding="utf-8") as f:
        s = f.read()
        if not s.isprintable():
            s = re.sub(r"[^\x09\x0A\x0D\x20-\x7E\x85\xA0-퟿-�\U00010000-\U0010ffff]+", "", s)
        data = yaml.safe_load(s) or {}
        if append_filename:
            data["yaml_file"] = str(path)
        return data


def yaml_save(file: str | Path, data: dict | None = None, header: str = "") -> None:
    """Save a dict to yaml, converting paths and numpy scalars to builtins."""
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    clean = {}
    for k, v in (data or {}).items():
        if isinstance(v, Path):
            v = str(v)
        elif isinstance(v, np.generic):
            v = v.item()
        clean[k] = v
    with open(file, "w", errors="ignore", encoding="utf-8") as f:
        if header:
            f.write(header)
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


def yaml_print(data: dict | str | Path) -> None:
    """Pretty-print a yaml dict or file."""
    d = yaml_load(data) if isinstance(data, (str, Path)) else data
    LOGGER.info(yaml.dump(d, sort_keys=False, allow_unicode=True))


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that supports iteration and dict conversion (cfg object)."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


class Profile:
    """Timing context manager / decorator.

    JAX analogue of the reference ``Profile`` (ultralytics/utils/ops.py:17):
    instead of torch.cuda.synchronize we block on device arrays passed to
    ``sync`` or rely on the caller to block_until_ready.
    """

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt

    def __str__(self):
        return f"Elapsed time is {self.t} s"


class TryExcept:
    """Context manager / decorator that logs exceptions instead of raising."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __call__(self, func):
        def wrapper(*args, **kwargs):
            with self:
                return func(*args, **kwargs)

        return wrapper

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """Increment a run path, e.g. runs/train/exp -> runs/train/exp2."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path
