"""Automatic batch-size selection from XLA compile-time memory analysis.

Capability parity with reference ultralytics/utils/autobatch.py:24-72, which
runs profiling forwards at batches (1,2,4,8,16) and polynomial-fits measured
CUDA memory. The TPU-native version needs no execution at all: XLA knows the
exact peak HBM of a compiled program ahead of time (``compiled
.memory_analysis()``), so we lower the REAL train step at two small batch
sizes, fit the linear model peak(b) = base + slope*b, and pick the largest
power-of-two batch that fits in ``fraction`` of device memory.

Exact, not sampled — XLA's static allocator reports the true high-water mark
including temps/fusions, which runtime polling under-observes.
"""

from __future__ import annotations

import jax

from yolo_ad_refine_tpu.utils import LOGGER

_DEFAULT_LIMIT = 16 * 1024**3  # assume one v5e-class chip when stats are absent


def _program_peak_bytes(fn, args) -> int:
    """Peak device memory of jit(fn)(*args) from AOT compile analysis."""
    mem = jax.jit(fn).lower(*args).compile().memory_analysis()
    if mem is None:  # backend without analysis (e.g. some CPU builds)
        raise RuntimeError("memory_analysis unavailable")
    return int(
        getattr(mem, "temp_size_in_bytes", 0)
        + getattr(mem, "argument_size_in_bytes", 0)
        + getattr(mem, "output_size_in_bytes", 0)
    )


def device_memory_limit(device=None) -> int:
    """Usable bytes on the accelerator (bytes_limit when exposed)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
        return int(stats.get("bytes_limit") or _DEFAULT_LIMIT)
    except Exception:  # noqa: BLE001 - CPU/interpret backends
        return _DEFAULT_LIMIT


def autobatch(program_for_batch, fraction: float = 0.60, max_batch: int = 1024,
              device=None) -> int:
    """Pick the largest power-of-two batch fitting in fraction * device HBM.

    Args:
        program_for_batch: b -> (fn, example_args) for the real train/eval
            step at batch b; args may be jax.ShapeDtypeStruct pytrees (no
            data needed — only shapes are compiled).
        fraction: target memory utilization (reference default 0.60).
    """
    limit = device_memory_limit(device)
    try:
        p1 = _program_peak_bytes(*_split(program_for_batch(1)))
        p2 = _program_peak_bytes(*_split(program_for_batch(2)))
    except Exception as e:  # noqa: BLE001
        LOGGER.warning(f"autobatch: memory analysis failed ({e}); using batch=16")
        return 16
    slope = max(p2 - p1, 1)
    base = max(p1 - slope, 0)
    budget = fraction * limit
    b = 1
    while b * 2 <= max_batch and base + slope * (b * 2) <= budget:
        b *= 2
    LOGGER.info(
        f"autobatch: base {base / 1e9:.2f} GB + {slope / 1e6:.1f} MB/img, "
        f"limit {limit / 1e9:.1f} GB x {fraction:.0%} -> batch {b}"
    )
    return b


def _split(ret):
    fn, args = ret
    return fn, tuple(args)
