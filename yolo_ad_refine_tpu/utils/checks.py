"""Runtime checks.

Parity surface: reference utils/checks.py — check_amp:651 (numerical canary
that disables mixed precision when fp16 outputs diverge from fp32),
check_imgsz:132 (stride-multiple rounding), check_version:244. The reference
canary runs yolo11n fp32-vs-AMP on a sample image and compares boxes; here
the model's own graph is traced once in fp32 and once in the training compute
dtype (bf16) on a small input and the decoded outputs are compared —
divergence means the architecture is numerically unsafe in bf16 and the
trainer falls back to fp32.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.utils import LOGGER, colorstr


def check_imgsz(imgsz: int, stride: int = 32, min_dim: int = 0, floor: int = 0) -> int:
    """Round imgsz up to a stride multiple (reference checks.py:132)."""
    sz = max(int(np.ceil(imgsz / stride) * stride), floor)
    if sz != imgsz:
        LOGGER.warning(f"imgsz={imgsz} must be a multiple of stride {stride}; "
                       f"updating to {sz}")
    del min_dim
    return sz


def check_version(current: str, required: str = "") -> bool:
    """Loose version comparison (reference checks.py:244 simplified)."""
    if not required:
        return True
    def parse(v):
        return tuple(int(x) for x in v.strip("<>=!, ").split(".") if x.isdigit())
    op = "".join(c for c in required if c in "<>=!")
    want = parse(required)
    cur = parse(current)
    return {
        ">=": cur >= want, ">": cur > want, "<=": cur <= want,
        "<": cur < want, "==": cur == want, "!=": cur != want, "": cur >= want,
    }[op or ">="]


def check_amp(model, imgsz: int = 256, atol: float = 0.5) -> bool:
    """bf16-vs-fp32 canary (reference checks.py:651-720 check_amp).

    Builds an fp32 clone of the model graph, runs both on the same random
    image, and compares decoded outputs (boxes px + class probabilities).
    Returns True when bf16 is safe. The reference broadcasts the rank-0
    verdict under DDP; under SPMD every host computes the same answer.
    """
    if model.dtype == jnp.float32:
        return True
    try:
        from yolo_ad_refine_tpu.models.model import DetectionModel

        fp32 = DetectionModel(model.yaml, nc=model.nc, dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).random((1, imgsz, imgsz, 3)),
                        jnp.float32)
        vars_f32 = jax.tree.map(lambda v: v.astype(v.dtype), model.variables)
        y32 = jax.jit(lambda v, x: fp32.graph.apply(v, x, train=False)[0])(vars_f32, x)
        y16 = jax.jit(lambda v, x: model.graph.apply(v, x, train=False)[0])(
            model.variables, x.astype(model.dtype)
        )
        if isinstance(y32, dict):  # v10: {'one2one': ...}
            y32, y16 = y32["one2one"], y16["one2one"]
        y32 = np.asarray(y32, np.float32)
        y16 = np.asarray(y16, np.float32)
        # class probabilities within atol; boxes within ~2px at this scale
        probs_ok = np.abs(y32[..., 4:] - y16[..., 4:]).max() < atol
        boxes_ok = np.abs(y32[..., :4] - y16[..., :4]).max() < imgsz * 0.02
        ok = bool(probs_ok and boxes_ok)
        if not ok:
            LOGGER.warning(
                f"{colorstr('AMP:')} bf16 canary FAILED "
                f"(dprob {np.abs(y32[..., 4:] - y16[..., 4:]).max():.3f}, "
                f"dbox {np.abs(y32[..., :4] - y16[..., :4]).max():.1f}px) — "
                f"falling back to float32 training"
            )
        else:
            LOGGER.info(f"{colorstr('AMP:')} bf16 canary passed ✅")
        return ok
    except Exception as e:  # noqa: BLE001 - canary must not block training
        LOGGER.warning(f"{colorstr('AMP:')} canary errored ({e}); keeping bf16")
        return True
