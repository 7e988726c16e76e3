"""YOLO-AD-Refine-TPU: a TPU-native (JAX/XLA/Pallas) object-detection framework.

A from-scratch rebuild of the capabilities of the YOLO-AD-Refine research fork
(an Ultralytics-YOLO11 derivative for small-object / aphid detection), designed
TPU-first:

- NHWC layouts, bfloat16 compute / float32 params on the MXU.
- A yaml-driven model compiler (``models.parser``) that materialises the
  backbone/neck/head graph as a pure ``apply(params, x)`` under ``jax.jit``.
- Fixed-shape (padded) targets, a jit-safe NMS, and a fully batched/masked
  task-aligned assigner so train and eval steps compile once.
- SPMD data parallelism via ``jax.sharding.Mesh`` + ``jax.jit`` shardings
  (see ``parallel``) instead of DDP/NCCL subprocess relaunch.

Public API mirrors the reference's user surface (train11.py / val.py /
detect.py): ``YOLO(cfg_or_ckpt).train(...)/.val(...)/.predict(...)``.
"""

__version__ = "0.1.0"

from yolo_ad_refine_tpu.models.yolo import YOLO  # noqa: E402,F401
from yolo_ad_refine_tpu.models.fastsam import FastSAM  # noqa: E402,F401
from yolo_ad_refine_tpu.models.nas import NAS  # noqa: E402,F401

__all__ = ["YOLO", "__version__"]
