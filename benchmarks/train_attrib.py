"""Train-step cost attribution: DCN kernel share vs plain-conv body share.

Measures the FULL train step (bench.py methodology: k-step fori_loop,
k=1 vs k=6, forced readback) under three graphs:

  shipping   YAT_DCN_IMPL=mxu2 (the real model)
  plainconv  DyDCNv2's deformable sampling monkeypatched to a plain 3x3
             conv (offsets/mask ignored) — NOT semantically valid, purely
             a cost model: shipping - plainconv = in-step cost of the DCN
             kernel fwd+bwd over all three levels
  fwdonly    forward + loss only (no grad/optimizer/EMA), shipping DCN

Usage: python benchmarks/train_attrib.py [shipping|plainconv|fwdonly ...]
(default: all three, serially, one process)
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

os.environ.setdefault("YAT_DCN_IMPL", "mxu2")

import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))

B, IMGSZ, MAXB = 16, 640, 64


def build():
    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    return build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16, imgsz=256)


def make_batch(model):
    r = np.random.default_rng(0)
    return {
        "img": jnp.asarray(r.integers(0, 255, (B, IMGSZ, IMGSZ, 3)), jnp.uint8),
        "cls": jnp.asarray(r.integers(0, model.nc, (B, MAXB, 1)), jnp.float32),
        "bboxes": jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0], jnp.float32), (B, MAXB, 1)),
        "mask": jnp.ones((B, MAXB, 1), jnp.float32),
    }


def measure_step(label, model, fwd_only=False, iters=5):
    from yolo_ad_refine_tpu.train.loss import DetectionLoss
    from yolo_ad_refine_tpu.train.optim import build_optimizer
    from yolo_ad_refine_tpu.train.step import TrainState, make_train_step

    loss_fn = DetectionLoss(nc=model.nc, strides=model.strides)
    batch = make_batch(model)
    rng = jax.random.PRNGKey(0)

    if fwd_only:
        vars0 = model.variables

        def one(c):
            img = batch["img"].astype(jnp.bfloat16) / 255.0 + c.astype(jnp.bfloat16) * 0
            feats, _ = model.graph.apply(vars0, img, train=True, mutable=["batch_stats"])
            return loss_fn(feats, batch["cls"], batch["bboxes"], batch["mask"]).total.astype(jnp.float32) * 1e-12 + c

        @partial(jax.jit, static_argnums=1)
        def run_k(c0, k):
            return jax.lax.fori_loop(0, k, lambda i, c: one(c), c0)

        def timed(k):
            t0 = time.perf_counter()
            float(run_k(jnp.float32(1e-6), k))
            return time.perf_counter() - t0
    else:
        tx, _, _ = build_optimizer(model.variables["params"], lr0=0.01, epochs=100,
                                   nb=100, batch=B, nbs=B)
        state = TrainState.create(model.variables, tx)
        from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_train_enabled

        pro_meta = model.prologue_meta if prologue_train_enabled() else None
        tstep = make_train_step(model.graph, loss_fn, tx,
                                prologue_meta=pro_meta,
                                prologue_dtype=jnp.bfloat16)

        @partial(jax.jit, static_argnums=1)
        def run_k(s, k):
            def body(i, s):
                s2, _ = tstep(s, batch, jax.random.fold_in(rng, i))
                return s2
            return jax.lax.fori_loop(0, k, body, s)

        def timed(k):
            t0 = time.perf_counter()
            s = run_k(state, k)
            float(jnp.sum(jax.tree.leaves(s.params)[0]))
            return time.perf_counter() - t0

    k = iters + 1
    t0 = time.perf_counter()
    timed(1)
    timed(k)
    print(f"  [{label}] compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    samples = []
    for _ in range(3):
        t1 = timed(1)
        tk = timed(k)
        samples.append((tk - t1) / (k - 1) * 1000)
    ms = float(np.median(samples))
    print(f"[{label}] {ms:.1f} ms/step", flush=True)
    return ms


def patch_plain_conv():
    import yolo_ad_refine_tpu.ops.deform_mxu2 as m

    def plain(x, offset, mask, weight, radius=3):
        # uniform dtype end to end: a f32 preferred_element_type leaves a f32
        # cotangent meeting the bf16 x in the conv transpose rule (dtype error)
        return jax.lax.conv_general_dilated(
            x, weight.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    m.modulated_deform_conv2d_mxu2 = plain


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "shipping", "plainconv", "fwdonly"]
    for w in which:
        if w == "plainconv":
            patch_plain_conv()
        model = build()
        measure_step(w, model, fwd_only=(w == "fwdonly"))
        if w == "plainconv":
            import importlib
            import yolo_ad_refine_tpu.ops.deform_mxu2 as m
            importlib.reload(m)


if __name__ == "__main__":
    main()
