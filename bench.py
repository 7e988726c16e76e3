"""Benchmark: flagship 640x640 bs=32 inference images/sec/chip + train step.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.

Measurement matches how the reference measures speed: per-image inference ms
from the model forward only (ultralytics/engine/validator.py:161-166,198 and
root val.py:28-60 FPS report), decode included, NMS excluded. bfloat16
compute / float32 params on whatever jax.devices()[0] is (the real TPU chip
under the driver).

vs_baseline is traceable: it is this chip's throughput divided by the torch
reference flagship measured ON RECORD with the reference's own timing
convention (benchmarks/torch_baseline.json, produced by
benchmarks/measure_torch_baseline.py; hardware stated inside). The reference
publishes no absolute FPS (BASELINE.md), so the measured-baseline file is the
only falsifiable anchor available.

Timing note (verify SKILL): outputs of donated executables can report ready
before device completion on the axon tunnel — the train-step loop forces a
host readback of a scalar every iteration.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

IMGSZ = 640
BATCH = 32
WARMUP = 3
ITERS = 10
TRAIN_BATCH = 16
TRAIN_ITERS = 5


def load_torch_baseline() -> dict:
    p = Path(__file__).parent / "benchmarks" / "torch_baseline.json"
    if p.exists():
        return json.loads(p.read_text())
    return {}


def bench_infer(model, variables):
    """Eval forward, chained-truth method: k data-dependent iterations in ONE
    executable (fold sum(y)*0 back into the input) so the axon tunnel cannot
    coalesce identical dispatches (docs/performance.md "How to measure")."""
    x0 = jnp.asarray(
        np.random.default_rng(0).random((BATCH, IMGSZ, IMGSZ, 3), dtype=np.float32),
        dtype=jnp.bfloat16,
    )

    def step(c):
        y, _ = model.apply(variables, x0 + c.astype(x0.dtype) * 0, train=False)
        return jnp.sum(y).astype(jnp.float32) * 1e-12 + c

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run_k(c0, k):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), c0)

    def timed(k):
        t0 = time.perf_counter()
        float(run_k(jnp.float32(1e-6), k))
        return time.perf_counter() - t0

    k = ITERS
    t_compile = time.perf_counter()
    timed(1)
    timed(k)
    print(f"infer compile+warmup {time.perf_counter() - t_compile:.1f}s", file=sys.stderr)
    samples = []
    for _ in range(3):
        t1 = timed(1)
        tk = timed(k)
        samples.append((tk - t1) / (k - 1))
    dt = float(np.median(samples))
    return BATCH / dt, dt / BATCH * 1000


def bench_train_step(model):
    """One full train step (fwd+loss+bwd+SGD+EMA) at bs=16/640.

    Chained-truth method (docs/performance.md): k dependent steps inside ONE
    executable (the params carry forward, so nothing coalesces), timed at
    k=1 vs k=K with a forced readback; the difference cancels dispatch and
    the axon tunnel's ~28 ms/readback RTT that a per-iteration-readback loop
    would add to every step.
    """
    from functools import partial

    from yolo_ad_refine_tpu.train.loss import DetectionLoss
    from yolo_ad_refine_tpu.train.optim import build_optimizer
    from yolo_ad_refine_tpu.train.step import TrainState, make_train_step

    max_boxes = 64
    loss_fn = DetectionLoss(nc=model.nc, strides=model.strides)
    tx, _, _ = build_optimizer(model.variables["params"], lr0=0.01, epochs=100,
                               nb=100, batch=TRAIN_BATCH, nbs=TRAIN_BATCH)
    state = TrainState.create(model.variables, tx)
    from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_train_enabled

    pro_meta = model.prologue_meta if prologue_train_enabled() else None
    tstep = make_train_step(model.graph, loss_fn, tx, prologue_meta=pro_meta,
                            prologue_dtype=jnp.bfloat16)

    r = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(r.integers(0, 255, (TRAIN_BATCH, IMGSZ, IMGSZ, 3)), jnp.uint8),
        "cls": jnp.asarray(r.integers(0, model.nc, (TRAIN_BATCH, max_boxes, 1)), jnp.float32),
        "bboxes": jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0], jnp.float32),
                           (TRAIN_BATCH, max_boxes, 1)),
        "mask": jnp.ones((TRAIN_BATCH, max_boxes, 1), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)

    @partial(jax.jit, static_argnums=1)
    def run_k(s, k):
        def body(i, s):
            s2, _ = tstep(s, batch, jax.random.fold_in(rng, i))
            return s2
        return jax.lax.fori_loop(0, k, body, s)

    def timed(k):
        t0 = time.perf_counter()
        s = run_k(state, k)
        float(jnp.sum(jax.tree.leaves(s.params)[0]))  # forced completion
        return time.perf_counter() - t0

    k = TRAIN_ITERS + 1
    t_compile = time.perf_counter()
    timed(1)
    timed(k)
    print(f"train compile+first {time.perf_counter() - t_compile:.1f}s", file=sys.stderr)
    samples = []
    for _ in range(3):
        t1 = timed(1)
        tk = timed(k)
        samples.append((tk - t1) / (k - 1) * 1000)
    return float(np.median(samples))


def _arm_backend_watchdog(seconds: int = 900):
    """Fail LOUDLY (one parseable JSON line) if device init wedges.

    The axon PJRT plugin's claim leg waits forever (claim_timeout_s=-1); a
    stale claim from a killed process makes ``jax.devices()`` block
    indefinitely. A silent hang leaves the driver with no artifact at all —
    a zero-valued record with an error note is the honest alternative.
    """
    import signal

    def _bail(signum, frame):
        print(json.dumps({
            "metric": "flagship_640_bs32_infer_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": None,
            "extra": {"error": f"device backend init exceeded {seconds}s "
                               "(axon claim wedged?) — no measurement taken"},
        }), flush=True)
        raise SystemExit(3)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(seconds)
    return signal


def main():
    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    sig = _arm_backend_watchdog()
    jax.devices()  # force backend init under the watchdog
    sig.alarm(0)

    t_init = time.perf_counter()
    # init at 256 (params are shape-independent) to avoid a second giant
    # 640px compile just for initialization
    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16,
        imgsz=256,
    )
    print(f"init {time.perf_counter() - t_init:.1f}s", file=sys.stderr)

    ips, ms_img = bench_infer(model, model.variables)
    try:
        train_ms = bench_train_step(model)
    except Exception as e:  # noqa: BLE001 - train bench is best-effort extra signal
        print(f"train-step bench failed: {e}", file=sys.stderr)
        train_ms = None

    base = load_torch_baseline()
    base_ips = float(base.get("images_per_sec", 0.0)) or None
    # MFU: model forward GFLOPs (utils/benchmarks.py model_flops: 12.6 @640)
    # against the v5e bf16 peak. The honest efficiency number — vs_baseline
    # alone compares against a 1-vCPU torch eager run (the only hardware
    # both stacks share on this host) and so vastly overstates the win.
    MODEL_GFLOPS = 12.6
    PEAK_TFLOPS = 197.0
    mfu_pct = ips * MODEL_GFLOPS * 1e9 / (PEAK_TFLOPS * 1e12) * 100.0
    extra = {
        "inference_ms_per_image": round(ms_img, 3),
        "mfu_pct": round(mfu_pct, 2),
        "device": str(jax.devices()[0]),
        "baseline": {
            "images_per_sec": base_ips,
            "framework": base.get("framework"),
            "device": base.get("device"),
            "source": "benchmarks/torch_baseline.json (measured, see "
                      "benchmarks/measure_torch_baseline.py)",
            "note": "this host exposes 1 vCPU, so the measured torch-CPU "
                    "anchor is necessarily single-threaded; vs_baseline "
                    "therefore flatters the TPU — read mfu_pct and "
                    "gpu_context for the real distance to speed-of-light",
        },
        "gpu_context": {
            # public ultralytics model-page numbers for the closest stock
            # model class (YOLO11n 2.6M params / 6.5 GFLOPs): ~1.5 ms/img
            # on T4 TensorRT10. The flagship here is 4.10M params /
            # 12.6 GFLOPs, ~2x the FLOPs.
            "yolo11n_t4_tensorrt_ms_per_image": 1.5,
            "source": "docs.ultralytics.com/models/yolo11 (public table)",
        },
        # The north star (BASELINE.json) is "match A100 img/s on one v5e".
        # No A100 number exists for the flagship anywhere, so this is a
        # derived like-for-like ESTIMATE with its arithmetic shown
        # (full walk-through: docs/performance.md "A100 estimate"):
        #   1. Public A100 TensorRT bs1 latencies (ultralytics YOLOv8
        #      README table): v8n 8.7 GFLOPs @ 0.99 ms, v8s 28.6 GFLOPs
        #      @ 1.20 ms. GFLOPs-interpolating the 12.6-GFLOP flagship:
        #      0.99 + (12.6-8.7)/(28.6-8.7)*(1.20-0.99) = 1.03 ms
        #      -> 970 img/s bs1 for a plain-conv model of this size.
        #   2. Flagship overhead (DCN x3 levels, TSSA attention, ELA):
        #      the reference's own artifacts put flagship TRAIN time at
        #      2.58x the stock yolo11 run (BASELINE.md, same GPU/data);
        #      forward-only overhead is smaller — central 1.5x,
        #      range [1.2, 2.0].
        #   3. bs1 -> bs32: the interpolated bs1 point runs at 3.9% MFU
        #      (12.2 TFLOP/s of 312 peak); batching small models on A100
        #      typically recovers 2-4x — central 3x.
        #   => central 970/1.5*3.0 = 1940 img/s, range ~[970, 3200].
        "a100_estimate": {
            "flagship_bs32_images_per_sec_central": 1940,
            "range": [970, 3200],
            "derivation": "interp(A100 TRT bs1: v8n 8.7GF@0.99ms, v8s "
                          "28.6GF@1.20ms -> 12.6GF@1.03ms = 970 img/s) "
                          "/ 1.5 dcn+attn overhead (ref trains 2.58x "
                          "slower than stock, BASELINE.md) * 3.0 bs32 "
                          "batching gain (bs1 = 3.9% MFU)",
            "gap": round(ips / 1940.0, 3),
        },
    }
    if train_ms is not None:
        extra["train_step_ms_bs16"] = round(train_ms, 1)
        extra["train_images_per_sec"] = round(TRAIN_BATCH / train_ms * 1000, 1)

    print(json.dumps({
        "metric": "flagship_640_bs32_infer_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / base_ips, 3) if base_ips else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
