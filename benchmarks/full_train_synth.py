"""Full-facade convergence proof on the flagship path (VERDICT r3 item 5).

Drives the REAL user surface — YOLO(flagship yaml).train() — i.e. the
composed loop the reference runs (engine/trainer.py:323-479): mosaic data
pipeline -> TAL/Slide/NWD loss -> EMA -> per-epoch val -> fitness/best
checkpoint selection -> mid-run resume — on the deterministic synthetic
shapes set (yolo_ad_refine_tpu/data/synthetic.py), to a nontrivial mAP50.
The individually-verified pieces (grad parity, loss parity, full-val
parity) are elsewhere; THIS proves their composition over epochs learns.

Two-phase on purpose: phase 1 trains to epoch k then stops (simulated
interruption); phase 2 passes resume=<last ckpt> and continues to the end
— exercising the reference's resume contract (trainer.py:686-744) inside
the proof run instead of a separate toy test.

Artifacts (results.csv, results.png, summary.json) are copied to
benchmarks/artifacts/full_train_synth/ for check-in.

Usage: python benchmarks/full_train_synth.py [--epochs 40] [--imgsz 320]
       [--quick]   (tiny settings, CI smoke)
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--break-at", type=int, default=None,
                    help="stop after this epoch, then resume (default: epochs//2)")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--n-val", type=int, default=48)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="runs/full_train_synth")
    args = ap.parse_args()
    if args.quick:
        args.epochs, args.imgsz, args.n_train, args.n_val = 3, 96, 24, 8

    import jax
    import jax.numpy as jnp

    from yolo_ad_refine_tpu.data.synthetic import make_shapes_dataset
    from yolo_ad_refine_tpu.models.yolo import YOLO
    from yolo_ad_refine_tpu.utils import LOGGER

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    root = Path(args.out)
    data = make_shapes_dataset(root / "data", n_train=args.n_train,
                               n_val=args.n_val, imgsz=args.imgsz)
    LOGGER.info(f"synthetic shapes set at {root/'data'} "
                f"({args.n_train} train / {args.n_val} val @ {args.imgsz})")

    break_at = args.break_at if args.break_at is not None else args.epochs // 2
    common = dict(
        data=data, imgsz=args.imgsz, batch=args.batch, max_boxes=16,
        project=str(root), exist_ok=True, name="flagship",
        optimizer="SGD", lr0=0.01, lrf=0.01, close_mosaic=max(1, args.epochs // 4),
        patience=args.epochs + 1, plots=True, seed=0,
    )

    t0 = time.time()
    model = YOLO("yolo11-701-YOLO-AD-Refine.yaml", nc=3, dtype=dtype,
                 imgsz=args.imgsz)
    # phase 1: train to the break point (simulated interruption)
    model.train(epochs=break_at, **common)
    LOGGER.info(f"phase 1 (epochs 0-{break_at - 1}) done at "
                f"{time.time() - t0:.0f}s — resuming to {args.epochs}")

    # phase 2: resume from last.ckpt, continue to the real horizon.
    last = Path(root) / "flagship" / "weights" / "last"
    model2 = YOLO("yolo11-701-YOLO-AD-Refine.yaml", nc=3, dtype=dtype,
                  imgsz=args.imgsz)
    results = model2.train(epochs=args.epochs, resume=str(last), **common)
    wall = time.time() - t0

    save_dir = Path(results["save_dir"])
    summary = {
        "best_fitness": results["best_fitness"],
        "mAP50": results.get("metrics/mAP50(B)"),
        "mAP50_95": results.get("metrics/mAP50-95(B)"),
        "precision": results.get("metrics/precision(B)"),
        "recall": results.get("metrics/recall(B)"),
        "epochs": args.epochs,
        "resumed_at_epoch": break_at,
        "imgsz": args.imgsz,
        "n_train": args.n_train,
        "n_val": args.n_val,
        "wall_s": round(wall, 1),
        "device": str(jax.devices()[0]),
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "model": "yolo11-701-YOLO-AD-Refine.yaml (n scale), nc=3",
    }
    art = Path(__file__).parent / "artifacts" / "full_train_synth"
    art.mkdir(parents=True, exist_ok=True)
    for f in ("results.csv", "results.png", "args.yaml"):
        if (save_dir / f).exists():
            shutil.copy(save_dir / f, art / f)
    (art / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    if not args.quick and (summary["mAP50"] or 0) < 0.5:
        print("FAIL: mAP50 below 0.5", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
