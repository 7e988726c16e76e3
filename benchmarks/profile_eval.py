"""Op-level profile of the flagship eval forward (perfetto trace parse).

Captures a jax.profiler trace of the jitted bs32/640 eval forward and
aggregates device-track op durations into a top-N table. Ground truth for
where the 23 ms actually goes (the section benches bound subgraphs; this
names ops). Writes benchmarks/artifacts/profile_eval_ops.json.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

B, IMGSZ = 32, 640


def main():
    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16, imgsz=256)
    v = model.variables
    x = jnp.asarray(np.random.default_rng(0).random(
        (B, IMGSZ, IMGSZ, 3), np.float32), jnp.bfloat16)

    fwd = jax.jit(lambda xx: model.apply(v, xx, train=False)[0])
    float(jnp.sum(fwd(x).astype(jnp.float32)))  # compile+warm

    log_dir = "/tmp/jaxprof_eval"
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        for _ in range(6):
            y = fwd(x)
        float(jnp.sum(y.astype(jnp.float32)))

    traces = sorted(glob.glob(f"{log_dir}/**/*.json.gz", recursive=True))
    print("trace files:", traces)
    ev_by_op = defaultdict(float)
    n_by_op = defaultdict(int)
    total = 0.0
    for t in traces:
        data = json.loads(gzip.open(t, "rt").read())
        events = data["traceEvents"] if isinstance(data, dict) else data
        # device thread names to include: TensorCore / XLA Op lanes
        for e in events:
            if e.get("ph") != "X":
                continue
            name = e.get("name", "")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            args = e.get("args", {}) or {}
            cat = args.get("group_by", "") or e.get("cat", "")
            tid = str(e.get("tid", ""))
            if "run_id" in args or args.get("device_type") == "TPU":
                pass
            ev_by_op[name] += dur
            n_by_op[name] += 1
            total += dur
    top = sorted(ev_by_op.items(), key=lambda kv: -kv[1])[:60]
    out = {"total_ms_all_tracks": total,
           "top_ops": [{"name": k, "ms": round(ms, 3), "n": n_by_op[k]}
                       for k, ms in top]}
    p = Path("benchmarks/artifacts/profile_eval_ops.json")
    p.write_text(json.dumps(out, indent=1))
    for row in out["top_ops"][:40]:
        print(f"{row['ms']:10.3f} ms  x{row['n']:4d}  {row['name'][:90]}")


if __name__ == "__main__":
    main()
