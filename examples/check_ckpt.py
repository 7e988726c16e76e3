"""Checkpoint introspection (parity surface: reference root check_pt.py —
load a weights file, report its structure and find named modules).

Usage: python examples/check_ckpt.py <run_dir>/weights/best [module-substr]
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "runs/train/exp/weights/best"
    needle = sys.argv[2] if len(sys.argv) > 2 else None

    from yolo_ad_refine_tpu.engine.checkpoint import load_checkpoint

    print(f"loading: {path} ...")
    model = load_checkpoint(path)
    print("\n=== checkpoint loaded ===")
    print(f"task head: {getattr(model.head_spec, 'name', '?')}  "
          f"nc={model.nc}  strides={model.strides}")
    total = 0
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(model.variables["params"])
    for pathk, p in sorted(flat.items()):
        name = "/".join(pathk)
        n = int(np.prod(p.shape))
        total += n
        if needle is None or needle.lower() in name.lower():
            print(f"{name:<70} {str(tuple(p.shape)):<20} {n:>10,}")
    print(f"\ntotal parameters: {total:,}")
    # per-layer module table (the reference walks named_modules)
    print("\nyaml layers:")
    for s in model.specs:
        mark = " <--" if needle and needle.lower() in s.name.lower() else ""
        print(f"  {s.i:>3} {s.name}{mark}")


if __name__ == "__main__":
    main()
