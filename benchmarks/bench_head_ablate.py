"""Intra-head backward attribution by ablation (round-5).

bench_bwd_sections puts the AYHead at 17.2 ms fwd+vjp (bs16/640) of the
43 ms train step, with the DCN kernels explaining only ~8.5 ms — this
locates the rest by ablating one sub-module family at a time (patched to
identity/plain equivalents, fresh init per variant — cost model only, not
semantics) and re-measuring the full head fwd+vjp:

  none        the real head (baseline)
  no_dcn      DyDCNv2 -> plain 3x3 conv + GN
  no_coord    CoordAtt -> identity
  no_decomp   TaskDecomposition -> 1x1 ConvGN
  no_cross    CrossTaskInteraction -> pass-through
  no_gn       ConvGN/GN -> conv only (BN-free head cost)
  no_rep      ResidualBlockGN -> identity

Usage: python benchmarks/bench_head_ablate.py [--which none,no_dcn,...]
Writes benchmarks/artifacts/head_ablate.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

os.environ.setdefault("YAT_DCN_IMPL", "mxu2")

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, str(Path(__file__).parent.parent))

B, IMGSZ = 16, 640


def consume(tree):
    return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(tree))


def chained(fn, label, k=8):
    @partial(jax.jit, static_argnums=1)
    def run(c0, kk):
        return jax.lax.fori_loop(0, kk, lambda i, c: fn(c) * 1e-12 + c, c0)

    t0 = time.perf_counter()
    float(run(jnp.float32(0.0), 1))
    float(run(jnp.float32(0.0), k))
    print(f"  [{label}] compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t1 = time.perf_counter(); float(run(jnp.float32(1e-6), 1)); d1 = time.perf_counter() - t1
        t1 = time.perf_counter(); float(run(jnp.float32(1e-6), k)); dk = time.perf_counter() - t1
        ts.append((dk - d1) / (k - 1) * 1000)
    ms = float(np.median(ts))
    print(f"[{label}] {ms:.3f} ms", flush=True)
    return ms


_ORIG = {}


def measure_variant(name, H, ch, feats, rng, mode="train"):
    # restore any previously patched attributes (reload() would re-run the
    # @register decorators and crash on duplicates)
    for k, v_ in _ORIG.items():
        setattr(H, k, v_)

    def patch(attr, repl):
        _ORIG.setdefault(attr, getattr(H, attr))
        setattr(H, attr, repl)

    Dtype = jnp.bfloat16

    class _Id(nn.Module):
        c2: int = 0
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, *a, **k):
            return x

    if name == "no_dcn":
        class _PlainDCN(nn.Module):
            out_channels: int
            radius: float = 3.0
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, x, offset, mask, train=False):
                w = self.param("weight", nn.initializers.normal(0.02),
                               (3, 3, x.shape[-1], self.out_channels), jnp.float32)
                y = jax.lax.conv_general_dilated(
                    x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return nn.GroupNorm(num_groups=16, epsilon=1e-5,
                                    dtype=self.dtype, name="gn")(y)
        patch("DyDCNv2", _PlainDCN)
    elif name == "no_coord":
        patch("CoordAtt", _Id)
    elif name == "no_rep":
        patch("ResidualBlockGN", _Id)
    elif name == "no_decomp":
        class _SimpleDecomp(nn.Module):
            c2: int
            stacked: int = 1
            la: int = 16
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, feat, avg, train=False):
                return H.ConvGN(self.c2, 1, dtype=self.dtype,
                                name="reduce")(feat, train)
        patch("TaskDecomposition", _SimpleDecomp)
    elif name == "no_cross":
        class _NoCross(nn.Module):
            c2: int
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, a, b, train=False):
                return a, b
        patch("CrossTaskInteraction", _NoCross)
    elif name == "no_gn":
        from yolo_ad_refine_tpu.nn.common import conv2d as _c2d

        class _ConvNoGN(nn.Module):
            c2: int
            k: int = 1
            s: int = 1
            act: bool = True
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, x, train=False):
                y = _c2d(x, self.c2, self.k, s=self.s,
                         p=self.k // 2 if self.k > 1 else 0,
                         dtype=self.dtype, name="conv")
                return nn.silu(y) if self.act else y
        patch("ConvGN", _ConvNoGN)

    hmod = H.AYHead(nc=3, ch=ch, dtype=Dtype)
    try:
        v = hmod.init(rng, feats, train=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] init FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None

    if mode == "eval":
        def ev(c):
            xs = [t + c.astype(t.dtype) * 0 for t in feats]
            vv = {"params": v["params"],
                  "batch_stats": v.get("batch_stats", {})}
            y, _ = hmod.apply(vv, xs, train=False, input_h=IMGSZ)
            return jnp.sum(y).astype(jnp.float32)

        return chained(ev, f"{name} eval-fwd")

    def f(vv, xs):
        return hmod.apply(vv, list(xs), train=True,
                          mutable=["batch_stats", "diagnostics"])[0]

    def both(c):
        xs = tuple(t + c.astype(t.dtype) * 0 for t in feats)
        val, g = jax.value_and_grad(
            lambda vv, xx: consume(f(vv, xx)), argnums=(0, 1))(
                {"params": v["params"]}, xs)
        return val + consume(g)

    return chained(both, f"{name} fwd+vjp")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which",
                    default="none,no_dcn,no_coord,no_decomp,no_cross,no_gn,no_rep")
    ap.add_argument("--mode", default="train", choices=("train", "eval"))
    ap.add_argument("--batch", type=int, default=0)
    args = ap.parse_args()
    global B
    if args.batch:
        B = args.batch

    import yolo_ad_refine_tpu.nn.head as H
    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.utils import ROOT

    model = build_detection_model(
        str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
        dtype=jnp.bfloat16, imgsz=256)
    ch = tuple(model.head_spec.module.ch)
    print("head ch:", ch, flush=True)
    r = np.random.default_rng(0)
    feats = tuple(
        jnp.asarray(r.random((B, IMGSZ // s, IMGSZ // s, c), np.float32),
                    jnp.bfloat16)
        for s, c in zip((8, 16, 32), ch))
    rng = jax.random.PRNGKey(0)

    results = {}
    tag = "" if args.mode == "train" else f"_eval_bs{B}"
    for name in args.which.split(","):
        ms = measure_variant(name, H, ch, feats, rng, mode=args.mode)
        if ms is not None:
            results[name + tag] = ms

    out = {"device": str(jax.devices()[0]), "batch": B, "imgsz": IMGSZ,
           "results": results}
    p = Path("benchmarks/artifacts/head_ablate.json")
    p.parent.mkdir(parents=True, exist_ok=True)
    if p.exists():
        old = json.loads(p.read_text())
        out["results"] = {**old.get("results", {}), **results}
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
