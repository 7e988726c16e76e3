"""Executable detection graph + task-model wrapper.

Parity surface: reference ultralytics/nn/tasks.py BaseModel._predict_once
(tasks.py:141-168, savelist feature routing) and DetectionModel:309-398
(stride derivation, init). TPU-first differences:

- The layer loop is unrolled at trace time into one XLA program; the
  savelist becomes a dict of intermediates kept only as long as needed.
- Strides are derived statically from input/feature shapes at trace time
  (input_h / feat_h), replacing the reference's runtime dummy-forward probe
  (tasks.py:335-349) and AYHead's hardcoded [8,16,32] fallback.
- Train/eval head contract is the reference's: train -> per-level feats,
  eval -> (decoded, feats).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_ad_refine_tpu.models.parser import LayerSpec, load_model_cfg, parse_model_yaml
from yolo_ad_refine_tpu.utils import LOGGER


def _require_text(txt, mname):
    if txt is None:
        raise ValueError(
            f"{mname} needs text embeddings: call set_classes(names) on the "
            "YOLO facade (offline hashed-n-gram encoder) or pass text_feats")
    return txt


class DetectionGraph(nn.Module):
    """Flax module executing the compiled yaml layer list with feature routing.

    ``modules`` is a flat tuple of submodules (adopted by linen); ``froms``/
    ``save``/``head_idx`` are static routing metadata from the parser.
    """

    modules: tuple            # tuple[nn.Module], one per yaml row
    froms: tuple              # per-layer 'from' (int or tuple of ints)
    save: tuple               # layer indices whose outputs are reused later
    head_idx: int             # index of the detection head layer (-1 if none)
    nc: int
    reg_max: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False, dn: dict | None = None,
                 text_feats=None, start_at: int = 0, full_input_h: int | None = None,
                 stop_at_head: bool = False, stop_at: int | None = None,
                 resume_ys: dict | None = None):
        # dn: optional contrastive-denoising group routed to an RTDETRDecoder
        # head (train/rtdetr.py make_cdn_group); text_feats: optional (nc,
        # embed) class text embeddings routed to a WorldDetect head (the
        # reference uses CLIP, unavailable offline — set_classes falls back
        # to the deterministic hashed-n-gram encoder in utils/text.py, or
        # callers pass embeddings from any encoder). Both kwargs are ignored
        # by every other head.
        # start_at > 0: x is the output of row start_at-1 (a fused prologue —
        # ops/s2d_stem.py — already computed rows [0, start_at)); full_input_h
        # then carries the true image height for head stride derivation.
        input_h = full_input_h if full_input_h is not None else x.shape[1]
        # full per-layer output list: 'from' may be absolute (savelist) or
        # negative-relative (e.g. [-1, -2] in z-yaml ablations) — exactly the
        # reference's y-list routing (tasks.py:141-168). Entries not in the
        # savelist are dropped to None so XLA frees them.
        # stop_at=N: run rows [start_at, N) and return (out, saved-ys dict) —
        # the counterpart resume_ys={row: tensor} seeds the savelist so a
        # later call can continue at start_at=N (section attribution benches).
        ys: list[Any] = [None] * start_at
        if start_at > 0 and (start_at - 1) in self.save:
            ys[start_at - 1] = x
        if resume_ys:
            for j, t in resume_ys.items():
                ys[int(j)] = t
        out = x
        # running text stream for YOLO-World graphs: C2fAttn consumes it as
        # guide, ImagePoolingAttn refines it, WorldDetect scores against the
        # ORIGINAL embeddings (reference tasks.py:657-669 ori_txt_feats).
        # The stream is batched (B, nc, embed) like the reference's repeat;
        # the head contract stays (nc, embed).
        txt = text_feats
        if txt is not None and txt.ndim == 2:
            txt = jnp.broadcast_to(txt[None], (x.shape[0],) + txt.shape)
        for i, (m, f) in enumerate(zip(self.modules, self.froms)):
            if i < start_at:
                continue
            if stop_at is not None and i >= stop_at:
                return out, {j: ys[j] for j in self.save if j < stop_at
                             and ys[j] is not None}

            def fetch(j, i=i):
                return out if j == -1 else ys[j % i]  # j % i absolutizes negatives

            if i == self.head_idx:
                if isinstance(f, int):  # single-input head (Classify)
                    return m(fetch(f), train=train, input_h=input_h)
                feats = [fetch(j) for j in f]
                if stop_at_head:  # fused-head path (ops/ayhead_fused.py)
                    return feats
                # train: per-level raw maps; eval: (decoded, per-level maps)
                if dn is not None:
                    return m(feats, train=train, input_h=input_h, dn=dn)
                if text_feats is not None:
                    return m(feats, text_feats=text_feats, train=train,
                             input_h=input_h)
                return m(feats, train=train, input_h=input_h)
            inp = fetch(f) if isinstance(f, int) else [fetch(j) for j in f]
            mname = type(m).__name__
            if mname == "C2fAttn":
                out = m(inp, _require_text(txt, mname), train=train)
            elif mname == "ImagePoolingAttn":
                txt = m(inp, _require_text(txt, mname), train=train)
                out = inp[0]  # stream placeholder; consumers route by index
            else:
                out = m(inp, train=train)
            ys.append(out if i in self.save else None)
        return out  # headless graph (feature extractor)


class DetectionModel:
    """Python-side task model: owns cfg, the flax graph, params and state.

    The reference's DetectionModel (tasks.py:309) is an nn.Module; here the
    stateless flax graph and the stateful wrapper are split, functional-style.
    ``variables`` = {'params': ..., 'batch_stats': ...}.
    """

    task = "detect"

    def __init__(self, cfg: str | dict = "yolo11n.yaml", ch: int = 3, nc: int | None = None,
                 dtype=jnp.float32, verbose: bool = False):
        self.yaml = load_model_cfg(cfg)
        if nc and nc != self.yaml.get("nc"):
            LOGGER.info(f"Overriding model.yaml nc={self.yaml.get('nc')} with nc={nc}")
            self.yaml["nc"] = nc
        self.dtype = dtype
        self.specs, self.meta = parse_model_yaml(self.yaml, ch=ch, dtype=dtype, verbose=verbose)
        self.nc = self.meta["nc"]
        self.reg_max = 16
        head_idx = next((s.i for s in self.specs if s.is_head), -1)
        froms = tuple(tuple(s.f) if isinstance(s.f, list) else s.f for s in self.specs)
        self.graph = DetectionGraph(
            modules=tuple(s.module for s in self.specs),
            froms=froms,
            save=tuple(self.meta["save"]),
            head_idx=head_idx,
            nc=self.nc,
            reg_max=self.reg_max,
        )
        from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_eligible
        from yolo_ad_refine_tpu.ops.s2d_stem import stem_pair_eligible

        # channel triple when yaml rows 0-1 admit the exact s2d inference
        # rewrite (ops/s2d_stem.py), else None
        self.stem_s2d_chans = stem_pair_eligible(self.specs, self.meta["save"])
        # rows 0-4 blocked-layout rewrite (ops/s2d_prologue.py), else None
        self.prologue_meta = prologue_eligible(self.specs, self.meta["save"])
        self.head_spec: LayerSpec = self.specs[head_idx] if head_idx >= 0 else None
        self.nl = (
            len(self.head_spec.f)
            if self.head_spec is not None and isinstance(self.head_spec.f, (list, tuple))
            else (1 if self.head_spec is not None else 0)
        )
        self.variables = None
        self.strides = None
        # YOLO-World graphs (C2fAttn / ImagePoolingAttn rows) need a text
        # stream from the very first trace; the reference seeds a randn
        # placeholder (tasks.py:614) replaced by set_classes. Plain
        # WorldDetect-only graphs keep their learned default_text fallback.
        self.text_feats = None
        if any(type(s.module).__name__ in ("C2fAttn", "ImagePoolingAttn")
               for s in self.specs):
            embed = (int(getattr(self.head_spec.module, "embed", 512) or 512)
                     if self.head_spec is not None else 512)
            t = np.random.default_rng(0).standard_normal(
                (self.nc, embed)).astype(np.float32)
            self.text_feats = t / np.linalg.norm(t, axis=-1, keepdims=True)

    @property
    def deconv_layer_indices(self) -> tuple:
        """Yaml-row indices whose module is a ConvTranspose (their torch
        weights are (I, O, kh, kw) + spatially flipped vs Conv2d — needed by
        utils/torch_import to pick the right layout without relying on torch
        parameter names, which are bare 'model.N.weight' for yaml rows)."""
        from yolo_ad_refine_tpu.nn.common import PlainConvTranspose2d

        return tuple(s.i for s in self.specs
                     if isinstance(s.module, PlainConvTranspose2d))

    # -- params ------------------------------------------------------------
    def init(self, key=None, imgsz: int = 640, batch: int = 1):
        """Initialize params/batch_stats with a dummy NHWC input."""
        key = key if key is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((batch, imgsz, imgsz, 3), dtype=self.dtype)
        kw = ({"text_feats": jnp.asarray(self.text_feats)}
              if self.text_feats is not None else {})
        init_fn = jax.jit(
            lambda k, x: self.graph.init({"params": k}, x, train=False, **kw))
        self.variables = jax.block_until_ready(init_fn(key, dummy))
        self.probe_strides(imgsz)
        return self.variables

    def probe_strides(self, imgsz: int = 640):
        """Static stride derivation via shape-only tracing (no FLOPs)."""
        if self.head_spec is None or self.head_spec.name in ("Classify", "RTDETRDecoder"):
            return None
        dummy = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), self.dtype)

        def fwd(v, x):
            out = self.graph.apply(v, x, train=False, **kw)[1]  # eval path: (y, feats)
            if isinstance(out, dict):  # v10Detect: {'one2many', 'one2one'}
                return out["one2one"]
            # Segment/Pose/OBB eval returns (feats, *extras)
            return out[0] if isinstance(out, tuple) else out

        kw = ({"text_feats": jnp.asarray(self.text_feats)}
              if getattr(self, "text_feats", None) is not None else {})
        if self.variables is not None:
            var_shapes = self.variables
        else:
            var_shapes = jax.eval_shape(
                lambda: self.graph.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3), self.dtype),
                    **kw,
                )
            )
        feats = jax.eval_shape(fwd, var_shapes, dummy)
        self.strides = tuple(imgsz // f.shape[1] for f in feats)
        return self.strides

    # -- forward -----------------------------------------------------------
    def apply(self, variables, x, train: bool = False, rngs=None, mutable=False,
              text_feats=None):
        """Pure functional forward. train=True returns per-level feats (and
        updated batch_stats when mutable=True); eval returns (decoded, feats).
        text_feats: (nc, embed) open-vocab class embeddings for a WorldDetect
        head; defaults to whatever set_classes stored on this model."""
        if text_feats is None:
            text_feats = getattr(self, "text_feats", None)
        kw = {}
        if text_feats is not None:
            kw["text_feats"] = jnp.asarray(text_feats, jnp.float32)
        from yolo_ad_refine_tpu.ops.s2d_prologue import (
            prologue_enabled,
            prologue_infer,
            prologue_rows,
        )
        from yolo_ad_refine_tpu.ops.s2d_stem import stem_pair_infer, stem_s2d_enabled

        # An AYHead routes itself through the lane-filling fused rewrite
        # (ops/ayhead_fused.py) on TPU — both train and eval paths.
        # % 16, not % 8: the blocked stride-2 row-3 conv (k3s2_block_map)
        # is exact only when the row-2 grid is even, i.e. H, W % 16 == 0.
        # At e.g. H=40 the blocked path yields a 6x6 row-4 map vs the module
        # path's 5x5 — fall through to the stem/module path instead.
        if (not train and self.prologue_meta is not None and prologue_enabled()
                and x.shape[1] % 16 == 0 and x.shape[2] % 16 == 0
                and "batch_stats" in variables):
            rows = prologue_rows()
            y = prologue_infer(variables, x, self.dtype, self.prologue_meta,
                               upto=rows)
            return self.graph.apply(variables, y, train=False, rngs=rngs,
                                    start_at=rows, full_input_h=x.shape[1], **kw)
        if (not train and self.stem_s2d_chans is not None and stem_s2d_enabled()
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
                and "batch_stats" in variables):
            y = stem_pair_infer(variables, x, self.dtype, self.stem_s2d_chans)
            return self.graph.apply(variables, y, train=False, rngs=rngs,
                                    start_at=2, full_input_h=x.shape[1], **kw)
        return self.graph.apply(
            variables, x, train=train, rngs=rngs,
            mutable=["batch_stats"] if (train and mutable) else False, **kw,
        )

    def __call__(self, x, train: bool = False, rngs=None):
        assert self.variables is not None, "call .init() first"
        if train:
            if rngs is None:
                rngs = {"dropout": jax.random.PRNGKey(0)}
            out, _ = self.apply(self.variables, x, train=True, rngs=rngs, mutable=True)
            return out
        return self.apply(self.variables, x, train=False, rngs=rngs)

    # -- profiling -----------------------------------------------------------
    def profile(self, x=None, imgsz: int = 640, batch: int = 1, iters: int = 10, verbose=True):
        """Per-layer timing (reference BaseModel._profile_one_layer, tasks.py:178).

        Each yaml layer is jitted separately and timed on its real
        intermediate input. Returns [(i, name, ms, params)] sorted by cost.
        """
        import time

        assert self.variables is not None
        if x is None:
            x = jnp.zeros((batch, imgsz, imgsz, 3), self.dtype)

        # capture intermediate inputs with an instrumented eager pass
        rows = []
        ys: list = []
        out = x
        froms = self.graph.froms
        for i, spec in enumerate(self.specs):
            f = froms[i]

            def fetch(j, i=i, out=out):
                return out if j == -1 else ys[j % i]

            inp = (
                [fetch(j) for j in f]
                if isinstance(f, (tuple, list))
                else fetch(f)
            )
            scope_name = f"modules_{i}"
            params = {"params": self.variables["params"].get(scope_name, {})}
            if scope_name in self.variables.get("batch_stats", {}):
                params["batch_stats"] = self.variables["batch_stats"][scope_name]
            kwargs = {"train": False} if spec.is_head else {}  # eval path: BN immutable
            fn = jax.jit(lambda p, a, m=spec.module, kw=kwargs: m.apply(p, a, **kw))
            out_i = jax.block_until_ready(fn(params, inp))
            t0 = time.perf_counter()
            for _ in range(iters):
                out_i = fn(params, inp)
            jax.block_until_ready(out_i)
            ms = (time.perf_counter() - t0) / iters * 1000
            n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params["params"]))
            rows.append((i, spec.name, ms, n_params))
            out = out_i if not spec.is_head else out
            ys.append(out if i in self.graph.save else None)
            if spec.is_head:
                break
        if verbose:
            total = sum(r[2] for r in rows)
            for i, name, ms, n in sorted(rows, key=lambda r: -r[2]):
                LOGGER.info(f"{i:>3} {name:<28} {ms:8.3f} ms ({ms / total * 100:5.1f}%) {n:>10,} params")
            LOGGER.info(f"total {total:.2f} ms/batch (bs={x.shape[0]})")
        return rows

    # -- info ---------------------------------------------------------------
    def num_params(self) -> int:
        if self.variables is None:
            return 0
        return sum(p.size for p in jax.tree.leaves(self.variables["params"]))

    def info(self):
        n = self.num_params()
        LOGGER.info(f"model: {len(self.specs)} layers, {n:,} parameters, strides {self.strides}")
        return {"layers": len(self.specs), "parameters": n, "strides": self.strides}


def build_detection_model(cfg, nc=None, dtype=jnp.float32, seed: int = 0, imgsz: int = 640,
                          verbose: bool = False) -> DetectionModel:
    model = DetectionModel(cfg, nc=nc, dtype=dtype, verbose=verbose)
    model.init(jax.random.PRNGKey(seed), imgsz=imgsz)
    return model
