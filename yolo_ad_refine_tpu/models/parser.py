"""Yaml -> layer-graph compiler.

Parity surface: reference ultralytics/nn/tasks.py:943-1108 (parse_model) and
tasks.py:1111-1143 (yaml_model_load / guess_model_scale). Loads the
reference's model yamls unchanged — including the fork's z-yaml configs with
their ``head_channel`` / ``fusion_mode`` top-level variables — and reproduces
its channel bookkeeping exactly:

- depth gain: n = max(round(n * depth), 1) for n > 1
- width gain: c2 = make_divisible(min(c2, max_channels) * width, 8) unless
  c2 == nc; applies to the conv-family including bare nn.Conv2d /
  nn.ConvTranspose2d rows (fork extension)
- repeat insertion for CSP-family blocks; C3k2 forces c3k=True at m/l/x
- ELA_HSFPN keeps channels; Multiply/Add take ch of the first input; Fusion
  computes out-channels by mode; Detect/AYHead consume the per-level ch list.

Output is a list of LayerSpec plus constructed (unbound) flax modules — the
graph executor in models/model.py routes features by the static savelist, so
the whole network traces into a single XLA program.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax.numpy as jnp

from yolo_ad_refine_tpu.nn import block as B
from yolo_ad_refine_tpu.nn import common as C
from yolo_ad_refine_tpu.nn import conv_extras as CE
from yolo_ad_refine_tpu.nn import head as H
from yolo_ad_refine_tpu.nn import transformer as TR
from yolo_ad_refine_tpu.nn import tssa as T
from yolo_ad_refine_tpu.nn.common import make_divisible
from yolo_ad_refine_tpu.utils import LOGGER, colorstr, yaml_load

HEAD_MODULES = {"Detect", "AYHead", "AYHead1", "Classify", "Segment", "Pose", "OBB",
                "v10Detect", "WorldDetect", "RTDETRDecoder"}
# modules whose first yaml arg is an out-channel subject to width scaling
WIDTH_SCALED = {
    "Conv", "DWConv", "SPPF", "SPP", "C2f", "C3", "C3k2", "C2PSA",
    "C3k2_MLCA", "C2TSSA_DYT_Mona_EDFFN", "C2SFA", "C2PTSSA",
    "C2PSA_EDFFN", "C2AdaptiveTSSA_Enhanced", "C2ProgressiveTSSA_Fusion1",
    "nn.Conv2d", "nn.ConvTranspose2d", "C2fAttn", "GSConv",
    # conv extras + v10 blocks (nn/conv_extras.py)
    "Conv2", "LightConv", "Focus", "GhostConv", "RepConv",
    "SCDown", "C2fCIB", "PSA", "Bottleneck",
}
# CSP-family modules that receive the repeat count as constructor arg n
REPEAT_MODULES = {
    "C2f", "C3", "C3k2", "C2PSA", "C3k2_MLCA", "C2TSSA_DYT_Mona_EDFFN", "C2SFA", "C2PTSSA",
    "C2fCIB", "C2PSA_EDFFN", "C2AdaptiveTSSA_Enhanced", "C2ProgressiveTSSA_Fusion1",
}


@dataclass
class LayerSpec:
    """One compiled yaml row."""

    i: int                      # layer index
    f: Any                      # 'from': int or list of ints (absolute after resolve)
    name: str                   # module name as written in yaml
    n: int                      # repeats materialised into the module
    c2: int                     # output channels
    module: Any                 # constructed (unbound) flax module
    is_head: bool = False
    args: list = field(default_factory=list)


def guess_model_scale(path: str | Path) -> str:
    """Extract the compound-scale suffix from a filename (yolo11n -> 'n')."""
    m = re.search(r"yolo[v]?\d+([nslmx])", Path(path).stem)
    return m.group(1) if m else ""


def load_model_cfg(cfg: str | Path | dict) -> dict:
    """Load a model yaml (dict passthrough) and record scale from filename.

    Handles scale-suffixed names: 'yolo11n.yaml' resolves to 'yolo11.yaml'
    with scale='n' (reference tasks.py:1111-1126 yaml_model_load).
    """
    if isinstance(cfg, dict):
        return dict(cfg)
    p = Path(cfg)
    if not p.exists():
        from yolo_ad_refine_tpu.utils import ROOT

        unified_name = re.sub(r"(\d+)([nslmx])(.*)\.", r"\1\3.", p.name)
        for cand in (p.with_name(unified_name),
                     ROOT / "cfg" / "models" / p.name,
                     ROOT / "cfg" / "models" / unified_name):
            if cand.exists():
                p = cand
                break
    d = yaml_load(p, append_filename=True)
    scale = guess_model_scale(cfg)
    if scale:
        d["scale"] = scale
    return d


def _substitute(args: list, variables: dict) -> list:
    """Resolve string args: yaml top-level variables first, then literals."""
    out = []
    for a in args:
        if isinstance(a, str):
            if a in variables:
                a = variables[a]
            else:
                try:
                    a = ast.literal_eval(a)
                except (ValueError, SyntaxError):
                    pass
        out.append(a)
    return out


def parse_model_yaml(d: dict, ch: int = 3, dtype=jnp.float32, verbose: bool = False):
    """Compile a model yaml dict into layer specs.

    Returns:
        specs: list[LayerSpec]
        meta: dict with nc, savelist (sorted layer indices whose outputs are
              reused), scale info.
    """
    nc = d.get("nc", 80)
    scales = d.get("scales")
    scale = d.get("scale")
    depth, width, max_channels = d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0), float("inf")
    if scales:
        if not scale:
            scale = tuple(scales.keys())[0]
            LOGGER.warning(f"WARNING no model scale passed. Assuming scale='{scale}'.")
        depth, width, max_channels = scales[scale]

    # yaml-level user variables (fork extension: head_channel, fusion_mode, nc)
    variables = {k: v for k, v in d.items() if k not in ("backbone", "head", "scales")}

    ch_list = [ch]
    specs: list[LayerSpec] = []
    save: set[int] = set()

    if verbose:
        LOGGER.info(f"\n{'':>3}{'from':>20}{'n':>3}  {'module':<45}{'arguments':<30}")

    for i, (f, n, name, args) in enumerate(d["backbone"] + d["head"]):
        args = _substitute(list(args), variables)
        n_orig = n
        n = max(round(n * depth), 1) if n > 1 else n

        is_head = name in HEAD_MODULES
        module = None
        c2 = ch_list[f] if isinstance(f, int) else ch_list[f[0]]

        if name in WIDTH_SCALED:
            c1 = ch_list[f]
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            rest = args[1:]
            if name == "Conv":
                # full torch signature: (c2, k, s, p, g, d, act)
                k = rest[0] if rest else 1
                s = rest[1] if len(rest) > 1 else 1
                p = rest[2] if len(rest) > 2 else None
                g = rest[3] if len(rest) > 3 else 1
                d_ = rest[4] if len(rest) > 4 else 1
                act = rest[5] if len(rest) > 5 else True
                module = C.Conv(c2, k, s, p=p, g=g, d=d_, act=act, dtype=dtype)
            elif name == "DWConv":
                # torch signature: (c2, k, s, d, act)
                k = rest[0] if rest else 1
                s = rest[1] if len(rest) > 1 else 1
                d_ = rest[2] if len(rest) > 2 else 1
                act = rest[3] if len(rest) > 3 else True
                module = C.DWConv(c2, k, s, d=d_, act=act, dtype=dtype)
            elif name == "SPPF":
                module = B.SPPF(c2, rest[0] if rest else 5, dtype=dtype)
            elif name == "SPP":
                module = B.SPP(c2, tuple(rest[0]) if rest else (5, 9, 13), dtype=dtype)
            elif name == "Bottleneck":
                shortcut = rest[0] if rest else True
                if n > 1:  # v3-style repeated rows: n distinct blocks chained
                    module = B.SequentialBlocks(tuple(
                        B.Bottleneck(c2, shortcut, dtype=dtype) for _ in range(n)
                    ))
                else:
                    module = B.Bottleneck(c2, shortcut, dtype=dtype)
                n = 1
            elif name == "Conv2":
                module = CE.Conv2(c2, rest[0] if rest else 3,
                                  rest[1] if len(rest) > 1 else 1, dtype=dtype)
            elif name == "LightConv":
                module = CE.LightConv(c2, rest[0] if rest else 1, dtype=dtype)
            elif name == "Focus":
                module = CE.Focus(c2, rest[0] if rest else 1,
                                  rest[1] if len(rest) > 1 else 1, dtype=dtype)
            elif name == "GhostConv":
                module = CE.GhostConv(c2, rest[0] if rest else 1,
                                      rest[1] if len(rest) > 1 else 1, dtype=dtype)
            elif name == "RepConv":
                module = CE.RepConv(c2, rest[0] if rest else 3,
                                    rest[1] if len(rest) > 1 else 1, dtype=dtype)
            elif name == "SCDown":
                module = CE.SCDown(c2, rest[0] if rest else 3,
                                   rest[1] if len(rest) > 1 else 2, dtype=dtype)
            elif name == "C2fCIB":
                shortcut = rest[0] if rest else False
                lk = rest[1] if len(rest) > 1 else False
                module = CE.C2fCIB(c2, n=n, shortcut=shortcut, lk=lk, dtype=dtype)
                n = 1
            elif name == "PSA":
                module = CE.PSA(c2, rest[0] if rest else 0.5, dtype=dtype)
            elif name in ("C2f", "C3"):
                shortcut = rest[0] if rest else (name == "C3")
                cls = B.C2f if name == "C2f" else B.C3
                module = cls(c2, n, shortcut, dtype=dtype)
                n = 1
            elif name == "C2fAttn":
                # reference tasks.py:1021-1024: embed channels and head count
                # get their own width gains
                ec = rest[0] if rest else 128
                nh = rest[1] if len(rest) > 1 else 1
                gc = rest[2] if len(rest) > 2 else 512
                ec = make_divisible(min(ec, max_channels / 2) * width, 8)
                if nh > 1:
                    nh = int(max(round(min(nh, max_channels / 64)) * width, 1))
                module = B.C2fAttn(c2, n=n, ec=ec, nh=nh, gc=gc, dtype=dtype)
                n = 1
            elif name == "GSConv":
                module = B.GSConv(c2, rest[0] if rest else 1,
                                  rest[1] if len(rest) > 1 else 1, dtype=dtype)
            elif name in ("C3k2", "C3k2_MLCA"):
                c3k = rest[0] if rest else False
                e = rest[1] if len(rest) > 1 else 0.5
                shortcut = rest[2] if len(rest) > 2 else True
                if name == "C3k2" and scale in ("m", "l", "x"):
                    c3k = True  # reference tasks.py:1050-1051
                cls = B.C3k2 if name == "C3k2" else B.C3k2MLCA
                module = cls(c2=c2, n=n, c3k=c3k, e=e, shortcut=shortcut, dtype=dtype)
                n = 1
            elif name in ("C2PSA", "C2PTSSA", "C2TSSA_DYT_Mona_EDFFN", "C2SFA",
                          "C2PSA_EDFFN", "C2AdaptiveTSSA_Enhanced",
                          "C2ProgressiveTSSA_Fusion1"):
                e = rest[0] if rest else 0.5
                cls = {
                    "C2PSA": B.C2PSA,
                    "C2PTSSA": T.C2PTSSA,
                    "C2TSSA_DYT_Mona_EDFFN": T.C2TSSADyTMonaEDFFN,
                    "C2SFA": T.C2SFA,
                    "C2PSA_EDFFN": T.C2PSAEDFFN,
                    "C2AdaptiveTSSA_Enhanced": T.C2AdaptiveTSSAEnhanced,
                    "C2ProgressiveTSSA_Fusion1": T.C2ProgressiveTSSAFusion1,
                }[name]
                module = cls(c2=c2, n=n, e=e if isinstance(e, float) else 0.5, dtype=dtype)
                n = 1
            elif name == "nn.Conv2d":
                k = rest[0] if rest else 1
                s = rest[1] if len(rest) > 1 else 1
                module = C.PlainConv2d(c2, k, s, dtype=dtype)
            elif name == "nn.ConvTranspose2d":
                k = rest[0] if rest else 3
                s = rest[1] if len(rest) > 1 else 2
                p = rest[2] if len(rest) > 2 else 1
                op = rest[3] if len(rest) > 3 else 1
                module = C.PlainConvTranspose2d(c2, k, s, p, op, dtype=dtype)
            del c1
        elif name == "HGStem":
            c2 = args[1]
            module = B.HGStem(cm=args[0], c2=c2, dtype=dtype)
        elif name == "HGBlock":
            # yaml: [cm, c2, k, lightconv, shortcut]; repeats -> inner n
            cm, c2 = args[0], args[1]
            k = args[2] if len(args) > 2 else 3
            light = args[3] if len(args) > 3 else False
            shortcut = args[4] if len(args) > 4 else False
            module = B.HGBlock(cm=cm, c2=c2, k=k, n=n, lightconv=light, shortcut=shortcut,
                               dtype=dtype)
            n = 1
        elif name == "RepC3":
            c2 = args[0]
            e = args[1] if len(args) > 1 else 1.0
            module = B.RepC3(c2=c2, n=n, e=e, dtype=dtype)
            n = 1
        elif name == "AIFI":
            c2 = ch_list[f]
            cm = args[0] if args else 2048
            nh = args[1] if len(args) > 1 else 8
            module = TR.AIFI(cm=cm, num_heads=nh, dtype=dtype)
        elif name == "RTDETRDecoder":
            head_ch = tuple(ch_list[x] for x in f)
            head_nc = args[0] if args else nc
            # optional extras beyond the stock yaml ([nc]): hd, nq, ndl, d_ffn
            # (lets tiny test configs shrink the decoder; stock yamls unaffected)
            extra = {}
            for key, val in zip(("hd", "nq", "ndl", "d_ffn"), args[1:]):
                extra[key] = int(val)
            module = TR.RTDETRDecoder(nc=head_nc, ch=head_ch, dtype=dtype, **extra)
            c2 = 0
        elif name in ("RepNCSPELAN4", "ELAN1", "ADown", "AConv", "SPPELAN"):
            c1 = ch_list[f]
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            if name == "RepNCSPELAN4":
                c3, c4 = args[1], args[2]
                rep_n = args[3] if len(args) > 3 else 1
                module = CE.RepNCSPELAN4(c2, c3, c4, n=max(round(rep_n * depth), 1),
                                         dtype=dtype)
            elif name == "ELAN1":
                module = CE.ELAN1(c2, args[1], args[2], dtype=dtype)
            elif name == "ADown":
                module = CE.ADown(c2, dtype=dtype)
            elif name == "AConv":
                module = CE.AConv(c2, dtype=dtype)
            else:  # SPPELAN
                module = CE.SPPELAN(c2, args[1], args[2] if len(args) > 2 else 5,
                                    dtype=dtype)
            del c1
        elif name == "ImagePoolingAttn":
            # multi-input text-refinement node (reference tasks.py:1082 routes
            # it with the head modules: ch list appended, ec arg unscaled).
            # Its output replaces the running txt_feats in the executor, not
            # the feature stream — downstream rows route around it by index.
            ec = args[0] if args else 256
            module = B.ImagePoolingAttn(ec=ec, ch=tuple(ch_list[j] for j in f),
                                        dtype=dtype)
            c2 = ch_list[f[0]]
        elif name in ("CBAM", "ChannelAttention", "SpatialAttention"):
            c2 = ch_list[f]  # channel-preserving attention gates
            if name == "CBAM":
                module = CE.CBAM(args[1] if len(args) > 1 else 7, dtype=dtype)
            elif name == "ChannelAttention":
                module = CE.ChannelAttention(dtype=dtype)
            else:
                module = CE.SpatialAttention(args[0] if args else 7, dtype=dtype)
        elif name in ("EMA", "SimAM", "TripletAttention", "LSKBlock",
                      "SEAttention", "EfficientChannelAttention"):
            from yolo_ad_refine_tpu.nn import attention as AT

            c2 = ch_list[f]  # attention-zoo gates (reference attention.py)
            module = getattr(AT, name)(dtype=dtype) if name != "SimAM" \
                else AT.SimAM()
        elif name in ("SpatialGroupEnhance", "EffectiveSEModule", "ELA",
                      "CAA", "MPCA", "AFGCAttention", "BAMBlock", "LSKBlockSA",
                      "LSKA", "SegNext_Attention", "CPCA", "deformable_LKA",
                      "DAttention", "FocusedLinearAttention",
                      "CascadedGroupAttention", "LocalWindowAttention",
                      "DualDomainSelectionMechanism", "EfficientAttention",
                      "BiLevelRoutingAttention",
                      "BiLevelRoutingAttention_nchw", "DSAN", "DSA"):
            from yolo_ad_refine_tpu.nn import attention_zoo  # noqa: F401
            from yolo_ad_refine_tpu.nn import dsan  # noqa: F401
            from yolo_ad_refine_tpu.nn.registry import MODULE_REGISTRY

            # channel-preserving gates, long tail of reference attention.py;
            # the torch ctor's channel arg is inferred from the input edge
            c2 = ch_list[f]
            module = MODULE_REGISTRY[name](dtype=dtype)
        elif name == "ELA_HSFPN":
            c2 = ch_list[f]
            flag = args[0] if args else True
            module = B.ELAHSFPN(flag=flag, dtype=dtype)
        elif name == "Multiply":
            c2 = ch_list[f[0]]
            module = B.Multiply()
        elif name == "Add":
            c2 = ch_list[f[0]]
            module = B.Add()
        elif name == "Fusion":
            inc_list = tuple(ch_list[x] for x in f)
            mode = args[0] if args else "bifpn"
            c2 = sum(inc_list) if mode == "concat" else inc_list[0]
            module = B.Fusion(inc_list=inc_list, fusion=mode, dtype=dtype)
        elif name == "Concat":
            c2 = sum(ch_list[x] for x in f)
            module = C.Concat()
        elif name == "nn.Upsample":
            c2 = ch_list[f]
            size = args[0] if args else None
            sf = args[1] if len(args) > 1 else 2
            mode = args[2] if len(args) > 2 else "nearest"
            module = C.Upsample(size=size, scale_factor=sf, mode=mode)
        elif name in ("Detect", "AYHead", "AYHead1"):
            head_ch = tuple(ch_list[x] for x in f)
            head_nc = args[0] if args else nc
            if name == "Detect":
                module = H.Detect(nc=head_nc, ch=head_ch, dtype=dtype)
            else:
                # dcn_radius: top-level model-yaml key (checkpoint-aware —
                # load_checkpoint raises it to cover the checkpoint's logged
                # dcn_offset_max; reference mmcv DCN is unbounded)
                module = H.AYHead(nc=head_nc, ch=head_ch, dtype=dtype,
                                  dcn_radius=float(d.get("dcn_radius", 3.0)))
            c2 = 0
        elif name == "Classify":
            head_nc = args[0] if args else nc
            module = H.Classify(nc=head_nc, dtype=dtype)
            c2 = head_nc
        elif name in ("v10Detect", "WorldDetect"):
            head_ch = tuple(ch_list[x] for x in f)
            head_nc = args[0] if args else nc
            if name == "v10Detect":
                module = H.v10Detect(nc=head_nc, ch=head_ch, dtype=dtype)
            else:
                embed = args[1] if len(args) > 1 else 512
                with_bn = args[2] if len(args) > 2 else True
                module = H.WorldDetect(nc=head_nc, embed=embed, with_bn=with_bn,
                                       ch=head_ch, dtype=dtype)
            c2 = 0
        elif name in ("Segment", "Pose", "OBB"):
            head_ch = tuple(ch_list[x] for x in f)
            head_nc = args[0] if args else nc
            if name == "Segment":
                nm = args[1] if len(args) > 1 else 32
                npr = args[2] if len(args) > 2 else 256
                # reference tasks.py:1041: proto channels are width-scaled
                npr = make_divisible(min(npr, max_channels) * width, 8)
                module = H.Segment(nc=head_nc, nm=nm, npr=npr, ch=head_ch, dtype=dtype)
            elif name == "Pose":
                kpt_shape = tuple(args[1]) if len(args) > 1 else (17, 3)
                module = H.Pose(nc=head_nc, kpt_shape=kpt_shape, ch=head_ch, dtype=dtype)
            else:
                ne = args[1] if len(args) > 1 else 1
                module = H.OBB(nc=head_nc, ne=ne, ch=head_ch, dtype=dtype)
            c2 = 0
        else:
            raise KeyError(
                f"yaml module '{name}' (layer {i}) is not implemented in yolo_ad_refine_tpu"
            )

        specs.append(LayerSpec(i=i, f=f, name=name, n=n_orig, c2=c2, module=module,
                               is_head=is_head, args=args))
        save.update(x % i for x in ([f] if isinstance(f, int) else list(f)) if x != -1)
        if verbose:
            LOGGER.info(f"{i:>3}{str(f):>20}{n_orig:>3}  {name:<45}{str(args):<30}")
        if i == 0:
            ch_list = []
        ch_list.append(c2)

    meta = {"nc": nc, "save": sorted(save), "scale": scale, "depth": depth, "width": width,
            "ch": ch_list}
    if verbose:
        LOGGER.info(colorstr(f"model: {len(specs)} layers, save={sorted(save)}"))
    return specs, meta
