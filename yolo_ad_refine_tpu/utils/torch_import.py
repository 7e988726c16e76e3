"""Torch-checkpoint import: reference state_dict -> our flax variables.

The SURVEY §7 weight-transpose tool: maps an ultralytics/YOLO-AD-Refine
torch ``model.state_dict()`` onto this framework's parameter tree, converting
layouts (OIHW->HWIO convs, (O,I)->(I,O) dense, Conv1d (O,I,K)->(K,I,O),
ConvTranspose flip+transpose, BN weight/bias/running stats ->
scale/bias/batch_stats).

Name translation is rule-based: our flax module names intentionally mirror
the reference's (cv1, cv2, m0..., bn, gn), with indexed Sequentials flattened
('m.0.' -> 'm0/', Detect 'cv2.0.1' -> 'cv2_0_1'). Used by tests for
random-weight logits parity and by users to import trained torch checkpoints.
"""

from __future__ import annotations

import re

import numpy as np

import jax

FLAX_BN_MAP = {"weight": "scale", "bias": "bias"}
FLAX_STATS_MAP = {"running_mean": "mean", "running_var": "var"}


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def convert_tensor(torch_name: str, w) -> np.ndarray:
    """Layout-convert one torch tensor to flax conventions."""
    w = np.asarray(w)
    if torch_name.endswith("weight"):
        if w.ndim == 4:
            # ConvTranspose2d weights are (in, out, kh, kw) and need a spatial
            # flip; regular Conv2d are (out, in, kh, kw). Distinguished by name.
            if ".upsample" in torch_name or "ConvTranspose" in torch_name or _is_deconv(torch_name):
                return np.flip(w.transpose(2, 3, 0, 1), axis=(0, 1)).copy()
            return w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if w.ndim == 3:  # Conv1d (O, I, K) -> (K, I, O)
            return w.transpose(2, 1, 0)
        if w.ndim == 2:  # Linear (O, I) -> (I, O)
            return w.transpose(1, 0)
    return w


_DECONV_PATTERNS: list[str] = []


def _is_deconv(name: str) -> bool:
    return any(re.search(p, name) for p in _DECONV_PATTERNS)


def translate_name(torch_name: str) -> tuple[tuple, str]:
    """reference 'model.{i}.rest.weight' -> (flax path tuple, collection).

    collection is 'params' or 'batch_stats'.
    """
    parts = torch_name.split(".")
    assert parts[0] == "model", torch_name
    idx = parts[1]
    rest = parts[2:]
    leaf = rest[-1]
    body = rest[:-1]

    collection = "params"
    if leaf in FLAX_STATS_MAP:
        collection = "batch_stats"
        leaf = FLAX_STATS_MAP[leaf]
    elif leaf == "num_batches_tracked":
        return (), ""  # dropped

    # fuse Sequential indices into our flattened names: m.0 -> m0, cv2.0.1 -> cv2_0_1
    path: list[str] = [f"modules_{idx}"]
    i = 0
    while i < len(body):
        name = body[i]
        # collect following pure-integer segments
        nums = []
        j = i + 1
        while j < len(body) and body[j].isdigit():
            nums.append(body[j])
            j += 1
        if name == "m" and nums:
            path.append(f"m{nums[0]}")
            for extra in nums[1:]:
                path.append(extra)  # deeper anonymous seq handled by caller maps
        elif nums:
            path.append(name + "_" + "_".join(nums))
        else:
            path.append(name)
        i = j
    # norm-layer leaf renames (torch bn.weight -> flax bn.scale); GN same
    parent = path[-1] if path else ""
    if leaf in FLAX_BN_MAP and parent in ("bn", "gn", "norm", "bn1") or (
        leaf == "weight" and parent in ("bn", "gn", "norm", "bn1")
    ):
        leaf = FLAX_BN_MAP.get(leaf, leaf)
    elif leaf == "weight":
        leaf = "kernel"
    return tuple(path + [leaf]), collection


def _path_variants(path: tuple):
    """Generate plausible flax-path variants for a translated torch path.

    Covers the remaining structural differences between torch's nested
    Sequentials and our flattened names:
    - merge adjacent components with '_' ('stages_0'+'conv' -> 'stages_0_conv')
    - drop a 'conv' level (modules wrapping a bare nn.Conv, e.g.
      TaskDecomposition reduction_conv, DyDCNv2)
    - rename 'norm' -> 'gn' (DyDCNv2's build_norm_layer)
    - strip a trailing '_0' from a component (torch Sequential of length 1,
      e.g. cls_gate.0)
    """
    seen = {path}
    frontier = [path]
    for _ in range(3):
        new_frontier = []
        for p in frontier:
            cands = []
            for i in range(len(p) - 1):
                cands.append(p[:i] + (p[i] + "_" + p[i + 1],) + p[i + 2 :])
            for i, comp in enumerate(p[:-1]):
                if comp == "conv":
                    cands.append(p[:i] + p[i + 1 :])
                if comp == "reduction_conv" and i + 1 < len(p) and p[i + 1] == "gn":
                    # TaskDecomposition: torch reduction_conv.gn -> our top-level gn
                    cands.append(p[:i] + p[i + 1 :])
                if comp == "norm":
                    cands.append(p[:i] + ("gn",) + p[i + 1 :])
                if comp.endswith("_0"):
                    cands.append(p[:i] + (comp[:-2],) + p[i + 1 :])
            if p[-1] == "kernel":
                # DynamicTanh-style raw 'weight' params; GroupNorm scale
                cands.append(p[:-1] + ("weight",))
                cands.append(p[:-1] + ("scale",))
            cands.append(p[:-1] + ("conv", p[-1]))  # bare nn.Conv2d yaml rows
            for c in cands:
                if c not in seen:
                    seen.add(c)
                    new_frontier.append(c)
        frontier = new_frontier
    return seen


def _special_values(tname: str, w: np.ndarray, flat_params: dict):
    """Handlers producing {path: array} for structurally-different params."""
    w = np.asarray(w)
    m = re.match(r"model\.(\d+)\.(.*)", tname)
    if not m:
        return None
    idx, rest = m.groups()
    mod = f"modules_{idx}"

    def find(suffix):
        hits = [p for p in flat_params if p[0] == mod and p[-len(suffix):] == suffix]
        return hits

    # torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention
    mha = re.match(r"(.*)cross_scale_fusion\.in_proj_(weight|bias)$", rest)
    if mha:
        out = {}
        d = w.shape[-1] if w.ndim == 2 else w.shape[0] // 3
        qkv = np.split(w, 3, axis=0)
        for name, part in zip(("query", "key", "value"), qkv):
            hits = find(("cross_scale_fusion", name, "kernel" if w.ndim == 2 else "bias"))
            if not hits:
                return None
            target = flat_params[hits[0]]
            if w.ndim == 2:  # (D, D) -> (D, nh, hd)
                part = part.transpose(1, 0).reshape(target.shape)
            else:
                part = part.reshape(target.shape)
            out[hits[0]] = part
        return out
    mha_out = re.match(r"(.*)cross_scale_fusion\.out_proj\.(weight|bias)$", rest)
    if mha_out:
        leaf = "kernel" if mha_out.group(2) == "weight" else "bias"
        hits = find(("cross_scale_fusion", "out", leaf))
        if not hits:
            return None
        target = flat_params[hits[0]]
        if leaf == "kernel":  # torch (D, D) -> flax (nh, hd, D)
            w = w.transpose(1, 0).reshape(target.shape)
        return {hits[0]: w.reshape(target.shape)}

    if rest.endswith(".fft"):  # EDFFN filter (C,1,1,8,5) -> (8,5,C)
        hits = [p for p in flat_params if p[0] == mod and p[-1] == "fft"
                and rest.split(".")[0] in "/".join(p)]
        hits = hits or [p for p in flat_params if p[0] == mod and p[-1] == "fft"]
        # choose by matching channel count
        wv = w.squeeze((1, 2)).transpose(1, 2, 0)
        for h in hits:
            if tuple(flat_params[h].shape) == wv.shape and _same_branch(rest, h):
                return {h: wv}
        return None

    if rest.endswith(".alphas"):  # AdaptiveDyT (1,ns,1,1) -> (ns,)
        for h in (p for p in flat_params if p[0] == mod and p[-1] == "alphas"):
            if _same_branch(rest, h):
                return {h: w.reshape(-1)}
        return None

    sc = re.match(r"scale\.(\d+)\.scale$", rest)
    if sc:  # AYHead per-level Scale modules -> direct params scale{i}
        key = (mod, f"scale{sc.group(1)}")
        if key in flat_params:
            return {key: w.reshape(flat_params[key].shape)}
    return None


def _same_branch(torch_rest: str, flax_path: tuple) -> bool:
    """Loose check that the torch submodule path and flax path share their
    leading component chain (e.g. m.0.ffn.fft vs m0/ffn/fft)."""
    t = [c for c in torch_rest.split(".") if not c.isdigit()][:-1]
    f = "/".join(flax_path)
    return all(c in f for c in t)


def import_torch_state_dict(state_dict: dict, variables: dict, strict: bool = True,
                            deconv_markers: tuple = (".upsample",),
                            deconv_layers: tuple = ()) -> dict:
    """Map a torch state_dict onto a flax variables tree.

    Args:
        state_dict: {torch_name: tensor-like} from the reference model.
        variables: our model's current variables (provides the structure).
        deconv_markers: substrings of torch names that are ConvTranspose2d
            weights (covers nested deconvs like Proto '.upsample').
        deconv_layers: yaml-row indices that ARE ConvTranspose2d modules
            (their torch names are bare 'model.N.weight' with nothing to
            pattern-match, and when in==out channels the shape is ambiguous).
            Pass ``model.deconv_layer_indices``.

    Returns new variables dict. With strict=True, raises on any unmatched
    parameter on either side.
    """
    deconv_markers = tuple(deconv_markers) + tuple(
        f"model.{i}.weight" for i in deconv_layers
    )
    flat = {"params": _flatten(variables["params"]),
            "batch_stats": _flatten(variables.get("batch_stats", {}))}
    new = {"params": dict(flat["params"]), "batch_stats": dict(flat["batch_stats"])}
    used = set()
    missing = []

    def assign(coll, path, tname, w):
        target = flat[coll][path]
        wv = np.asarray(w)
        if wv.ndim == 4:
            if any(mk in tname for mk in deconv_markers):
                # torch ConvTranspose2d (I, O, KH, KW) -> flax (KH, KW, I, O), flipped
                wv = np.flip(wv.transpose(2, 3, 0, 1), axis=(0, 1)).copy()
            else:
                wv = wv.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif wv.ndim == 3 and wv.shape != tuple(target.shape):
            wv = wv.transpose(2, 1, 0)  # Conv1d (O, I, K) -> (K, I, O)
        elif wv.ndim == 2 and path[-1] == "kernel" and tname.endswith(".weight"):
            # Linear (O, I) -> Dense kernel (I, O). Unconditional: a shape
            # test cannot disambiguate SQUARE weights, and an untransposed
            # square kernel is a silent wrong-function bug (caught on the
            # flagship's attention to_out: forward nearly masked by the
            # bias, gradients through the block 100% wrong).
            wv = wv.transpose(1, 0)
        elif wv.ndim == 2 and wv.shape != tuple(target.shape):
            wv = wv.transpose(1, 0)
        if wv.shape != tuple(target.shape):
            missing.append(f"shape mismatch {tname} -> {'/'.join(path)}: "
                           f"{wv.shape} vs {tuple(target.shape)}")
            return
        # jnp.array (copy=True), NOT asarray: jax CPU zero-copies aligned
        # numpy arrays, and np.asarray(torch_tensor) shares torch storage —
        # asarray would alias the live torch parameter, so a later in-place
        # torch opt.step() silently mutates the "imported" jax weights
        new[coll][path] = jax.numpy.array(wv, dtype=target.dtype)
        used.add((coll, path))

    for tname, w in state_dict.items():
        if ".dfl." in tname or tname.endswith("num_batches_tracked"):
            continue  # frozen DFL conv / BN counters — not parameters here
        special = _special_values(tname, w, flat["params"])
        if special:
            for path, arr in special.items():
                target = flat["params"][path]
                new["params"][path] = jax.numpy.array(arr, dtype=target.dtype)
                used.add(("params", path))
            continue
        path, coll = translate_name(tname)
        if not coll:
            continue
        if path not in flat[coll]:
            resolved = [v for v in _path_variants(path) if v in flat[coll]]
            if len(resolved) == 1:
                path = resolved[0]
            elif len(resolved) > 1:
                # disambiguate by shape
                wv = np.asarray(w)
                by_shape = [v for v in resolved if flat[coll][v].size == wv.size]
                path = by_shape[0] if by_shape else resolved[0]
        if path in flat[coll]:
            assign(coll, path, tname, w)
        else:
            missing.append(f"no target for {tname} -> {'/'.join(path)}")

    untouched = [
        "/".join(p) for coll in ("params", "batch_stats")
        for p in flat[coll] if (coll, p) not in used
    ]
    if strict and (missing or untouched):
        raise KeyError(
            f"import mismatches:\nunmatched torch ({len(missing)}): {missing[:10]}\n"
            f"untouched flax ({len(untouched)}): {untouched[:10]}"
        )
    return {"params": _unflatten(new["params"]), "batch_stats": _unflatten(new["batch_stats"])}
