"""SAM2: model assembly, builders, and image/video predictors.

Parity surface (torch reference):
- SAM2Model: models/sam/modules/sam.py:107-955 (track_step, memory
  conditioning, _forward_sam_heads, _encode_new_memory)
- builders: models/sam/build.py:69-118 (_build_sam2:216-304)
- SAM2VideoPredictor: models/sam/predict.py

TPU-native design: the torch reference concatenates a python-varying number
of memories each frame (re-tracing every step under jit). Here the memory
bank has a FIXED layout — num_maskmem spatial-memory slots plus
max_obj_ptrs pointer slots, each with a validity mask — so the whole
track step compiles ONCE and every frame reuses the same executable.
Slot j always holds temporal position j (0 = conditioning frame,
1..num_maskmem-1 = progressively more recent frames), so the temporal
position encoding is static per slot. The predictors keep the frame->memory
dict on the host, exactly like the reference's output_dict, and assemble
the fixed-slot arrays per frame.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.models.sam.modules import MLP, PromptEncoder
from yolo_ad_refine_tpu.models.sam.sam2_modules import (
    FpnNeck,
    Hiera,
    MemoryAttention,
    MemoryEncoder,
    SAM2MaskDecoder,
    get_1d_sine_pe,
    position_embedding_sine,
)

Dtype = Any
NO_OBJ_SCORE = -1024.0


class SAM2Net(nn.Module):
    """The full SAM2 parameter set with jit-friendly functional methods
    (reference sam.py:107-955). All configuration matches _build_sam2."""

    embed_dim: int = 96
    stages: Sequence[int] = (1, 2, 7, 2)
    num_heads: int = 1
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    window_spatial_size: Sequence[int] = (7, 7)
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)
    image_size: int = 1024
    backbone_stride: int = 16
    num_maskmem: int = 7
    mem_dim: int = 64
    hidden_dim: int = 256
    max_obj_ptrs: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk = Hiera(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            stages=tuple(self.stages),
            global_att_blocks=tuple(self.global_att_blocks),
            window_pos_embed_bkg_spatial_size=tuple(self.window_spatial_size),
            window_spec=tuple(self.window_spec), dtype=self.dtype)
        self.neck = FpnNeck(
            d_model=self.hidden_dim,
            backbone_channel_list=tuple(self.backbone_channel_list),
            dtype=self.dtype)
        self.memory_attention = MemoryAttention(
            d_model=self.hidden_dim, num_layers=4, mem_dim=self.mem_dim,
            dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(
            out_dim=self.mem_dim, in_dim=self.hidden_dim, dtype=self.dtype)
        emb = self.image_size // self.backbone_stride
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=self.hidden_dim, image_embedding_size=(emb, emb),
            input_image_size=(self.image_size, self.image_size),
            dtype=self.dtype)
        self.sam_mask_decoder = SAM2MaskDecoder(
            transformer_dim=self.hidden_dim, dtype=self.dtype)
        # high-res skip projections (decoder conv_s0/s1, applied in
        # forward_image like the reference to cache them per frame)
        self.conv_s0 = nn.Conv(self.hidden_dim // 8, (1, 1), dtype=self.dtype)
        self.conv_s1 = nn.Conv(self.hidden_dim // 4, (1, 1), dtype=self.dtype)
        self.obj_ptr_proj = MLP(self.hidden_dim, self.hidden_dim, 3,
                                dtype=self.dtype)
        self.no_obj_ptr = self.param(
            "no_obj_ptr", nn.initializers.normal(0.02), (1, self.hidden_dim))
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (self.num_maskmem, 1, 1, self.mem_dim))
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (1, 1, self.hidden_dim))
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", nn.initializers.normal(0.02),
            (1, 1, self.hidden_dim))
        # downsamples a (0,1) mask prompt to SAM-logit scale for obj-ptr
        # extraction on mask-input frames (reference sam.py:251)
        self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4),
                                       dtype=self.dtype)

    # -- image encoding ------------------------------------------------------
    def encode_image(self, img):
        """img (B, S, S, 3) normalized. Returns (feat_s0, feat_s1, feat)
        NHWC with conv_s0/s1 already applied (reference forward_image)."""
        feats, _pos = self.neck(self.trunk(img))
        feats = feats[:-1]          # scalp=1: drop the lowest resolution
        return (self.conv_s0(feats[0]), self.conv_s1(feats[1]), feats[2])

    # -- SAM heads -----------------------------------------------------------
    def sam_heads(self, feat, points, labels, high_res_features,
                  multimask_output: bool, mask_prompt=None):
        """feat (B, h, w, C); points (B, P, 2) px / labels (B, P) with -1
        padding. Returns (low_res_multimasks, ious, low_res, high_res,
        obj_ptr, obj_logits) — reference _forward_sam_heads."""
        b, h, w, _ = feat.shape
        sparse, dense = self.sam_prompt_encoder(
            points=(points, labels),
            masks=mask_prompt)
        image_pe = self.sam_prompt_encoder.get_dense_pe()
        masks, ious, sam_tokens, obj_logits = self.sam_mask_decoder(
            feat, image_pe, sparse, dense, multimask_output,
            high_res_features=high_res_features)

        is_obj = obj_logits > 0.0
        masks = jnp.where(is_obj[:, :, None, None] > 0, masks, NO_OBJ_SCORE)
        hi = jax.image.resize(
            masks, (b, masks.shape[1], self.image_size, self.image_size),
            method="bilinear")

        if masks.shape[1] > 1:   # multimask: pick best by iou
            best = jnp.argmax(ious, -1)
            bidx = jnp.arange(b)
            low_res = masks[bidx, best][:, None]
            high_res = hi[bidx, best][:, None]
            sam_token = sam_tokens[bidx, jnp.minimum(best,
                                                     sam_tokens.shape[1] - 1)]
        else:
            low_res, high_res = masks, hi
            sam_token = sam_tokens[:, 0]

        obj_ptr = self.obj_ptr_proj(sam_token)
        lam = is_obj.astype(jnp.float32)
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return masks, ious, low_res, high_res, obj_ptr, obj_logits

    # -- memory --------------------------------------------------------------
    def encode_memory(self, feat, high_res_masks):
        """feat (B, h, w, C) top-level features; high_res_masks
        (B, S, S, 1) logits. Returns (mem_feat (B,h,w,mem), mem_pos)."""
        m = jax.nn.sigmoid(high_res_masks)
        m = m * self.sigmoid_scale_for_mem_enc + self.sigmoid_bias_for_mem_enc
        return self.memory_encoder(feat, m, skip_mask_sigmoid=True)

    def condition_features(self, feat, mem_spatial, mem_spatial_pos,
                           mem_valid, obj_ptrs, ptr_pos_idx, ptr_valid,
                           is_init: bool):
        """Fuse current features with the fixed-slot memory bank.

        feat (B, h, w, C); mem_spatial (B, M, h, w, mem); mem_spatial_pos
        same; mem_valid (B, M) bool; obj_ptrs (B, P, C); ptr_pos_idx (B, P)
        float temporal distances; ptr_valid (B, P) bool.
        """
        b, h, w, c = feat.shape
        curr = feat.reshape(b, h * w, c)
        curr_pos = position_embedding_sine(h, w, c).reshape(1, h * w, c)
        curr_pos = jnp.broadcast_to(curr_pos, curr.shape).astype(curr.dtype)
        if is_init:
            # directly_add_no_mem_embed (init conditioning frame)
            out = curr + self.no_mem_embed
            return out.reshape(b, h, w, c)

        m = self.num_maskmem
        mem = mem_spatial.reshape(b, m * h * w, self.mem_dim)
        # slot j holds temporal position j; tpos embedding index m - j - 1
        tpos = self.maskmem_tpos_enc[::-1].reshape(m, 1, self.mem_dim)
        mem_pos = (mem_spatial_pos.reshape(b, m, h * w, self.mem_dim)
                   + tpos[None]).reshape(b, m * h * w, self.mem_dim)
        k_mask_sp = jnp.repeat(mem_valid, h * w, axis=1)

        # object pointers: split C into C/mem_dim tokens each
        p = obj_ptrs.shape[1]
        splits = c // self.mem_dim
        ptr_tok = obj_ptrs.reshape(b, p, splits, self.mem_dim)
        ptr_tok = ptr_tok.reshape(b, p * splits, self.mem_dim)
        t_max = max(self.max_obj_ptrs - 1, 1)
        ptr_pe = get_1d_sine_pe(ptr_pos_idx / t_max, self.mem_dim)
        ptr_pe = jnp.repeat(ptr_pe, splits, axis=1)
        k_mask_ptr = jnp.repeat(ptr_valid, splits, axis=1)

        memory = jnp.concatenate([mem, ptr_tok.astype(mem.dtype)], 1)
        memory_pos = jnp.concatenate([mem_pos, ptr_pe.astype(mem.dtype)], 1)
        k_mask = jnp.concatenate([k_mask_sp, k_mask_ptr], 1)

        out = self.memory_attention(curr, memory, curr_pos, memory_pos,
                                    num_obj_ptr_tokens=p * splits,
                                    k_mask=k_mask)
        return out.reshape(b, h, w, c)

    def __call__(self, img, points, labels):
        """Single-image forward (init-frame semantics): encode, fuse with
        the no-mem embedding, run SAM heads multimask. Used for init and
        as the jit surface for parameter initialization."""
        s0, s1, feat = self.encode_image(img)
        feat = self.condition_features(
            feat, *self._empty_memory(feat), is_init=True)
        return self.sam_heads(feat, points, labels, (s0, s1), True)

    def _empty_memory(self, feat):
        b, h, w, _ = feat.shape
        m, p = self.num_maskmem, self.max_obj_ptrs
        return (jnp.zeros((b, m, h, w, self.mem_dim)),
                jnp.zeros((b, m, h, w, self.mem_dim)),
                jnp.zeros((b, m), bool),
                jnp.zeros((b, p, self.hidden_dim)),
                jnp.zeros((b, p), jnp.float32),
                jnp.zeros((b, p), bool))

    def init_aux(self, feat, s0, s1):
        """Initialization-only pass exercising the mask-prompt path, the
        memory attention/encoder, and the mask-downsample conv so every
        reference parameter materializes (flax creates params lazily)."""
        b, h, w, _ = feat.shape
        self.mask_downsample(
            jnp.zeros((b, 4 * h * 4, 4 * w * 4, 1), jnp.float32))
        mp = jnp.zeros((b, 4 * h, 4 * w, 1), jnp.float32)
        pts = jnp.zeros((b, 1, 2), jnp.float32)
        lab = -jnp.ones((b, 1), jnp.float32)
        out = self.sam_heads(feat, pts, lab, (s0, s1), False, mask_prompt=mp)
        feat2 = self.condition_features(feat, *self._empty_memory(feat),
                                        is_init=False)
        mem = self.encode_memory(feat, out[3][:, 0, :, :, None])
        return feat2, mem


# ---------------------------------------------------------------------------
# builders (reference build.py:69-118, 216-304)
# ---------------------------------------------------------------------------

SAM2_CONFIGS = {
    "sam2_t": dict(embed_dim=96, stages=(1, 2, 7, 2), num_heads=1,
                   global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7),
                   window_spatial_size=(7, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_s": dict(embed_dim=96, stages=(1, 2, 11, 2), num_heads=1,
                   global_att_blocks=(7, 10, 13), window_spec=(8, 4, 14, 7),
                   window_spatial_size=(7, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_b": dict(embed_dim=112, stages=(2, 3, 16, 3), num_heads=2,
                   global_att_blocks=(12, 16, 20), window_spec=(8, 4, 14, 7),
                   window_spatial_size=(14, 14),
                   backbone_channel_list=(896, 448, 224, 112)),
    "sam2_l": dict(embed_dim=144, stages=(2, 6, 36, 4), num_heads=2,
                   global_att_blocks=(23, 33, 43), window_spec=(8, 4, 16, 8),
                   window_spatial_size=(7, 7),
                   backbone_channel_list=(1152, 576, 288, 144)),
    # tiny config for tests: 2 blocks/stage at 128 px
    "sam2_test": dict(embed_dim=16, stages=(1, 1, 1, 1), num_heads=1,
                      global_att_blocks=(2,), window_spec=(8, 4, 4, 4),
                      window_spatial_size=(7, 7),
                      backbone_channel_list=(128, 64, 32, 16),
                      image_size=128, num_maskmem=3, max_obj_ptrs=4),
}


def build_sam2(variant: str = "sam2_t", image_size: int | None = None,
               dtype=jnp.float32, rng=None):
    """Construct a SAM2Net and init its variables. Returns (net, variables)."""
    cfg = dict(SAM2_CONFIGS[variant])
    if image_size is not None:
        cfg["image_size"] = image_size
    net = SAM2Net(dtype=dtype, **cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    s = cfg.get("image_size", 1024)
    variables = net.init(
        rng, jnp.zeros((1, s, s, 3), jnp.float32),
        jnp.zeros((1, 1, 2), jnp.float32), jnp.zeros((1, 1), jnp.float32))
    # second init pass: mask-prompt + memory paths (lazy-param materialize)
    h = s // 16
    hd = net.hidden_dim
    aux = net.init(
        jax.random.fold_in(rng, 1),
        jnp.zeros((1, h, h, hd), jnp.float32),
        jnp.zeros((1, 4 * h, 4 * h, hd // 8), jnp.float32),
        jnp.zeros((1, 2 * h, 2 * h, hd // 4), jnp.float32),
        method=SAM2Net.init_aux)
    # deep merge: the aux pass owns subtrees (e.g. the prompt encoder's
    # mask_downscaling) that the main pass only partially creates
    from flax.traverse_util import flatten_dict, unflatten_dict

    merged = {**flatten_dict(aux["params"]), **flatten_dict(variables["params"])}
    return net, {"params": unflatten_dict(merged)}


# ---------------------------------------------------------------------------
# predictors (reference predict.py SAM2Predictor / SAM2VideoPredictor)
# ---------------------------------------------------------------------------


class SAM2Predictor:
    """Prompted image segmentation with SAM2 (reference predict.py SAM2
    image path). API mirrors models/sam/model.py SAM."""

    MAX_POINTS = 8

    def __init__(self, variant: str = "sam2_t", image_size: int | None = None,
                 dtype=jnp.float32):
        self.net, self.variables = build_sam2(variant, image_size, dtype)
        self.img_size = self.net.image_size
        self._encode = jax.jit(
            lambda v, x: self.net.apply(v, x, method=SAM2Net.encode_image))
        self._heads = jax.jit(
            lambda v, feat, pts, lab, s0, s1: self.net.apply(
                v, feat, pts, lab, (s0, s1), True,
                method=SAM2Net.sam_heads))
        self._cond_init = jax.jit(
            lambda v, feat: self.net.apply(
                v, feat, *self.net._empty_memory(feat), is_init=True,
                method=SAM2Net.condition_features))
        self._feats = None
        self._orig_shape = None
        self._scale = 1.0

    def set_image(self, img_bgr: np.ndarray):
        import cv2

        h0, w0 = img_bgr.shape[:2]
        self._orig_shape = (h0, w0)
        self._scale = self.img_size / max(h0, w0)
        nh, nw = int(round(h0 * self._scale)), int(round(w0 * self._scale))
        img = cv2.resize(img_bgr, (nw, nh))
        canvas = np.zeros((self.img_size, self.img_size, 3), np.float32)
        canvas[:nh, :nw] = img[..., ::-1] / 255.0
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        canvas = (canvas - mean) / std
        self._feats = self._encode(self.variables, jnp.asarray(canvas[None]))
        return self

    def predict(self, points, labels=None):
        """points [[x, y], ...] in original px. Returns (masks (k, H0, W0)
        bool, iou (k,)) sorted by score."""
        assert self._feats is not None, "call set_image first"
        s0, s1, feat = self._feats
        feat = self._cond_init(self.variables, feat)
        pts = np.asarray(points, np.float32).reshape(1, -1, 2) * self._scale
        lab = (np.ones((1, pts.shape[1]), np.float32) if labels is None
               else np.asarray(labels, np.float32).reshape(1, -1))
        n = pts.shape[1]
        pts = np.pad(pts, ((0, 0), (0, self.MAX_POINTS - n), (0, 0)))
        lab = np.pad(lab, ((0, 0), (0, self.MAX_POINTS - n)),
                     constant_values=-1.0)
        masks, ious, *_ = self._heads(self.variables, feat,
                                      jnp.asarray(pts), jnp.asarray(lab),
                                      s0, s1)
        masks = np.asarray(masks[0], np.float32)
        ious = np.asarray(ious[0], np.float32)
        order = np.argsort(-ious)
        return self._postprocess(masks[order]), ious[order]

    def _postprocess(self, lowres):
        import cv2

        h0, w0 = self._orig_shape
        nh = int(round(h0 * self._scale))
        nw = int(round(w0 * self._scale))
        out = []
        for m in lowres:
            up = cv2.resize(m, (self.img_size, self.img_size))[:nh, :nw]
            out.append(cv2.resize(up, (w0, h0)) > 0)
        return np.stack(out)


class SAM2VideoPredictor:
    """Streaming video object segmentation (reference predict.py
    SAM2VideoPredictor + sam.py track_step). One fixed-shape executable per
    track step; host-side frame->memory dict like the reference output_dict."""

    def __init__(self, variant: str = "sam2_test",
                 image_size: int | None = None, dtype=jnp.float32):
        self.net, self.variables = build_sam2(variant, image_size, dtype)
        self.img_size = self.net.image_size
        net = self.net
        self._encode = jax.jit(
            lambda v, x: net.apply(v, x, method=SAM2Net.encode_image))
        self._heads = jax.jit(
            lambda v, feat, pts, lab, s0, s1, mm: net.apply(
                v, feat, pts, lab, (s0, s1), mm, method=SAM2Net.sam_heads),
            static_argnames=("mm",))
        self._cond = jax.jit(
            lambda v, feat, *mem: net.apply(
                v, feat, *mem, is_init=False,
                method=SAM2Net.condition_features))
        self._cond_init = jax.jit(
            lambda v, feat: net.apply(
                v, feat, *net._empty_memory(feat), is_init=True,
                method=SAM2Net.condition_features))
        self._encmem = jax.jit(
            lambda v, feat, hi: net.apply(v, feat, hi,
                                          method=SAM2Net.encode_memory))
        self.reset_state()

    def reset_state(self):
        self.cond_frames = {}        # frame_idx -> memory dict
        self.non_cond_frames = {}
        self.num_frames = 0

    def _frame_feats(self, frame: np.ndarray):
        import cv2

        img = cv2.resize(frame, (self.img_size, self.img_size))
        img = img[..., ::-1].astype(np.float32) / 255.0
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        img = (img - mean) / std
        return self._encode(self.variables, jnp.asarray(img[None]))

    def add_points(self, frame: np.ndarray, frame_idx: int, points, labels=None):
        """Add click prompts on a conditioning frame; returns its mask
        (H, W) bool at model resolution."""
        s0, s1, feat = self._frame_feats(frame)
        featc = self._cond_init(self.variables, feat)
        pts = np.asarray(points, np.float32).reshape(1, -1, 2)
        pts = pts * (self.img_size / max(frame.shape[:2]))
        lab = (np.ones((1, pts.shape[1]), np.float32) if labels is None
               else np.asarray(labels, np.float32).reshape(1, -1))
        _, _, low, hi, obj_ptr, _ = self._heads(
            self.variables, featc, jnp.asarray(pts), jnp.asarray(lab),
            s0, s1, True)
        mem_feat, mem_pos = self._encmem(self.variables, feat, hi[:, 0, :, :, None])
        self.cond_frames[frame_idx] = {
            "mem_feat": np.asarray(mem_feat), "mem_pos": np.asarray(mem_pos),
            "obj_ptr": np.asarray(obj_ptr)}
        self.num_frames = max(self.num_frames, frame_idx + 1)
        return np.asarray(hi[0, 0]) > 0

    def track(self, frame: np.ndarray, frame_idx: int):
        """Track the object into a new frame using the memory bank."""
        s0, s1, feat = self._frame_feats(frame)
        b, h, w, _ = feat.shape
        net = self.net
        m, p = net.num_maskmem, net.max_obj_ptrs

        mem_sp = np.zeros((b, m, h, w, net.mem_dim), np.float32)
        mem_pos = np.zeros((b, m, h, w, net.mem_dim), np.float32)
        mem_valid = np.zeros((b, m), bool)
        # slot 0: closest conditioning frame
        if self.cond_frames:
            tc = min(self.cond_frames, key=lambda t: abs(t - frame_idx))
            cf = self.cond_frames[tc]
            mem_sp[:, 0] = cf["mem_feat"]
            mem_pos[:, 0] = cf["mem_pos"]
            mem_valid[:, 0] = True
        # slots 1..m-1: previous frames, most recent in the last slot
        for t_pos in range(1, m):
            t_rel = m - t_pos
            prev = self.non_cond_frames.get(frame_idx - t_rel)
            if prev is not None:
                mem_sp[:, t_pos] = prev["mem_feat"]
                mem_pos[:, t_pos] = prev["mem_pos"]
                mem_valid[:, t_pos] = True

        ptrs = np.zeros((b, p, net.hidden_dim), np.float32)
        ptr_pos = np.zeros((b, p), np.float32)
        ptr_valid = np.zeros((b, p), bool)
        slot = 0
        for t, out in sorted(self.cond_frames.items()):
            if t <= frame_idx and slot < p:
                ptrs[:, slot] = out["obj_ptr"]
                ptr_pos[:, slot] = abs(frame_idx - t)
                ptr_valid[:, slot] = True
                slot += 1
        for dt in range(1, p - slot + 1):
            prev = self.non_cond_frames.get(frame_idx - dt)
            if prev is not None and slot < p:
                ptrs[:, slot] = prev["obj_ptr"]
                ptr_pos[:, slot] = dt
                ptr_valid[:, slot] = True
                slot += 1

        featc = self._cond(self.variables, feat, jnp.asarray(mem_sp),
                           jnp.asarray(mem_pos), jnp.asarray(mem_valid),
                           jnp.asarray(ptrs), jnp.asarray(ptr_pos),
                           jnp.asarray(ptr_valid))
        pts = np.zeros((1, 1, 2), np.float32)
        lab = -np.ones((1, 1), np.float32)
        _, _, low, hi, obj_ptr, obj_logits = self._heads(
            self.variables, featc, jnp.asarray(pts), jnp.asarray(lab),
            s0, s1, True)
        mem_feat, mem_pos_new = self._encmem(self.variables, feat,
                                             hi[:, 0, :, :, None])
        self.non_cond_frames[frame_idx] = {
            "mem_feat": np.asarray(mem_feat),
            "mem_pos": np.asarray(mem_pos_new),
            "obj_ptr": np.asarray(obj_ptr)}
        self.num_frames = max(self.num_frames, frame_idx + 1)
        return np.asarray(hi[0, 0]) > 0, float(obj_logits[0, 0])

    def propagate(self, frames, start_idx: int = 1):
        """Generator over (frame_idx, mask) for frames[start_idx:]."""
        for i in range(start_idx, len(frames)):
            mask, _score = self.track(frames[i], i)
            yield i, mask
