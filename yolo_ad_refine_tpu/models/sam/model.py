"""SAM model assembly, facade, and automatic mask generation.

Parity surface: reference models/sam/ — build.py (_build_sam vit-b/l/h
parameterization), modules/sam.py SAMModel (pixel mean/std preprocessing),
model.py SAM facade, predict.py Predictor (set_image -> prompt ->
postprocess) and the point-grid automatic mask generator with stability
filtering + NMS (amg.py).

TPU-native shape discipline: every prompt batch is padded to a fixed slot
count so one compiled decoder serves any prompt set; the image encoder is
jitted once at 1024px. Weights import from torch SAM checkpoints via
utils/torch_import naming.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_ad_refine_tpu.models.sam.modules import (
    ImageEncoderViT,
    MaskDecoder,
    PromptEncoder,
)

PIXEL_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


class SAMModel(nn.Module):
    """Encoder + prompt encoder + decoder (reference modules/sam.py SAMModel).

    __call__(image) -> image embeddings; decode() -> masks given embeddings.
    """

    img_size: int = 1024
    encoder_type: str = "vit"           # 'vit' | 'tiny' (mobile_sam TinyViT)
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    prompt_embed_dim: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        g = self.img_size // 16
        if self.encoder_type == "tiny":
            from yolo_ad_refine_tpu.models.sam.tiny_encoder import TinyViT

            self.image_encoder = TinyViT(img_size=self.img_size,
                                         dtype=self.dtype)
        else:
            self.image_encoder = ImageEncoderViT(
                img_size=self.img_size, embed_dim=self.encoder_embed_dim,
                depth=self.encoder_depth, num_heads=self.encoder_num_heads,
                global_attn_indexes=self.encoder_global_attn_indexes,
                out_chans=self.prompt_embed_dim, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim, image_embedding_size=(g, g),
            input_image_size=(self.img_size, self.img_size), dtype=self.dtype)
        self.mask_decoder = MaskDecoder(transformer_dim=self.prompt_embed_dim,
                                        dtype=self.dtype)

    def __call__(self, image):
        """image (B, S, S, 3) RGB uint8/float -> embeddings (B, g, g, 256)."""
        x = (image.astype(jnp.float32) - PIXEL_MEAN) / PIXEL_STD
        return self.image_encoder(x.astype(self.dtype))

    def decode(self, embeddings, points=None, boxes=None, masks=None,
               multimask_output: bool = True):
        sparse, dense = self.prompt_encoder(points=points, boxes=boxes,
                                            masks=masks)
        return self.mask_decoder(embeddings, self.prompt_encoder.get_dense_pe(),
                                 sparse, dense, multimask_output)


SAM_VARIANTS = {
    # reference build.py:23-54
    "sam_b": dict(encoder_embed_dim=768, encoder_depth=12,
                  encoder_num_heads=12, encoder_global_attn_indexes=(2, 5, 8, 11)),
    "sam_l": dict(encoder_embed_dim=1024, encoder_depth=24,
                  encoder_num_heads=16, encoder_global_attn_indexes=(5, 11, 17, 23)),
    "sam_h": dict(encoder_embed_dim=1280, encoder_depth=32,
                  encoder_num_heads=16, encoder_global_attn_indexes=(7, 15, 23, 31)),
    # mobile_sam (reference build.py:56-66, TinyViT trunk)
    "mobile_sam": dict(encoder_type="tiny"),
    # tiny config for tests (not a reference variant)
    "sam_test": dict(encoder_embed_dim=32, encoder_depth=2,
                     encoder_num_heads=2, encoder_global_attn_indexes=(1,)),
}


def build_sam(variant: str = "sam_b", img_size: int = 1024, dtype=jnp.float32,
              seed: int = 0):
    """Construct + init a SAMModel. Returns (module, variables)."""
    cfg = SAM_VARIANTS[variant]
    model = SAMModel(img_size=img_size, dtype=dtype, **cfg)
    g4 = 4 * (img_size // 16)
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, img_size, img_size, 3), jnp.float32),
        method=None,
    )
    # materialize decoder/prompt params too (separate init pass via decode)
    emb = jnp.zeros((1, img_size // 16, img_size // 16, 256), dtype)
    dec_vars = model.init(
        jax.random.PRNGKey(seed + 1), emb,
        points=(jnp.zeros((1, 1, 2)), jnp.ones((1, 1))),
        masks=jnp.zeros((1, g4, g4, 1), jnp.float32),
        method=SAMModel.decode,
    )
    out = {"params": {**dec_vars["params"], **variables["params"]}}
    for coll in set(variables) | set(dec_vars):
        if coll == "params":
            continue
        out[coll] = {**dec_vars.get(coll, {}), **variables.get(coll, {})}
    return model, out


class SAM:
    """User facade (reference model.py SAM + predict.py Predictor).

    >>> sam = SAM(variant="sam_b", img_size=512)
    >>> sam.set_image(img_bgr)
    >>> masks, scores = sam.predict(points=[[320, 240]], labels=[1])
    """

    MAX_POINTS = 8  # fixed prompt slots (static shapes under jit)

    def __init__(self, variant: str = "sam_b", img_size: int = 1024,
                 dtype=jnp.float32, seed: int = 0):
        self.variant = variant
        self.img_size = img_size
        self.model, self.variables = build_sam(variant, img_size, dtype, seed)
        self._encode = jax.jit(
            lambda v, im: self.model.apply(v, im))
        self._decode_pts = jax.jit(
            lambda v, emb, pts, lab, mm: self.model.apply(
                v, emb, points=(pts, lab), multimask_output=mm,
                method=SAMModel.decode),
            static_argnames=("mm",))
        self._decode_box = jax.jit(
            lambda v, emb, box, mm: self.model.apply(
                v, emb, boxes=box, multimask_output=mm,
                method=SAMModel.decode),
            static_argnames=("mm",))
        self._embeddings = None
        self._last_lowres = None
        self._orig_shape = None
        self._scale = 1.0

    # -- reference predict.py set_image -------------------------------------
    def set_image(self, img_bgr: np.ndarray):
        """Resize longest side to img_size, pad bottom/right, encode."""
        import cv2

        h0, w0 = img_bgr.shape[:2]
        self._orig_shape = (h0, w0)
        self._scale = self.img_size / max(h0, w0)
        nh, nw = int(round(h0 * self._scale)), int(round(w0 * self._scale))
        img = cv2.resize(img_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((self.img_size, self.img_size, 3), np.uint8)
        canvas[:nh, :nw] = img[..., ::-1]  # BGR -> RGB
        self._embeddings = self._encode(self.variables, jnp.asarray(canvas[None]))
        return self

    def predict(self, points=None, labels=None, box=None,
                multimask_output: bool = True):
        """Prompted mask prediction on the set image. Returns
        (masks (k, H0, W0) bool, iou_scores (k,)) sorted by score."""
        assert self._embeddings is not None, "call set_image first"
        if box is not None:
            b = np.asarray(box, np.float32).reshape(1, 2, 2) * self._scale
            masks, iou = self._decode_box(
                self.variables, self._embeddings, jnp.asarray(b),
                multimask_output)
        else:
            pts = np.asarray(points, np.float32).reshape(1, -1, 2) * self._scale
            lab = (np.ones((1, pts.shape[1]), np.float32) if labels is None
                   else np.asarray(labels, np.float32).reshape(1, -1))
            n = pts.shape[1]
            assert n <= self.MAX_POINTS, f"max {self.MAX_POINTS} points"
            pts = np.pad(pts, ((0, 0), (0, self.MAX_POINTS - n), (0, 0)))
            lab = np.pad(lab, ((0, 0), (0, self.MAX_POINTS - n)),
                         constant_values=-1.0)
            masks, iou = self._decode_pts(
                self.variables, self._embeddings, jnp.asarray(pts),
                jnp.asarray(lab), multimask_output)
        masks = np.asarray(masks[0], np.float32)      # (k, 4g, 4g) logits
        iou = np.asarray(iou[0], np.float32)
        order = np.argsort(-iou)
        # keep the low-res logits in the SAME sorted order as the returned
        # masks so generate()'s stability scoring reads the right candidate
        self._last_lowres = masks[order]
        return self._postprocess(masks[order]), iou[order]

    def _postprocess(self, lowres_masks: np.ndarray) -> np.ndarray:
        """Low-res logits -> original-resolution boolean masks
        (reference predict.py postprocess: upsample to img_size, strip the
        pad, resize to the original shape, threshold at 0)."""
        import cv2

        h0, w0 = self._orig_shape
        nh = int(round(h0 * self._scale))
        nw = int(round(w0 * self._scale))
        out = []
        for m in lowres_masks:
            up = cv2.resize(m, (self.img_size, self.img_size),
                            interpolation=cv2.INTER_LINEAR)[:nh, :nw]
            out.append(cv2.resize(up, (w0, h0),
                                  interpolation=cv2.INTER_LINEAR) > 0)
        return np.stack(out)

    # -- reference predict.py generate / amg.py ------------------------------
    def generate(self, img_bgr: np.ndarray, points_per_side: int = 8,
                 pred_iou_thresh: float = 0.6, stability_score_thresh: float = 0.7,
                 stability_offset: float = 1.0, nms_iou: float = 0.7):
        """Automatic mask generation: point grid -> multimask decode ->
        quality + stability filtering -> box NMS. Returns list of dicts
        with 'segmentation', 'bbox', 'predicted_iou', 'stability_score'."""
        self.set_image(img_bgr)
        h0, w0 = self._orig_shape
        step_x, step_y = w0 / points_per_side, h0 / points_per_side
        cands = []
        for iy in range(points_per_side):
            for ix in range(points_per_side):
                px, py = (ix + 0.5) * step_x, (iy + 0.5) * step_y
                masks, iou = self.predict(points=[[px, py]],
                                          multimask_output=True)
                # stability: IoU between masks thresholded at +/- offset.
                # _last_lowres is the score-sorted logits stash from
                # predict() — same permutation as masks/iou.
                for m_bool, score, logits in zip(
                        masks, iou, self._last_lowres):
                    if score < pred_iou_thresh:
                        continue
                    hi = logits > stability_offset
                    lo = logits > -stability_offset
                    stability = hi.sum() / max(lo.sum(), 1)
                    if stability < stability_score_thresh:
                        continue
                    if not m_bool.any():
                        continue
                    ys, xs = np.nonzero(m_bool)
                    bbox = [int(xs.min()), int(ys.min()),
                            int(xs.max()), int(ys.max())]
                    cands.append({"segmentation": m_bool, "bbox": bbox,
                                  "predicted_iou": float(score),
                                  "stability_score": float(stability)})
        return self._nms(cands, nms_iou)

    @staticmethod
    def _nms(cands: list, iou_thres: float) -> list:
        cands = sorted(cands, key=lambda c: -c["predicted_iou"])
        kept = []
        for c in cands:
            x1, y1, x2, y2 = c["bbox"]
            a = max(0, x2 - x1) * max(0, y2 - y1)
            ok = True
            for k in kept:
                kx1, ky1, kx2, ky2 = k["bbox"]
                iw = max(0, min(x2, kx2) - max(x1, kx1))
                ih = max(0, min(y2, ky2) - max(y1, ky1))
                inter = iw * ih
                ka = max(0, kx2 - kx1) * max(0, ky2 - ky1)
                if inter / max(a + ka - inter, 1e-9) > iou_thres:
                    ok = False
                    break
            if ok:
                kept.append(c)
        return kept
