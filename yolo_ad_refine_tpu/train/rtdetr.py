"""RT-DETR training: DETR loss (Hungarian matching) + contrastive denoising.

Parity surface:
- reference models/utils/loss.py:13-289 (DETRLoss: focal/varifocal class loss,
  L1 + GIoU box losses, per-layer auxiliary losses) and :292-358
  (RTDETRDetectionLoss: extra denoising branch with fixed match indices),
- reference models/utils/ops.py:12-117 (HungarianMatcher: focal class cost +
  L1 + GIoU, scipy linear_sum_assignment) and :150-259 (get_cdn_group:
  contrastive denoising query groups),
- reference nn/tasks.py RTDETRDetectionModel.loss (enc output prepended as
  aux level 0; dn split from the decoder output).

TPU-first differences:
- the Hungarian solve runs ON DEVICE under jit (ops/lap.py) instead of a
  scipy host round-trip per image per level;
- everything is fixed-shape: GT slots are (B, max_boxes) masked rows, the
  denoising group layout is static (group_size = max_boxes, num_group =
  max(1, num_dn // group_size)) instead of sized by the batch max GT count,
  so one XLA program serves every batch. The reference re-sizes dn groups per
  batch (ops.py:179-184); with a static layout the padding is just masked.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.ops.boxes import xywh2xyxy, xyxy2xywh
from yolo_ad_refine_tpu.ops.iou import bbox_iou
from yolo_ad_refine_tpu.ops.lap import linear_sum_assignment
from yolo_ad_refine_tpu.train.loss import LossOutputs, bce_with_logits


class DNConfig(NamedTuple):
    """Static contrastive-denoising layout (reference get_cdn_group)."""

    group_size: int   # GT slots per half-group (= max_boxes)
    num_group: int    # number of (positive, negative) group pairs
    cls_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0

    @property
    def ndn(self) -> int:
        return 2 * self.group_size * self.num_group


def make_dn_config(max_boxes: int, num_dn: int = 100) -> DNConfig:
    return DNConfig(group_size=max_boxes, num_group=max(1, num_dn // max_boxes))


def build_dn_attn_blocked(cfg: DNConfig, nq: int) -> np.ndarray:
    """Static (T, T) bool mask, True = attention BLOCKED (torch convention;
    reference ops.py:235-247). dn groups are mutually blind; matching queries
    cannot see dn queries; dn queries can see matching queries."""
    ndn = cfg.ndn
    t = ndn + nq
    blocked = np.zeros((t, t), bool)
    blocked[ndn:, :ndn] = True
    s2 = 2 * cfg.group_size
    for g in range(cfg.num_group):
        r = slice(g * s2, (g + 1) * s2)
        blocked[r, : g * s2] = True
        blocked[r, (g + 1) * s2 : ndn] = True
    return blocked


def make_cdn_group(cls, bboxes_xyxy_px, mask, rng, *, nc: int, imgsz: float,
                   cfg: DNConfig, attn_blocked: jnp.ndarray) -> dict:
    """Build the fixed-shape denoising query group (reference ops.py:150).

    cls (B,M,1), bboxes (B,M,4) xyxy px, mask (B,M,1). Returns a dict consumed
    by RTDETRDecoder: dn class ids, noised box logits, validity, attn mask.
    """
    b, m = cls.shape[:2]
    s, g = cfg.group_size, cfg.num_group
    assert m == s, f"dn group_size ({s}) must equal max_boxes ({m})"
    maskf = mask.reshape(b, m)
    gt_cls = cls.reshape(b, m).astype(jnp.int32)
    gt_xywh = xyxy2xywh(bboxes_xyxy_px) / imgsz  # (B, M, 4) normalized

    # tile to (B, G, 2, S): axis 2 = (positive, negative)
    tile = lambda x: jnp.broadcast_to(x[:, None, None], (b, g, 2, *x.shape[1:]))  # noqa: E731
    dn_cls = tile(gt_cls)
    dn_box = tile(gt_xywh)
    dn_valid = tile(maskf)

    r_cls, r_new, r_sign, r_part = jax.random.split(rng, 4)
    if cfg.cls_noise_ratio > 0:
        flip = jax.random.uniform(r_cls, dn_cls.shape) < (cfg.cls_noise_ratio * 0.5)
        new_label = jax.random.randint(r_new, dn_cls.shape, 0, nc)
        dn_cls = jnp.where(flip, new_label, dn_cls)

    if cfg.box_noise_scale > 0:
        known = xywh2xyxy(dn_box)
        diff = jnp.tile(dn_box[..., 2:4] * 0.5, (1, 1, 1, 1, 2)) * cfg.box_noise_scale
        sign = jax.random.randint(r_sign, known.shape, 0, 2) * 2.0 - 1.0
        part = jax.random.uniform(r_part, known.shape)
        is_neg = jnp.zeros((1, 1, 2, 1, 1)).at[:, :, 1].set(1.0)  # negatives: [1, 2)
        part = (part + is_neg) * sign
        known = jnp.clip(known + part * diff, 0.0, 1.0)
        dn_box = xyxy2xywh(known)
    dn_box = jnp.clip(dn_box, 1e-6, 1 - 1e-6)
    dn_box_logit = jnp.log(dn_box / (1.0 - dn_box))  # torch.logit(eps=1e-6)

    ndn = cfg.ndn
    return {
        "cls": dn_cls.reshape(b, ndn),
        "bbox_logit": (dn_box_logit * dn_valid[..., None]).reshape(b, ndn, 4),
        "valid": dn_valid.reshape(b, ndn),
        "attn_blocked": attn_blocked,
    }


# ---------------------------------------------------------------------------
# DETR loss
# ---------------------------------------------------------------------------


def _focal_loss(logits, one_hot, gamma: float = 1.5, alpha: float = 0.25):
    """Reference utils/loss.py FocalLoss: per-element, then .mean(1).sum()."""
    loss = bce_with_logits(logits, one_hot)
    p = jax.nn.sigmoid(logits)
    p_t = one_hot * p + (1.0 - one_hot) * (1.0 - p)
    loss = loss * (1.0 - p_t) ** gamma
    loss = loss * (one_hot * alpha + (1.0 - one_hot) * (1.0 - alpha))
    return loss.mean(axis=1).sum()


def _varifocal_loss(logits, gt_scores, one_hot, alpha: float = 0.75, gamma: float = 2.0):
    """Reference utils/loss.py VarifocalLoss (fp32 bce, .mean(1).sum())."""
    p = jax.nn.sigmoid(logits)
    weight = alpha * p**gamma * (1.0 - one_hot) + gt_scores * one_hot
    return (bce_with_logits(logits.astype(jnp.float32), gt_scores) * weight).mean(axis=1).sum()


class RTDETRLoss:
    """Fixed-shape DETR loss over all decoder levels + encoder aux + denoising.

    __call__(preds, cls, bboxes, mask) follows the framework loss signature
    (train/step.py): preds = (dec_bboxes (L,B,T,4), dec_scores (L,B,T,nc),
    enc_bboxes (B,nq,4), enc_scores (B,nq,nc)); T = nq, or ndn+nq when the
    denoising group is active. cls (B,M,1); bboxes (B,M,4) xyxy px;
    mask (B,M,1).
    """

    def __init__(self, nc: int, nq: int = 300, imgsz: float = 640.0,
                 max_boxes: int = 128, num_dn: int = 100, use_vfl: bool = True,
                 gain_class: float = 1.0, gain_bbox: float = 5.0, gain_giou: float = 2.0,
                 cost_class: float = 2.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
                 # trainer-facing aliases (ignored; RT-DETR uses DETR gains)
                 box_gain: float | None = None, cls_gain: float | None = None,
                 dfl_gain: float | None = None):
        self.nc = nc
        self.nq = nq
        self.imgsz = float(imgsz)
        self.use_vfl = use_vfl
        self.gain = (gain_class, gain_bbox, gain_giou)
        self.cost = (cost_class, cost_bbox, cost_giou)
        self.dn_cfg = make_dn_config(max_boxes, num_dn)

    # -- matcher ------------------------------------------------------------
    def match(self, pred_bboxes, pred_scores, gt_cls, gt_bboxes, gt_mask):
        """HungarianMatcher (reference models/utils/ops.py:46-117), batched.
        All preds detached. Returns match_q (B, M): query index per GT slot."""
        pb = jax.lax.stop_gradient(pred_bboxes.astype(jnp.float32))
        ps = jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores.astype(jnp.float32)))
        # focal classification cost at the GT class (alpha=0.25, gamma=2.0)
        psc = jnp.take_along_axis(ps, gt_cls[:, None, :].astype(jnp.int32),
                                  axis=2)  # (B, nq, M)
        neg = (1 - 0.25) * psc**2.0 * (-jnp.log(1 - psc + 1e-8))
        pos = 0.25 * (1 - psc) ** 2.0 * (-jnp.log(psc + 1e-8))
        cost_class = pos - neg
        l1 = jnp.abs(pb[:, :, None, :] - gt_bboxes[:, None, :, :]).sum(-1)
        giou = bbox_iou(pb[:, :, None, :], gt_bboxes[:, None, :, :], xywh=True, GIoU=True)
        c = self.cost[0] * cost_class + self.cost[1] * l1 + self.cost[2] * (1.0 - giou)
        c = jnp.nan_to_num(c, nan=0.0, posinf=0.0, neginf=0.0)
        return linear_sum_assignment(c.transpose(0, 2, 1), gt_mask)

    # -- one level ----------------------------------------------------------
    def level_loss(self, pred_bboxes, pred_scores, gt_cls, gt_bboxes, gt_mask,
                   match_q):
        """Class + L1 + GIoU losses for one prediction level, fixed shapes
        (reference DETRLoss._get_loss, loss.py:217-251)."""
        b, nq = pred_scores.shape[:2]
        maskf = gt_mask.astype(jnp.float32)
        num_gts = maskf.sum()
        denom = jnp.maximum(num_gts, 1.0)

        b_idx = jnp.arange(b)[:, None]
        idx = jnp.where(gt_mask > 0, match_q, nq)  # padded GTs -> overflow slot
        targets = jnp.full((b, nq + 1), self.nc, jnp.int32)
        targets = targets.at[b_idx, idx].set(gt_cls.astype(jnp.int32))[:, :nq]
        one_hot = jax.nn.one_hot(targets, self.nc + 1)[..., :-1]

        pb = jnp.take_along_axis(pred_bboxes, match_q[..., None], axis=1)  # (B, M, 4)
        iou_m = bbox_iou(jax.lax.stop_gradient(pb), gt_bboxes, xywh=True)
        gt_sc = jnp.zeros((b, nq + 1), jnp.float32)
        gt_sc = gt_sc.at[b_idx, idx].set(iou_m * maskf)[:, :nq]

        logits = pred_scores.astype(jnp.float32)
        vfl = _varifocal_loss(logits, gt_sc[..., None] * one_hot, one_hot)
        fl = _focal_loss(logits, one_hot)
        # reference: vfl when num_gts > 0 else focal (loss.py:78-81)
        loss_cls = jnp.where(num_gts > 0, vfl, fl) if self.use_vfl else fl
        loss_cls = loss_cls / denom * nq

        diff = jnp.abs(pb.astype(jnp.float32) - gt_bboxes) * maskf[..., None]
        loss_bbox = diff.sum() / denom
        giou = bbox_iou(pb.astype(jnp.float32), gt_bboxes, xywh=True, GIoU=True)
        loss_giou = ((1.0 - giou) * maskf).sum() / denom

        g = self.gain
        return g[0] * loss_cls, g[1] * loss_bbox, g[2] * loss_giou

    # -- full loss ----------------------------------------------------------
    def __call__(self, preds, cls, bboxes, mask) -> LossOutputs:
        dec_bboxes, dec_scores, enc_bboxes, enc_scores = preds[:4]
        b, m = cls.shape[:2]
        gt_cls = cls.reshape(b, m)
        gt_mask = mask.reshape(b, m)
        gt_b = (xyxy2xywh(bboxes[..., :4]) / self.imgsz).astype(jnp.float32)

        t = dec_bboxes.shape[2]
        dn_active = t > self.nq
        if dn_active:
            ndn = self.dn_cfg.ndn
            assert t == ndn + self.nq, f"unexpected query count {t}"
            dn_bboxes, dec_bboxes = dec_bboxes[:, :, :ndn], dec_bboxes[:, :, ndn:]
            dn_scores, dec_scores = dec_scores[:, :, :ndn], dec_scores[:, :, ndn:]

        # enc output is aux level 0 (reference tasks.py: cat([enc.unsqueeze(0), dec]))
        levels_b = [enc_bboxes] + [dec_bboxes[i] for i in range(dec_bboxes.shape[0])]
        levels_s = [enc_scores] + [dec_scores[i] for i in range(dec_scores.shape[0])]

        total_cls = total_bbox = total_giou = 0.0
        main = None
        for lb, ls in zip(levels_b, levels_s):
            match_q = self.match(lb, ls, gt_cls, gt_b, gt_mask)
            out = self.level_loss(lb, ls, gt_cls, gt_b, gt_mask, match_q)
            total_cls, total_bbox, total_giou = (
                total_cls + out[0], total_bbox + out[1], total_giou + out[2]
            )
            main = out  # last level = the main loss (reference forward)

        if dn_active:
            # fixed dn match: positive slot (g, j) <-> gt j (reference
            # RTDETRDetectionLoss.get_dn_match_indices, loss.py:334-358)
            s, g = self.dn_cfg.group_size, self.dn_cfg.num_group
            gt_cls_t = jnp.tile(gt_cls, (1, g))
            gt_b_t = jnp.tile(gt_b, (1, g, 1))
            gt_mask_t = jnp.tile(gt_mask, (1, g))
            slot = (jnp.arange(g)[:, None] * 2 * s + jnp.arange(s)[None, :]).reshape(-1)
            match_dn = jnp.broadcast_to(slot[None], (b, g * s))
            for i in range(dn_bboxes.shape[0]):
                out = self.level_loss(dn_bboxes[i], dn_scores[i], gt_cls_t, gt_b_t,
                                      gt_mask_t, match_dn)
                total_cls, total_bbox, total_giou = (
                    total_cls + out[0], total_bbox + out[1], total_giou + out[2]
                )

        total = total_cls + total_bbox + total_giou
        components = jax.lax.stop_gradient(
            jnp.stack([main[2], main[0], main[1]])  # [giou, class, bbox] shown
        )
        return LossOutputs(total, components)
