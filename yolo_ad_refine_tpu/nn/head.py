"""Detection heads: stock Detect and the fork's AYHead.

Parity surface (behavior): reference ultralytics/nn/modules/head.py
- Detect:21-163 (cv2 reg / cv3 cls branches, DFL decode, bias init)
- AYHead (=AYHead1):1049-1252 — decoupled head with TaskDecomposition (TOOD
  dynamic layer attention, head.py:626), CrossTaskInteraction:722,
  DyDCNv2 modulated-deformable alignment:751, CoordAtt:671,
  ResidualBlockGN:1031, foreground-probability gating of cls logits, and
  learnable per-level Scale:783 on the reg output.

Contract (identical to the reference, WENTI notes): training forward returns
the per-level raw feature list; eval forward returns ``(y, feats)`` where
``y`` is (B, N, 4+nc) decoded xywh boxes (in input pixels) + sigmoided class
scores. Strides are static attributes ([8, 16, 32] defaults for AYHead; the
model builder probes them for Detect — reference tasks.py:335-349).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_ad_refine_tpu.nn.common import BatchNorm, Conv, ConvGN, DWConv, conv2d, dfl_decode, hardswish, silu
from yolo_ad_refine_tpu.nn.registry import register
from yolo_ad_refine_tpu.ops.anchors import dist2bbox, make_anchors
from yolo_ad_refine_tpu.ops.deform import modulated_deform_conv2d

Dtype = Any

HEAD_NAMES = ("Detect", "AYHead")  # modules treated as detection heads by the parser


def decode_detections(feats_nhwc, strides, nc: int, reg_max: int = 16):
    """Shared eval-time decode: per-level (B,H,W,no) -> (B, N, 4+nc).

    Boxes are xywh in input-image pixels; scores are sigmoided.
    Mirrors Detect._inference / AYHead.forward eval path.
    """
    b = feats_nhwc[0].shape[0]
    no = 4 * reg_max + nc
    flat = [f.reshape(b, -1, no) for f in feats_nhwc]
    x_cat = jnp.concatenate(flat, axis=1)  # (B, N, no)
    box, cls = x_cat[..., : 4 * reg_max], x_cat[..., 4 * reg_max :]
    shapes = [(f.shape[1], f.shape[2]) for f in feats_nhwc]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    dist = dfl_decode(box, reg_max)  # (B, N, 4) float32
    dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
    return jnp.concatenate([dbox, nn.sigmoid(cls.astype(jnp.float32))], axis=-1)


@register
class Detect(nn.Module):
    """Stock YOLO11 anchor-free detect head (reference head.py:21-163)."""

    nc: int = 80
    ch: tuple = ()
    strides: tuple = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False, input_h: int | None = None,
                 decode: bool | None = None):
        # decode defaults to eval-mode; subclass-style heads (Segment/Pose/OBB)
        # pass decode=False to get raw per-level maps while keeping BN in the
        # caller's train/eval mode
        if decode is None:
            decode = not train
        nl = len(self.ch)
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outputs = []
        for i, x in enumerate(xs):
            r = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            r = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(r, train)
            r = nn.Conv(
                4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                bias_init=nn.initializers.ones, name=f"cv2_{i}_2",
            )(r)
            # YOLO11 cls branch: 2x (DWConv 3x3 + Conv 1x1) then 1x1 logits.
            # Names mirror the torch Sequential flattening (cv3.{i}.{j}.{k})
            # so utils/torch_import maps state_dicts mechanically.
            cin = x.shape[-1]
            s = Conv(cin, 3, g=cin, dtype=self.dtype, name=f"cv3_{i}_0_0")(x, train)
            s = Conv(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(s, train)
            s = Conv(c3, 3, g=c3, dtype=self.dtype, name=f"cv3_{i}_1_0")(s, train)
            s = Conv(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(s, train)
            cls_bias = math.log(5 / self.nc / (640 / self.strides[i]) ** 2)
            s = nn.Conv(
                self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                bias_init=nn.initializers.constant(cls_bias), name=f"cv3_{i}_2",
            )(s)
            outputs.append(jnp.concatenate([r, s], axis=-1))
        assert nl == len(outputs)
        if not decode:
            return outputs
        strides = (
            tuple(input_h // f.shape[1] for f in outputs) if input_h is not None else self.strides
        )
        y = decode_detections(outputs, strides, self.nc, self.reg_max)
        return y, outputs


@register
class v10Detect(nn.Module):
    """YOLOv10 end-to-end head (reference head.py:564): light depthwise cls
    branch, dual one2many/one2one predictions, NMS-free top-k selection at
    eval (consistent dual assignment is a training-time concern).
    """

    nc: int = 80
    ch: tuple = ()
    strides: tuple = (8, 16, 32)
    reg_max: int = 16
    max_det: int = 300
    dtype: Dtype = jnp.float32

    def _branches(self, xs, suffix: str, train: bool):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outputs = []
        for i, x in enumerate(xs):
            r = Conv(c2, 3, dtype=self.dtype, name=f"cv2{suffix}_{i}_0")(x, train)
            r = Conv(c2, 3, dtype=self.dtype, name=f"cv2{suffix}_{i}_1")(r, train)
            r = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                        bias_init=nn.initializers.ones, name=f"cv2{suffix}_{i}_2")(r)
            cin = x.shape[-1]
            s = Conv(cin, 3, g=cin, dtype=self.dtype, name=f"cv3{suffix}_{i}_0_0")(x, train)
            s = Conv(c3, 1, dtype=self.dtype, name=f"cv3{suffix}_{i}_0_1")(s, train)
            s = Conv(c3, 3, g=c3, dtype=self.dtype, name=f"cv3{suffix}_{i}_1_0")(s, train)
            s = Conv(c3, 1, dtype=self.dtype, name=f"cv3{suffix}_{i}_1_1")(s, train)
            cls_bias = math.log(5 / self.nc / (640 / self.strides[i]) ** 2)
            s = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                        bias_init=nn.initializers.constant(cls_bias),
                        name=f"cv3{suffix}_{i}_2")(s)
            outputs.append(jnp.concatenate([r, s], axis=-1))
        return outputs

    @nn.compact
    def __call__(self, xs, train: bool = False, input_h: int | None = None):
        one2many = self._branches(xs, "", train)
        one2one = self._branches([jax.lax.stop_gradient(x) for x in xs], "_one2one", train)
        if train:
            return {"one2many": one2many, "one2one": one2one}
        strides = (
            tuple(input_h // f.shape[1] for f in one2one) if input_h is not None else self.strides
        )
        y = decode_detections(one2one, strides, self.nc, self.reg_max)  # (B, N, 4+nc)
        # NMS-free: top max_det by best class score (reference v10postprocess)
        scores = jnp.max(y[..., 4:], axis=-1)
        top_s, idx = jax.lax.top_k(scores, min(self.max_det, scores.shape[-1]))
        boxes = jnp.take_along_axis(y[..., :4], idx[..., None], axis=1)
        cls = jnp.argmax(jnp.take_along_axis(y[..., 4:], idx[..., None], axis=1), axis=-1)
        det = jnp.concatenate(
            [boxes, top_s[..., None], cls[..., None].astype(y.dtype)], axis=-1
        )  # (B, max_det, 6) xywh px + conf + cls
        return det, {"one2many": one2many, "one2one": one2one}


@register
class WorldDetect(nn.Module):
    """Open-vocabulary head (reference head.py:279): the cls branch projects
    into a text-embedding space and scores against per-class text features
    (BNContrastiveHead). Text embeddings are an input (any encoder works —
    the reference uses CLIP, unavailable offline)."""

    nc: int = 80
    embed: int = 512
    with_bn: bool = True
    ch: tuple = ()
    strides: tuple = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, text_feats=None, train: bool = False, input_h: int | None = None):
        """text_feats: (nc, embed) class text embeddings (L2-normalized)."""
        if text_feats is None:
            text_feats = self.param(
                "default_text", nn.initializers.normal(0.02), (self.nc, self.embed), jnp.float32
            )
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outputs = []
        for i, x in enumerate(xs):
            r = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            r = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(r, train)
            r = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                        bias_init=nn.initializers.ones, name=f"cv2_{i}_2")(r)
            # embed branch = reference's overridden cv3 (head.py:286); the
            # per-level contrastive head is cv4.{i} (block.py:526-566)
            e = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            e = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(e, train)
            e = nn.Conv(self.embed, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"cv3_{i}_2")(e)
            e32 = e.astype(jnp.float32)
            if self.with_bn:
                # BNContrastiveHead: batch norm REPLACES image-side L2 norm
                e32 = BatchNorm(use_running_average=not train,
                                   dtype=jnp.float32,
                                   name=f"cv4_{i}_norm")(e32)
                ls_init = -1.0
            else:
                e32 = e32 / (jnp.linalg.norm(e32, axis=-1, keepdims=True) + 1e-12)
                ls_init = float(np.log(1.0 / 0.07))
            logit_scale = self.param(f"cv4_{i}_logit_scale",
                                     nn.initializers.constant(ls_init), (), jnp.float32)
            bias = self.param(f"cv4_{i}_bias",
                              nn.initializers.constant(-10.0), (1,), jnp.float32)
            t = text_feats / (jnp.linalg.norm(text_feats, axis=-1, keepdims=True) + 1e-12)
            logits = jnp.einsum("bhwe,ce->bhwc", e32, t) * jnp.exp(logit_scale) + bias
            outputs.append(jnp.concatenate([r, logits.astype(r.dtype)], axis=-1))
        if train:
            return outputs
        strides = (
            tuple(input_h // f.shape[1] for f in outputs) if input_h is not None else self.strides
        )
        # class count follows the supplied vocabulary (set_classes may pass
        # fewer/more names than the built-in nc — the reference updates
        # model.model[-1].nc the same way, models/yolo/world/model.py)
        nc_eff = int(text_feats.shape[0])
        y = decode_detections(outputs, strides, nc_eff, self.reg_max)
        return y, outputs


class Proto(nn.Module):
    """Mask prototype generator for segmentation (reference block.py Proto):
    Conv 3x3 -> learned 2x upsample -> Conv 3x3 -> 1x1 to nm channels."""

    c_: int = 256
    c2: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(self.c_, (2, 2), strides=(2, 2), padding="VALID", use_bias=True,
                             dtype=self.dtype, name="upsample")(x)
        x = Conv(self.c_, 3, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(x, train)


def _extra_branch(xs, c4: int, out_ch: int, dtype, name: str, train: bool):
    """Per-level Conv3x3 -> Conv3x3 -> 1x1 branch flattened to (B, A, out_ch)
    (the shared cv4 pattern of Segment/Pose/OBB, reference head.py:175,224,196)."""
    outs = []
    for i, x in enumerate(xs):
        m = Conv(c4, 3, dtype=dtype, name=f"{name}_{i}_0")(x, train)
        m = Conv(c4, 3, dtype=dtype, name=f"{name}_{i}_1")(m, train)
        m = conv2d(m, out_ch, 1, dtype=dtype, name=f"{name}_{i}_2")
        outs.append(m.reshape(m.shape[0], -1, out_ch))
    return jnp.concatenate(outs, axis=1)  # (B, A, out_ch)


@register
class Segment(nn.Module):
    """Segmentation head (reference head.py:164-186): Detect + mask
    coefficients + Proto. Train -> (det_feats, mc, proto); eval ->
    (cat(decoded, mc), (det_feats, mc, proto))."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: tuple = ()
    strides: tuple = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False, input_h: int | None = None):
        p = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, self.nm)
        mc = _extra_branch(xs, c4, self.nm, self.dtype, "cv4", train)
        det = Detect(self.nc, self.ch, self.strides, self.reg_max, self.dtype, name="detect")
        feats = det(xs, train=train, input_h=input_h, decode=False)
        if train:
            return feats, mc, p
        strides = (
            tuple(input_h // f.shape[1] for f in feats) if input_h is not None else self.strides
        )
        y = decode_detections(feats, strides, self.nc, self.reg_max)
        return jnp.concatenate([y, mc.astype(y.dtype)], axis=-1), (feats, mc, p)


@register
class Pose(nn.Module):
    """Keypoint head (reference head.py:219-258): Detect + per-anchor
    keypoint regression decoded as (k*2 + anchor - 0.5) * stride."""

    nc: int = 1
    kpt_shape: tuple = (17, 3)
    ch: tuple = ()
    strides: tuple = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False, input_h: int | None = None):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpt = _extra_branch(xs, c4, nk, self.dtype, "cv4", train)  # (B, A, nk)
        det = Detect(self.nc, self.ch, self.strides, self.reg_max, self.dtype, name="detect")
        feats = det(xs, train=train, input_h=input_h, decode=False)
        if train:
            return feats, kpt
        strides = (
            tuple(input_h // f.shape[1] for f in feats) if input_h is not None else self.strides
        )
        y = decode_detections(feats, strides, self.nc, self.reg_max)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, strides, 0.5)
        k = kpt.astype(jnp.float32).reshape(kpt.shape[0], kpt.shape[1], *self.kpt_shape)
        xy = (k[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
        if self.kpt_shape[1] == 3:
            vis = nn.sigmoid(k[..., 2:3])
            k = jnp.concatenate([xy, vis], axis=-1)
        else:
            k = xy
        k = k.reshape(kpt.shape[0], kpt.shape[1], nk)
        return jnp.concatenate([y, k], axis=-1), (feats, kpt)


@register
class OBB(nn.Module):
    """Oriented-box head (reference head.py:189-217): Detect + angle branch,
    boxes decoded rotated (dist2rbox)."""

    nc: int = 80
    ne: int = 1
    ch: tuple = ()
    strides: tuple = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False, input_h: int | None = None):
        c4 = max(self.ch[0] // 4, self.ne)
        angle_logits = _extra_branch(xs, c4, self.ne, self.dtype, "cv4", train)
        angle = (nn.sigmoid(angle_logits.astype(jnp.float32)) - 0.25) * math.pi  # [-pi/4, 3pi/4]
        det = Detect(self.nc, self.ch, self.strides, self.reg_max, self.dtype, name="detect")
        feats = det(xs, train=train, input_h=input_h, decode=False)
        if train:
            return feats, angle
        strides = (
            tuple(input_h // f.shape[1] for f in feats) if input_h is not None else self.strides
        )
        b = feats[0].shape[0]
        no = 4 * self.reg_max + self.nc
        x_cat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
        box, cls = x_cat[..., : 4 * self.reg_max], x_cat[..., 4 * self.reg_max :]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, strides, 0.5)
        dist = dfl_decode(box, self.reg_max)
        rbox = dist2rbox(dist, angle[..., 0], anchors[None]) * stride_t[None]
        y = jnp.concatenate(
            [rbox, nn.sigmoid(cls.astype(jnp.float32)), angle], axis=-1
        )
        return y, (feats, angle)


def dist2rbox(distance, angle, anchor_points):
    """Decode rotated boxes (reference utils/tal.py dist2rbox): lt/rb distances
    rotated by angle around the anchor. Returns (cx, cy, w, h)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    cos, sin = jnp.cos(angle)[..., None], jnp.sin(angle)[..., None]
    xf_yf = (rb - lt) / 2
    x = xf_yf[..., 0:1] * cos - xf_yf[..., 1:2] * sin
    y = xf_yf[..., 0:1] * sin + xf_yf[..., 1:2] * cos
    xy = jnp.concatenate([x, y], axis=-1) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=-1)


@register
class Classify(nn.Module):
    """Classification head (reference head.py:259): Conv -> GAP -> Dropout ->
    Linear. Train returns logits; eval returns softmax probabilities."""

    nc: int = 1000
    c_: int = 1280
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, input_h=None):
        x = Conv(self.c_, 1, 1, dtype=self.dtype, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # GAP
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.nc, dtype=self.dtype, name="linear")(x).astype(jnp.float32)
        return logits if train else jax.nn.softmax(logits, axis=-1)


class TaskDecomposition(nn.Module):
    """TOOD dynamic layer attention (reference head.py:626-669).

    With stacked_convs groups: a per-image sigmoid gate scales each stacked
    group of input channels before a shared 1x1 reduction conv — algebraically
    identical to the reference's bmm with the gated conv weight.
    """

    feat_channels: int
    stacked_convs: int = 1
    la_down_rate: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, avg_feat=None, train: bool = False):
        in_ch = self.feat_channels * self.stacked_convs
        if avg_feat is None:
            avg_feat = jnp.mean(feat, axis=(1, 2), keepdims=True)
        w = conv2d(avg_feat, in_ch // self.la_down_rate, 1, dtype=self.dtype, name="la_conv1")
        w = nn.relu(w)
        w = nn.Conv(
            self.stacked_convs, (1, 1), use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), name="la_conv2",
        )(w)
        gate = nn.sigmoid(w)  # (B, 1, 1, stacked)
        # scale each stacked group of channels, then shared 1x1 reduction
        b = feat.shape[0]
        gated = feat.reshape(*feat.shape[:3], self.stacked_convs, self.feat_channels)
        gated = gated * gate[..., None]
        gated = gated.reshape(*feat.shape[:3], in_ch)
        y = nn.Conv(
            self.feat_channels, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="reduction_conv",
        )(gated)
        y = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype, name="gn")(y)
        return silu(y)


class CoordAtt(nn.Module):
    """Coordinate attention (reference head.py:671-707)."""

    oup: int
    reduction: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        x_h = jnp.mean(x, axis=2, keepdims=True)  # (b, h, 1, c)
        x_w = jnp.mean(x, axis=1, keepdims=True).transpose(0, 2, 1, 3)  # (b, w, 1, c)
        y = jnp.concatenate([x_h, x_w], axis=1)  # (b, h+w, 1, c)
        y = conv2d(y, mip, 1, dtype=self.dtype, name="conv1")
        y = BatchNorm(use_running_average=not train,
                         dtype=self.dtype, name="bn1")(y)
        y = hardswish(y)
        y_h, y_w = y[:, :h], y[:, h:]
        a_h = nn.sigmoid(conv2d(y_h, self.oup, 1, dtype=self.dtype, name="conv_h"))  # (b,h,1,o)
        a_w = nn.sigmoid(conv2d(y_w, self.oup, 1, dtype=self.dtype, name="conv_w"))  # (b,w,1,o)
        a_w = a_w.transpose(0, 2, 1, 3)  # (b,1,w,o)
        return x * a_w * a_h


class CrossTaskInteraction(nn.Module):
    """Bidirectional gated cls/reg exchange (reference head.py:722-747)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cls_feat, reg_feat, train: bool = False):
        c = self.channels
        c2r = conv2d(cls_feat, c, 1, dtype=self.dtype, name="cls_to_reg")
        r2c = conv2d(reg_feat, c, 1, dtype=self.dtype, name="reg_to_cls")
        cls_gate = nn.sigmoid(
            conv2d(jnp.concatenate([cls_feat, r2c], axis=-1), c, 1, dtype=self.dtype, name="cls_gate")
        )
        reg_gate = nn.sigmoid(
            conv2d(jnp.concatenate([reg_feat, c2r], axis=-1), c, 1, dtype=self.dtype, name="reg_gate")
        )
        return cls_feat + r2c * cls_gate, reg_feat + c2r * reg_gate


class DyDCNv2(nn.Module):
    """Modulated deformable conv 3x3 + GroupNorm(16) (reference head.py:751-782).

    The deformable sampling replaces mmcv.ops.ModulatedDeformConv2d. Three
    implementations, all with bilinear/zero-pad mmcv semantics:

    - ops/deform_mxu2.py (auto on TPU, train AND eval): x-tiled
      fused-bilinear MXU kernel, exact for |offset| <= radius (clipped
      beyond). Fastest both directions, measured end-to-end on the
      flagship (chained-truth): inference 42.7 -> 26.3 ms/batch bs32,
      full train step 212 -> 62.2 ms bs16 vs the v1 kernel.
      Using ONE bounded kernel for train and eval keeps their sampling
      semantics identical; the trainer's dcn_offset_max guard monitors the
      clip bound.
    - ops/deform_mxu.py: MXU-separable kernel v1 (opt-in fallback).
    - ops/deform_pallas.py: previous bounded-window VPU kernel (opt-in).
    - ops/deform.py: exact unbounded XLA gather; default off-TPU (CPU tests
      stay bit-exact) and the semantic reference for parity tests.

    Override with YAT_DCN_IMPL={mxu2,mxu,pallas,exact}.
    """

    out_channels: int
    radius: float = 3.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset, mask, train: bool = False):
        import os

        c = x.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),  # torch conv default
            (3, 3, c, self.out_channels),
            jnp.float32,
        )
        impl = os.environ.get("YAT_DCN_IMPL", "auto")
        if impl == "auto":
            impl = "mxu2" if jax.default_backend() == "tpu" else "exact"
        # YAT_DCN_RADIUS overrides the module radius (benching / manual
        # widening for checkpoints whose offsets outgrew the default)
        r_env = os.environ.get("YAT_DCN_RADIUS")
        radius = int(float(r_env)) if r_env else int(self.radius)
        if impl == "mxu":
            from yolo_ad_refine_tpu.ops.deform_mxu import (
                modulated_deform_conv2d_mxu,
            )

            y = modulated_deform_conv2d_mxu(
                x, offset, mask, weight.astype(x.dtype), radius
            )
        elif impl == "mxu2":
            from yolo_ad_refine_tpu.ops.deform_mxu2 import (
                modulated_deform_conv2d_mxu2,
            )

            y = modulated_deform_conv2d_mxu2(
                x, offset, mask, weight.astype(x.dtype), radius
            )
        elif impl == "pallas":
            from yolo_ad_refine_tpu.ops.deform_pallas import (
                modulated_deform_conv2d_pallas,
            )

            y = modulated_deform_conv2d_pallas(
                x, offset, mask, weight.astype(x.dtype), radius
            )
        else:
            y = modulated_deform_conv2d(x, offset, mask, weight.astype(x.dtype))
        return nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype, name="gn")(y)


class ResidualBlockGN(nn.Module):
    """Two Conv_GN 3x3 + projection shortcut (reference head.py:1031-1047)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x if x.shape[-1] == self.c2 else ConvGN(self.c2, 1, act=False, dtype=self.dtype,
                                                      name="shortcut")(x, train)
        y = ConvGN(self.c2, 3, dtype=self.dtype, name="conv1")(x, train)
        y = ConvGN(self.c2, 3, dtype=self.dtype, name="conv2")(y, train)
        return y + res


@register(name="AYHead", aliases=("AYHead1",))
class AYHead(nn.Module):
    """The flagship decoupled detect head (reference head.py:1049-1252).

    Per level: Conv_GN 1x1 stem -> hidc = max(ch); shared Conv_GN 3x3 x2 ->
    task_ch = hidc//2; TaskDecomposition x2; CrossTaskInteraction; cls branch
    -> ResidualBlockGN; reg branch -> offset/mask conv (27ch = 18 offset + 9
    mask) -> DyDCNv2 -> CoordAtt; foreground-prob conv (sigmoid) gates cls
    logits; reg output scaled by a learnable per-level Scale. All trunk
    convs are shared across levels (only stems and scales are per-level),
    exactly as the reference.
    """

    nc: int = 80
    ch: tuple = ()
    strides: tuple = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32
    # bounded-kernel clip radius for the DCN alignment (px at feature
    # stride). The reference's mmcv kernel is unbounded; checkpoints record
    # their trained dcn_offset_max and load_checkpoint raises this to cover
    # it (see engine/checkpoint.py). YAT_DCN_RADIUS env overrides.
    dcn_radius: float = 3.0

    @nn.compact
    def __call__(self, xs, train: bool = False, input_h: int | None = None):
        nl = len(self.ch)
        hidc = max(self.ch) if self.ch else 512
        task_ch = hidc // 2

        # shared trunk modules (instantiated once -> weights shared over levels)
        share1 = ConvGN(task_ch, 3, dtype=self.dtype, name="share_conv_0")
        share2 = ConvGN(task_ch, 3, dtype=self.dtype, name="share_conv_1")
        cls_decomp = TaskDecomposition(task_ch, 1, 16, dtype=self.dtype, name="cls_decomp")
        reg_decomp = TaskDecomposition(task_ch, 1, 16, dtype=self.dtype, name="reg_decomp")
        cross_task = CrossTaskInteraction(task_ch, dtype=self.dtype, name="cross_task")
        rep_block_cls = ResidualBlockGN(task_ch, dtype=self.dtype, name="rep_block_cls")
        coord_att = CoordAtt(task_ch, dtype=self.dtype, name="coord_attention_reg")
        dcn = DyDCNv2(task_ch, radius=self.dcn_radius, dtype=self.dtype,
                      name="DyDCNV2")

        offset_dim = 2 * 9
        cls_prior = -math.log((1 - 0.01) / 0.01)

        # shared output convs (single torch instances applied per level);
        # names mirror the torch Sequential indices for checkpoint import
        spatial_offset_conv = nn.Conv(27, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                                      dtype=self.dtype, name="spatial_conv_offset")
        cls_prob_conv0 = nn.Conv(task_ch // 2, (1, 1), use_bias=True, dtype=self.dtype,
                                 name="cls_prob_conv_0")
        cls_prob_conv1 = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                                 dtype=self.dtype, name="cls_prob_conv_2")
        cv2 = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                      bias_init=nn.initializers.ones, name="cv2")
        cv3 = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                      bias_init=nn.initializers.constant(cls_prior), name="cv3")

        def spatial_offset(f):
            return spatial_offset_conv(f)

        def cls_prob(f):
            return nn.sigmoid(cls_prob_conv1(nn.relu(cls_prob_conv0(f))))

        def reg_out(f):
            return cv2(f)

        def cls_out(f):
            return cv3(f)

        def sow_offset(offset):
            self.sow("diagnostics", "dcn_offset_max",
                     jnp.max(jnp.abs(offset)).astype(jnp.float32),
                     init_fn=lambda: jnp.float32(0.0),
                     reduce_fn=jnp.maximum)

        from yolo_ad_refine_tpu.ops.ayhead_fused import (
            ayhead_fused_enabled,
            ayhead_fused_levels,
        )

        if not self.is_initializing() and ayhead_fused_enabled():
            # lane-filling fused rewrite (ops/ayhead_fused.py): exact same
            # function, cls/reg twin branches packed into 128-wide ops.
            # Params were created by the module path at init; DCN/CoordAtt
            # stay module calls (custom VJP, GN, BN state, diagnostics).
            scales = [self.param(f"scale{i}", nn.initializers.ones, (),
                                 jnp.float32) for i in range(nl)]
            outputs = ayhead_fused_levels(
                self.variables["params"], xs, train, self.dtype,
                dcn_fn=lambda x, o, m: dcn(x, o, m, train),
                coord_fn=lambda x: coord_att(x, train),
                scales=scales, nc=self.nc, reg_max=self.reg_max,
                diag_fn=sow_offset)
            if train:
                return outputs
            strides = (tuple(input_h // f.shape[1] for f in outputs)
                       if input_h is not None else self.strides)
            return decode_detections(outputs, strides, self.nc,
                                     self.reg_max), outputs

        outputs = []
        for i in range(nl):
            adapted = ConvGN(hidc, 1, dtype=self.dtype, name=f"stems_{i}")(xs[i], train)
            feat = share2(share1(adapted, train), train)

            avg_feat = jnp.mean(feat, axis=(1, 2), keepdims=True)
            cls_feat = cls_decomp(feat, avg_feat, train)
            reg_feat = reg_decomp(feat, avg_feat, train)
            cls_feat, reg_feat = cross_task(cls_feat, reg_feat, train)

            cls_feat_enh = rep_block_cls(cls_feat, train)

            om = spatial_offset(feat)
            offset = om[..., :offset_dim]
            mask = nn.sigmoid(om[..., offset_dim:])
            # DCN offset-bound diagnostic: the bounded Pallas kernels clip
            # |offset| at DyDCNv2.radius, so a model whose learned offsets
            # grow past the radius changes semantics. Sown into the
            # "diagnostics" collection (no-op unless the caller passes
            # mutable=["diagnostics"]); the train step surfaces it as the
            # dcn_offset_max metric and the trainer warns near the bound.
            sow_offset(offset)
            reg_aligned = dcn(reg_feat, offset, mask, train)
            reg_enh = coord_att(reg_aligned, train)

            prob = cls_prob(feat)

            scale = self.param(f"scale{i}", nn.initializers.ones, (), jnp.float32)
            reg_output = reg_out(reg_enh) * scale.astype(feat.dtype)
            cls_output = cls_out(cls_feat_enh * prob)
            outputs.append(jnp.concatenate([reg_output, cls_output], axis=-1))

        if train:
            return outputs
        strides = (
            tuple(input_h // f.shape[1] for f in outputs) if input_h is not None else self.strides
        )
        y = decode_detections(outputs, strides, self.nc, self.reg_max)
        return y, outputs
