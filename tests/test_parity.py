"""Parameter-count parity vs the torch reference (mmcv/torchvision/timm stubbed).

The reference counts 16 more parameters per model: its DFL decode is a frozen
(requires_grad=False) 1x1 conv holding arange(16) (block.py:63-83); ours is a
functional softmax-expectation with no parameters.
"""

from pathlib import Path

import pytest

REF = Path("/root/reference")

DFL_FROZEN_PARAMS = 16


def _ensure_reference_importable():
    """Install the dependency stubs (torchvision/mmcv/timm/...) that let the
    reference package import without its CUDA deps, and put /root/reference
    on sys.path. Idempotent."""
    import importlib.metadata as md
    import sys
    import types

    import torch
    import torch.nn as nn

    if "ultralytics" not in sys.modules:
        _orig = md.version
        md.version = lambda n: "0.20.0" if n == "torchvision" else _orig(n)

        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        tv = stub("torchvision", __version__="0.20.0")
        def _greedy_nms(boxes, scores, iou_thres):
            """Pure-torch greedy NMS matching torchvision.ops.nms semantics
            (descending-score sweep, strict > threshold suppression)."""
            order = scores.argsort(descending=True)
            keep = []
            while order.numel():
                i = order[0]
                keep.append(i.item())
                if order.numel() == 1:
                    break
                b = boxes[order[1:]]
                tl = torch.maximum(boxes[i, :2], b[:, :2])
                br = torch.minimum(boxes[i, 2:], b[:, 2:])
                inter = (br - tl).clamp(min=0).prod(1)
                area_i = (boxes[i, 2:] - boxes[i, :2]).prod()
                area_b = (b[:, 2:] - b[:, :2]).prod(1)
                iou = inter / (area_i + area_b - inter + 1e-12)
                order = order[1:][iou <= iou_thres]
            return torch.tensor(keep, dtype=torch.long)

        tv.ops = stub("torchvision.ops", nms=_greedy_nms)

        class ModulatedDeformConv2d(nn.Module):
            """Faithful pure-torch DCNv2 (replaces mmcv's CUDA kernel):
            per-tap bilinear sampling with zero padding via grid_sample,
            masked, contracted with the tap's weight slice."""

            def __init__(self, in_c, out_c, k, stride=1, padding=0, bias=True):
                super().__init__()
                self.k = k
                self.weight = nn.Parameter(torch.randn(out_c, in_c, k, k) * 0.05)
                if bias:
                    self.bias = nn.Parameter(torch.zeros(out_c))

            def forward(self, x, offset, mask):
                import torch.nn.functional as F

                b, c, h, w = x.shape
                k = self.k
                pad = k // 2
                offset = offset.view(b, k * k, 2, h, w)
                mask = mask.view(b, k * k, 1, h, w)
                ys = torch.arange(h, dtype=x.dtype).view(1, h, 1)
                xs = torch.arange(w, dtype=x.dtype).view(1, 1, w)
                out = 0.0
                for t in range(k * k):
                    ky, kx = divmod(t, k)
                    cy = ys + (ky - pad) + offset[:, t, 0]
                    cx = xs + (kx - pad) + offset[:, t, 1]
                    gx = (cx + 0.5) / w * 2 - 1
                    gy = (cy + 0.5) / h * 2 - 1
                    grid = torch.stack([gx, gy], dim=-1)  # (b, h, w, 2)
                    sampled = F.grid_sample(x, grid, mode="bilinear",
                                            padding_mode="zeros", align_corners=False)
                    sampled = sampled * mask[:, t]
                    out = out + F.conv2d(sampled, self.weight[:, :, ky, kx][..., None, None])
                if getattr(self, "bias", None) is not None:
                    out = out + self.bias.view(1, -1, 1, 1)
                return out

        stub("mmcv")
        stub("mmcv.ops", ModulatedDeformConv2d=ModulatedDeformConv2d)
        stub("mmcv.cnn", build_norm_layer=lambda cfg, ch: ("gn", nn.GroupNorm(16, ch)))

        class DropPath(nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        stub("timm")
        stub("timm.models")
        stub("timm.models.layers", DropPath=DropPath, trunc_normal_=lambda t, std=0.02: t)

        class MemoryEfficientSwish(nn.SiLU):
            pass

        stub("efficientnet_pytorch")
        stub("efficientnet_pytorch.model", MemoryEfficientSwish=MemoryEfficientSwish)
        sys.path.insert(0, str(REF))


def _build_torch_reference(cfg_path: str):
    _ensure_reference_importable()
    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

    return TorchDetectionModel(cfg_path, verbose=False)


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize("cfg", [
    "ultralytics/cfg/models/11/yolo11.yaml",
    pytest.param("z-yaml/yolo11-701-YOLO-AD-Refine.yaml", marks=pytest.mark.slow),
    "z-yaml/yolo11-697-newfpn+mona+AYHead+mlca3.yaml",
    "z-yaml/yolo11-newfpn.yaml",
    "z-yaml/yolo11-AYHead.yaml",
    "z-yaml/yolo11-hsfpn+C2SFA.yaml",
])
def test_param_count_parity(cfg):
    from yolo_ad_refine_tpu.models.model import DetectionModel
    import jax

    ref_model = _build_torch_reference(str(REF / cfg))
    ref_n = sum(p.numel() for p in ref_model.parameters())
    n_dfl_frozen = sum(
        p.numel() for n, p in ref_model.named_parameters() if not p.requires_grad
    )

    ours = DetectionModel(str(REF / cfg))
    var_shapes = jax.eval_shape(
        lambda: ours.graph.init(jax.random.PRNGKey(0),
                                __import__("jax.numpy", fromlist=["zeros"]).zeros((1, 256, 256, 3)),
                                train=False)
    )
    our_n = sum(int(__import__("numpy").prod(x.shape)) for x in jax.tree.leaves(var_shapes["params"]))
    assert our_n == ref_n - n_dfl_frozen, (
        f"{cfg}: ours {our_n} vs reference {ref_n} (frozen {n_dfl_frozen})"
    )
