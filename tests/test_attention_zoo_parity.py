"""Weight-transplant logits parity for the most intricate attention-zoo
modules (VERDICT r4 #8): BiLevelRoutingAttention, DAttention,
FocusedLinearAttention, CascadedGroupAttention vs the reference torch
classes (/root/reference/ultralytics/nn/modules/attention.py:206,1161,
1385,1604). Same harness idea as test_tssa_ablations, but numeric: torch
weights are transplanted layer-by-layer into the flax modules and outputs
compared on the same input.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.nn import attention_zoo as AZ

REF = Path("/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference not mounted"),
]


def _torch_ref():
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _ensure_reference_importable

    _ensure_reference_importable()
    import ultralytics.nn.modules.attention as ra

    return ra


def _dw(w):  # torch (C,1,k,k) depthwise -> flax HWIO (k,k,1,C)
    return jnp.asarray(np.asarray(w.detach()).transpose(2, 3, 1, 0))


def _conv(w):  # torch OIHW -> flax HWIO
    return jnp.asarray(np.asarray(w.detach()).transpose(2, 3, 1, 0))


def _lin(w):  # torch (out,in) -> flax (in,out)
    return jnp.asarray(np.asarray(w.detach()).T)


def _vec(w):
    return jnp.asarray(np.asarray(w.detach()))


def _x(shape, seed=0):
    return np.random.default_rng(seed).normal(0, 1, shape).astype(np.float32)


def _run_torch(m, x_nhwc):
    import torch

    with torch.no_grad():
        y = m(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)).contiguous())
    if isinstance(y, tuple):
        y = y[0]
    return y.numpy().transpose(0, 2, 3, 1)


def test_bilevel_routing_attention_parity():
    ra = _torch_ref()
    import torch

    torch.manual_seed(0)
    tm = ra.BiLevelRoutingAttention(dim=32, num_heads=4, n_win=2, topk=2).eval()
    # non-trivial weights (default init leaves some params near-identity)
    for p in tm.parameters():
        torch.nn.init.normal_(p, 0, 0.3)
    sd = tm.state_dict()

    x = _x((2, 8, 8, 32))
    m = AZ.BiLevelRoutingAttention(num_heads=4, n_win=2, topk=2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]
    p["lepe"]["kernel"] = _dw(sd["lepe.weight"])
    p["lepe"]["bias"] = _vec(sd["lepe.bias"])
    p["qkv"]["kernel"] = _lin(sd["qkv.qkv.weight"])
    p["qkv"]["bias"] = _vec(sd["qkv.qkv.bias"])
    p["wo"]["kernel"] = _lin(sd["wo.weight"])
    p["wo"]["bias"] = _vec(sd["wo.bias"])

    y_t = _run_torch(tm, x)
    y_j = np.asarray(m.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-5,
                               err_msg="BiLevelRoutingAttention")


def test_dattention_parity():
    ra = _torch_ref()
    import torch

    torch.manual_seed(1)
    tm = ra.DAttention(channel=32, q_size=(8, 8), n_heads=4, n_groups=2).eval()
    for name, pp in tm.named_parameters():
        if "offset" in name:
            torch.nn.init.normal_(pp, 0, 0.1)  # keep offsets sane but nonzero
        else:
            torch.nn.init.normal_(pp, 0, 0.3)
    sd = tm.state_dict()

    x = _x((2, 8, 8, 32), seed=1)
    m = AZ.DAttention(n_heads=4, n_groups=2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]
    p["conv_offset_dw"]["kernel"] = _dw(sd["conv_offset.0.weight"])
    p["conv_offset_dw"]["bias"] = _vec(sd["conv_offset.0.bias"])
    p["conv_offset_ln"]["scale"] = _vec(sd["conv_offset.1.norm.weight"])
    p["conv_offset_ln"]["bias"] = _vec(sd["conv_offset.1.norm.bias"])
    p["conv_offset_out"]["kernel"] = _conv(sd["conv_offset.3.weight"])
    for k in ("proj_q", "proj_k", "proj_v", "proj_out"):
        p[k]["kernel"] = _conv(sd[f"{k}.weight"])
        p[k]["bias"] = _vec(sd[f"{k}.bias"])
    p["rpe_dw"]["kernel"] = _dw(sd["rpe_table.weight"])
    p["rpe_dw"]["bias"] = _vec(sd["rpe_table.bias"])

    y_t = _run_torch(tm, x)
    y_j = np.asarray(m.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=5e-5, err_msg="DAttention")


def test_focused_linear_attention_parity():
    ra = _torch_ref()
    import torch

    torch.manual_seed(2)
    tm = ra.FocusedLinearAttention(dim=32, resolution=(8, 8), num_heads=4).eval()
    for pp in tm.parameters():
        torch.nn.init.normal_(pp, 0, 0.3)
    sd = tm.state_dict()

    x = _x((2, 8, 8, 32), seed=2)
    # reference windows == its fixed resolution; split_size = input size matches
    m = AZ.FocusedLinearAttention(split_size=8, num_heads=4)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]
    p["conv_qkv"]["kernel"] = _conv(sd["conv_qkv.weight"])
    p["get_v"]["kernel"] = _dw(sd["get_v.weight"])
    p["get_v"]["bias"] = _vec(sd["get_v.bias"])
    p["dwc"]["kernel"] = _dw(sd["dwc.weight"])
    p["dwc"]["bias"] = _vec(sd["dwc.bias"])
    p["scale"] = _vec(sd["scale"])
    p["positional_encoding"] = _vec(sd["positional_encoding"])

    y_t = _run_torch(tm, x)
    y_j = np.asarray(m.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=5e-5,
                               err_msg="FocusedLinearAttention")


def test_cascaded_group_attention_parity():
    ra = _torch_ref()
    import torch

    torch.manual_seed(3)
    tm = ra.CascadedGroupAttention(dim=32, key_dim=8, num_heads=4,
                                   resolution=7)
    for pp in tm.parameters():
        torch.nn.init.normal_(pp, 0, 0.3)
    # non-trivial BN running stats; eps=1e-3 as the reference's
    # initialize_weights (torch_utils.py:426-436) sets on every BN in a
    # built model — our BatchNorm default matches that in-model value
    for mod in tm.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.2)
            mod.running_var.uniform_(0.5, 1.5)
            mod.eps = 1e-3
    # eval AFTER randomizing: the reference train(False) override caches
    # ab = attention_biases[:, idxs] (returns None — don't chain)
    tm.eval()
    sd = tm.state_dict()

    x = _x((2, 7, 7, 32), seed=3)
    m = AZ.CascadedGroupAttention(key_dim=8, num_heads=4, resolution=7)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p, bs = v["params"], v["batch_stats"]
    p["attention_biases"] = _vec(sd["attention_biases"])
    for i in range(4):
        p[f"qkv{i}"]["c"]["kernel"] = _conv(sd[f"qkvs.{i}.c.weight"])
        p[f"qkv{i}"]["bn"]["scale"] = _vec(sd[f"qkvs.{i}.bn.weight"])
        p[f"qkv{i}"]["bn"]["bias"] = _vec(sd[f"qkvs.{i}.bn.bias"])
        bs[f"qkv{i}"]["bn"]["mean"] = _vec(sd[f"qkvs.{i}.bn.running_mean"])
        bs[f"qkv{i}"]["bn"]["var"] = _vec(sd[f"qkvs.{i}.bn.running_var"])
        p[f"dws{i}"]["c"]["kernel"] = _dw(sd[f"dws.{i}.c.weight"])
        p[f"dws{i}"]["bn"]["scale"] = _vec(sd[f"dws.{i}.bn.weight"])
        p[f"dws{i}"]["bn"]["bias"] = _vec(sd[f"dws.{i}.bn.bias"])
        bs[f"dws{i}"]["bn"]["mean"] = _vec(sd[f"dws.{i}.bn.running_mean"])
        bs[f"dws{i}"]["bn"]["var"] = _vec(sd[f"dws.{i}.bn.running_var"])
    p["proj"]["c"]["kernel"] = _conv(sd["proj.1.c.weight"])
    p["proj"]["bn"]["scale"] = _vec(sd["proj.1.bn.weight"])
    p["proj"]["bn"]["bias"] = _vec(sd["proj.1.bn.bias"])
    bs["proj"]["bn"]["mean"] = _vec(sd["proj.1.bn.running_mean"])
    bs["proj"]["bn"]["var"] = _vec(sd["proj.1.bn.running_var"])

    y_t = _run_torch(tm, x)
    y_j = np.asarray(m.apply({"params": p, "batch_stats": bs},
                             jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=5e-5,
                               err_msg="CascadedGroupAttention")
