"""Optimizer, LR/momentum schedules, and EMA.

Parity surface: reference engine/trainer.py:753-813 (build_optimizer: 3 param
groups — decay / norm-no-decay / bias-no-decay; auto rule picks SGD or AdamW),
trainer.py:209-215 + 369-380 (linear or cosine epoch schedule with per-iter
warmup incl. bias-lr 0.1->lr0 and momentum 0.8->0.937),
trainer.py:580-588 (grad clip 10.0, accumulation to nbs=64),
utils/torch_utils.py:511-547 (ModelEMA, decay 0.9999*(1-e^(-t/2000)) over all
float state incl. BN running stats).

TPU-first: the whole update is one optax transform inside the jitted train
step — no GradScaler (bf16 needs no loss scaling, unlike the reference's AMP
fp16 path).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax


def param_group_label(path: tuple, leaf) -> str:
    """Classify a parameter like the reference's 3 optimizer groups."""
    names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    last = names[-1] if names else ""
    if last == "bias" or last.endswith("bias"):
        return "bias"
    if getattr(leaf, "ndim", 0) <= 1:
        return "nodecay"  # norm scales, 1-d weights (bifpn weights, DyT alpha...)
    return "decay"


def make_lr_fn(lr0: float, lrf: float, epochs: int, nb: int, warmup_epochs: float = 3.0,
               warmup_start: float = 0.0, cos_lr: bool = False):
    """Per-iteration LR schedule replicating the reference.

    Epoch-level factor lf(e) = (1 - e/epochs)*(1-lrf) + lrf (linear, default)
    or the cosine one_cycle (torch_utils.py:485); per-iteration warmup
    interpolates from warmup_start*lr0... actually from warmup_start to the
    epoch LR over nw = max(round(warmup_epochs*nb), 100) iterations
    (trainer.py:369-380; bias group uses warmup_start=0.1).
    """
    nw = max(round(warmup_epochs * nb), 100) if warmup_epochs > 0 else 0

    def lf(epoch):
        if cos_lr:
            return ((1 - jnp.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1
        return (1 - epoch / epochs) * (1.0 - lrf) + lrf

    def lr_fn(step):
        epoch = step // nb
        base = lr0 * lf(epoch)
        if nw == 0:
            return base
        w = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, warmup_start + w * (base - warmup_start), base)

    return lr_fn


def make_momentum_fn(momentum: float = 0.937, warmup_momentum: float = 0.8,
                     warmup_epochs: float = 3.0, nb: int = 100):
    nw = max(round(warmup_epochs * nb), 100) if warmup_epochs > 0 else 0

    def momentum_fn(step):
        if nw == 0:
            return jnp.asarray(momentum)
        w = jnp.clip(step / nw, 0.0, 1.0)
        return warmup_momentum + w * (momentum - warmup_momentum)

    return momentum_fn


def build_optimizer(params, *, optimizer: str = "auto", lr0: float = 0.01, lrf: float = 0.01,
                    momentum: float = 0.937, weight_decay: float = 0.0005, epochs: int = 100,
                    nb: int = 100, batch: int = 16, nbs: int = 64, warmup_epochs: float = 3.0,
                    warmup_momentum: float = 0.8, warmup_bias_lr: float = 0.1,
                    cos_lr: bool = False, nc: int = 80, grad_clip: float = 10.0):
    """Build the optax transform + the accumulation count.

    Returns (tx, accumulate, lr_fns). 'auto' replicates trainer.py:771-781:
    SGD when total iterations > 10k, else AdamW with the lr/momentum fit
    formula; BOTH auto branches use momentum=0.9 and warmup_bias_lr=0.0
    (reference trainer.py:786-789).

    Accumulation (accumulate = round(nbs/batch) > 1) is handled HERE with the
    reference's SUM semantics: micro-gradients are pre-scaled by `accumulate`
    so optax.MultiSteps' running mean equals the reference's summed backward
    accumulation (its loss.sum()*batch_size convention assumes summing), and
    the inner schedules — which advance once per OPTIMIZER step — are fed
    `step * accumulate` so warmup/decay track real batches/epochs.
    """
    iterations = epochs * nb
    if optimizer == "auto":
        warmup_bias_lr = 0.0  # trainer.py:789 (both auto branches)
        if iterations > 10000:
            optimizer, momentum = "SGD", 0.9
        else:
            optimizer, lr0, momentum = "AdamW", round(0.002 * 5 / (4 + nc), 6), 0.9
            lrf = max(lrf, 0.01)

    # weight-decay scaled like the reference: wd * batch * accumulate / nbs
    accumulate = max(round(nbs / batch), 1)
    wd = weight_decay * batch * accumulate / nbs

    labels = jax.tree_util.tree_map_with_path(lambda p, x: param_group_label(p, x), params)

    def group_tx(warmup_start: float, use_wd: bool):
        lr_b = make_lr_fn(lr0, lrf, epochs, nb, warmup_epochs, warmup_start, cos_lr)
        mom_b = make_momentum_fn(momentum, warmup_momentum, warmup_epochs, nb)
        # inner schedules see optimizer steps (one per `accumulate` batches
        # under MultiSteps); convert back to batch units
        lr_fn = (lambda s: lr_b(s * accumulate)) if accumulate > 1 else lr_b
        mom_fn = (lambda s: mom_b(s * accumulate)) if accumulate > 1 else mom_b
        if optimizer in ("SGD",):
            def make(lr, mom):
                chain = [optax.add_decayed_weights(wd)] if use_wd else []
                chain.append(optax.sgd(lr, momentum=mom, nesterov=True))
                return optax.chain(*chain)

            return optax.inject_hyperparams(make)(lr=lr_fn, mom=mom_fn)
        # AdamW / Adam family
        def make(lr):
            chain = [optax.add_decayed_weights(wd)] if use_wd else []
            chain.append(optax.adamw(lr, b1=momentum, b2=0.999, weight_decay=0.0))
            return optax.chain(*chain)

        return optax.inject_hyperparams(make)(lr=lr_fn)

    tx = optax.multi_transform(
        {
            "bias": group_tx(warmup_bias_lr, False),
            "nodecay": group_tx(0.0, False),
            "decay": group_tx(0.0, True),
        },
        labels,
    )
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate > 1:
        # scale micro-grads by k so MultiSteps' mean == reference's sum;
        # clip-at-10 then applies to the accumulated gradient, matching the
        # reference order (accumulate -> unscale -> clip -> step)
        tx = optax.chain(optax.scale(float(accumulate)), optax.MultiSteps(tx, accumulate))
    # per-group lr schedules, for logging (results.csv lr/pg0-2 schema)
    lr_fns = {
        "pg0": make_lr_fn(lr0, lrf, epochs, nb, warmup_epochs, 0.0, cos_lr),       # decay
        "pg1": make_lr_fn(lr0, lrf, epochs, nb, warmup_epochs, 0.0, cos_lr),       # nodecay
        "pg2": make_lr_fn(lr0, lrf, epochs, nb, warmup_epochs, warmup_bias_lr, cos_lr),  # bias
    }
    return tx, accumulate, lr_fns


# ---------------------------------------------------------------------------
# EMA (reference ModelEMA semantics: ema of params AND bn statistics)
# ---------------------------------------------------------------------------


def ema_decay(updates, decay: float = 0.9999, tau: float = 2000.0):
    return decay * (1.0 - jnp.exp(-updates / tau))


def ema_update(ema_vars: Any, new_vars: Any, updates, decay: float = 0.9999, tau: float = 2000.0):
    """ema = d*ema + (1-d)*new over the full variables pytree."""
    d = ema_decay(updates.astype(jnp.float32), decay, tau)
    return jax.tree.map(lambda e, v: e * d + v.astype(e.dtype) * (1.0 - d), ema_vars, new_vars)
