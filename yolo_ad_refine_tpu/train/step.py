"""Jit-compiled training step and train state.

Replaces the reference's eager batch loop body (engine/trainer.py:367-427:
autocast forward -> scaled backward -> accumulate -> clip -> step -> EMA)
with a single XLA program: forward+loss (bf16 compute / f32 math), grads,
optax update (incl. clip + sum-semantics accumulation, built in optim.py), EMA
of params and BN stats. DDP's implicit gradient allreduce becomes sharding:
under a Mesh the batch is sharded on the 'data' axis and XLA inserts the
psum during autodiff (see parallel/).
"""

from __future__ import annotations


from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from yolo_ad_refine_tpu.train.loss import DetectionLoss
from yolo_ad_refine_tpu.train.optim import ema_update


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    step: jnp.ndarray          # optimizer-step counter for schedules
    ema_updates: jnp.ndarray   # EMA update counter (reference ModelEMA.updates)

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        # EMA must be a distinct buffer: astype(f32) on f32 aliases, and an
        # aliased param+EMA pair breaks XLA donation (same buffer donated twice)
        copy_f32 = lambda x: jnp.array(x, dtype=jnp.float32, copy=True)  # noqa: E731
        return cls(
            params=params,
            batch_stats=stats,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(copy_f32, params),
            ema_batch_stats=jax.tree.map(copy_f32, stats),
            step=jnp.zeros((), jnp.int32),
            ema_updates=jnp.zeros((), jnp.float32),
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def ema_variables(self):
        return {"params": self.ema_params, "batch_stats": self.ema_batch_stats}


def make_train_step(graph, loss_fn: DetectionLoss, tx, ema_decay: float = 0.9999,
                    ema_tau: float = 2000.0, extra_loss_keys: tuple = (),
                    accumulate: int = 1, dn_fn=None, prologue_meta=None,
                    prologue_start: int = 5, prologue_dtype=jnp.bfloat16):
    """Build the pure train_step(state, batch, rng) -> (state, metrics).

    batch = {'img': (B,H,W,3) float in [0,1] or uint8, 'cls': (B,N,1),
             'bboxes': (B,N,4) xyxy px, 'mask': (B,N,1), *extra_loss_keys}.
    extra_loss_keys (e.g. ('masks',) for segment, ('keypoints',) for pose)
    are passed positionally to the loss after the standard targets.
    accumulate: gradient-accumulation count (optax.MultiSteps inside tx);
    the EMA advances only on real optimizer steps, matching the reference
    (ModelEMA.update is called inside optimizer_step, trainer.py:580-588).
    dn_fn: optional (batch, rng) -> dn dict hook building the RT-DETR
    contrastive-denoising group inside the jitted step (train/rtdetr.py).
    prologue_meta: when set (and the batch height/width divide by 8), rows
    [0, prologue_start) run through the blocked train prologue
    (ops/s2d_prologue.py prologue_train — lane-filled layout for the
    shallow stage's forward AND backward, exact live-BN semantics); its
    running-stat updates are merged over the graph's mutated batch_stats.
    """

    def loss_and_updates(params, batch_stats, batch, rng):
        img = batch["img"]
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        kwargs = {}
        if dn_fn is not None:
            rng, dn_rng = jax.random.split(rng)
            kwargs["dn"] = dn_fn(batch, dn_rng)
        pre_stats = {}
        # % 16 (not % 8): the blocked stride-2 row-3 conv is only exact on
        # an even row-2 grid (see models/model.py eval dispatch).
        use_prologue = (prologue_meta is not None
                        and img.shape[1] % 16 == 0 and img.shape[2] % 16 == 0)
        if use_prologue:
            import os

            from yolo_ad_refine_tpu.ops.s2d_prologue import prologue_train

            pro_fn = lambda v, im: prologue_train(  # noqa: E731
                v, im, prologue_dtype, prologue_meta)
            if os.environ.get("YAT_REMAT_PROLOGUE", "0") == "1":
                # rematerialize the blocked prologue: its activations are
                # the largest in the model (H/2 x W/2 x 4C); recomputing
                # them in the backward trades cheap (underutilized-MXU)
                # FLOPs for HBM residual traffic (A/B'd, docs/performance.md)
                pro_fn = jax.checkpoint(pro_fn)
            img2, pre_stats = pro_fn(
                {"params": params, "batch_stats": batch_stats}, img)
            kwargs.update(start_at=prologue_start, full_input_h=img.shape[1])
            img = img2
        import os as _os

        def _body(v_, im_):
            return graph.apply(v_, im_, train=True, rngs={"dropout": rng},
                               mutable=["batch_stats", "diagnostics"],
                               **kwargs)

        remat = _os.environ.get("YAT_REMAT_BODY", "0")
        if remat == "dots":
            # save matmul/conv outputs, recompute elementwise+norm
            # residuals in the backward (HBM-bound model, MXU underused)
            _body = jax.checkpoint(
                _body, policy=jax.checkpoint_policies.dots_saveable)
        elif remat == "1":
            _body = jax.checkpoint(_body)
        feats, mutated = _body(
            {"params": params, "batch_stats": batch_stats}, img)
        extras = tuple(batch[k] for k in extra_loss_keys)
        out = loss_fn(feats, batch["cls"], batch["bboxes"], batch["mask"], *extras)
        diag_leaves = jax.tree.leaves(mutated.get("diagnostics", {}))
        off_max = (jnp.max(jnp.stack(diag_leaves)) if diag_leaves
                   else jnp.float32(0.0))
        new_stats = dict(mutated.get("batch_stats", batch_stats))
        new_stats.update(pre_stats)
        return out.total, (out.components, new_stats, off_max)

    def train_step(state: TrainState, batch, rng):
        (total, (components, new_stats, off_max)), grads = jax.value_and_grad(
            loss_and_updates, has_aux=True
        )(state.params, state.batch_stats, batch, rng)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), state.params, updates)

        if accumulate > 1:
            is_opt_step = ((state.step + 1) % accumulate == 0).astype(jnp.float32)
        else:
            is_opt_step = jnp.float32(1.0)
        new_ema_updates = state.ema_updates + is_opt_step
        ema_fn = lambda e, v, upd: jax.tree.map(  # noqa: E731
            lambda a, b: a + is_opt_step * (b - a),
            e, ema_update(e, v, upd, ema_decay, ema_tau),
        )
        new_ema_params = ema_fn(state.ema_params, new_params, new_ema_updates)
        new_ema_stats = ema_fn(state.ema_batch_stats, new_stats, new_ema_updates)

        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema_params,
            ema_batch_stats=new_ema_stats,
            step=state.step + 1,
            ema_updates=new_ema_updates,
        )
        metrics = {"loss": total, "components": components,
                   "box_loss": components[0], "cls_loss": components[-2],
                   "dfl_loss": components[-1], "dcn_offset_max": off_max}
        return new_state, metrics

    return train_step
