"""SPMD parallelism over a jax.sharding.Mesh.

Replaces the reference's entire distributed stack (SURVEY.md §2.4): the
torch.distributed.run subprocess relaunch (utils/dist.py:25-66), NCCL process
groups (trainer.py:217-228), DistributedDataParallel gradient allreduce,
world-size loss compensation, DistributedSampler and rank gating — all of it
collapses into sharding annotations:

- one program, N devices: params/state replicated, batch sharded on the
  'data' axis; XLA inserts the gradient all-reduce during autodiff and it
  rides ICI,
- no per-rank batch splitting: the global batch is placed with
  jax.device_put against a NamedSharding,
- rank-0 gating becomes "metrics are already replicated".

The mesh is 1-D ('data') today because the reference is data-parallel-only
(a ~4-10M param CNN needs no tensor/pipeline parallelism); the axis types
here generalize to ('data', 'model') when a larger family lands. Beyond the
reference's DDP, state_shardings/make_parallel_train_step(fsdp=True) give a
ZeRO-3/FSDP layout (params, optimizer momentum and EMA sharded leaf-wise;
XLA inserts the all-gathers and reduce-scatters) for pod-scale training of
larger family members without N-way optimizer replication.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_for_batch(batch_size: int, axis: str = "data") -> Mesh:
    """Largest device count that evenly divides the global batch."""
    n = len(jax.devices())
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(n, axis)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host batch pytree with the leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def state_shardings(mesh: Mesh, state: Any, axis: str = "data",
                    min_size: int = 16384) -> Any:
    """FSDP-style sharding specs for a train-state pytree (ZeRO-3 layout).

    Every tensor leaf (params, optimizer momentum, EMA) is sharded along its
    largest mesh-divisible dimension; scalars and small tensors (< min_size
    elements, where the all-gather latency beats the memory win) stay
    replicated. XLA then materializes each weight via all-gather where the
    forward/backward needs it and reduce-scatters the gradients — the
    standard scaling-book FSDP recipe, no hand-written collectives.

    The reference has no analogue (its distributed stack is DDP-only,
    SURVEY.md §2.4); this exists because sharded state is how a TPU pod
    actually trains larger members of the family without replicating
    optimizer memory N ways.
    """
    n = mesh.shape[axis]

    def spec(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        for d in sorted(range(x.ndim), key=lambda i: x.shape[i], reverse=True):
            if x.shape[d] % n == 0:
                return NamedSharding(
                    mesh, P(*[axis if i == d else None for i in range(x.ndim)])
                )
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, state)


def shard_state(state: Any, shardings: Any) -> Any:
    """Place a train state according to state_shardings (host -> mesh)."""
    return jax.tree.map(jax.device_put, state, shardings)


def make_parallel_train_step(train_step, mesh: Mesh, axis: str = "data",
                             fsdp: bool = False, fsdp_min_size: int = 16384,
                             state: Any = None):
    """Jit the train step with batch data-sharded and state replicated (DP)
    or FSDP-sharded (fsdp=True; pass the state to derive leaf shardings).

    Batch shardings are taken from the arguments themselves (placed by
    shard_batch), so any batch schema (detect, segment masks, pose keypoints)
    works. State is donated so params update in place (halves peak HBM).
    """
    repl = replicated(mesh)
    if fsdp:
        if state is None:
            raise ValueError("fsdp=True requires state= to derive shardings")
        st_sh = state_shardings(mesh, state, axis, fsdp_min_size)
    else:
        st_sh = repl
    return jax.jit(
        train_step,
        in_shardings=(st_sh, None, None),  # None = respect the args' shardings
        out_shardings=(st_sh, repl),
        donate_argnums=(0,),
    )
