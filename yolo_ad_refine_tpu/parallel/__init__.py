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
here generalize to ('data', 'model') when a larger family lands.
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


def make_parallel_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """Jit the train step with state replicated and batch data-sharded.

    Batch shardings are taken from the arguments themselves (placed by
    shard_batch), so any batch schema (detect, segment masks, pose keypoints)
    works. State is donated so params update in place (halves peak HBM).
    """
    repl = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, None, None),  # None = respect the args' shardings
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
