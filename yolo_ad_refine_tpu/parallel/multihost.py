"""Multi-host (multi-process) SPMD support.

Parity surface: the reference's multi-node DDP path — utils/dist.py:25-66
(torch.distributed.run self-relaunch), trainer.py:217-228
(init_process_group over NCCL/Gloo with RANK/LOCAL_RANK env identity), and
trainer.py:403-406/462-465 (broadcast_object_list of the stop flag).

TPU-native replacement (SURVEY.md §2.4): every host runs the SAME program;
``jax.distributed.initialize`` wires the hosts into one runtime, the global
mesh spans all hosts' devices, each host feeds only ITS shard of the batch
(jax.make_array_from_process_local_data), and host-level control decisions
(early stop, best fitness) are agreed via
``jax.experimental.multihost_utils`` collectives instead of object
broadcasts. There is no subprocess relaunch and no rank-gated code path: the
only per-host branching is "which slice of data do I load" and "does host 0
write the checkpoint".

Env contract (matches jax.distributed defaults):
  YAT_COORDINATOR   coordinator address host:port (or JAX coordinator env)
  YAT_NUM_PROCESSES total process count
  YAT_PROCESS_ID    this process's id
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolo_ad_refine_tpu.utils import LOGGER


def maybe_initialize_distributed() -> bool:
    """Initialize the multi-process runtime when the env requests it.

    Returns True when running multi-process. Safe to call repeatedly.
    """
    coord = os.environ.get("YAT_COORDINATOR")
    nproc = os.environ.get("YAT_NUM_PROCESSES")
    if not coord or not nproc or int(nproc) <= 1:
        return jax.process_count() > 1
    # do NOT probe jax.process_count() here: it initializes the XLA backend,
    # after which jax.distributed.initialize refuses to run
    if jax.distributed.is_initialized():
        return True
    pid = int(os.environ.get("YAT_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nproc), process_id=pid)
    LOGGER.info(f"multihost: process {pid}/{nproc} via {coord}; "
                f"{jax.device_count()} global / {jax.local_device_count()} local devices")
    return True


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over ALL devices of ALL processes."""
    return Mesh(np.array(jax.devices()), (axis,))


def is_main_process() -> bool:
    """The checkpoint/plot-writing host (reference RANK in {-1, 0} gating)."""
    return jax.process_index() == 0


def per_host_batch_slice(global_batch: int) -> tuple[int, int, int]:
    """(host_batch, start, stop): this host's contiguous slice of the global
    batch — the DistributedSampler replacement (reference data/build.py:127)."""
    n = jax.process_count()
    i = jax.process_index()
    assert global_batch % n == 0, (
        f"global batch {global_batch} must divide by process count {n}"
    )
    hb = global_batch // n
    return hb, i * hb, (i + 1) * hb


def shard_host_local_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Assemble a GLOBAL sharded array from each host's LOCAL shard.

    Single-process: plain device_put against the sharding (identical to
    parallel.shard_batch). Multi-process: each host contributes its local
    rows via jax.make_array_from_process_local_data — no host ever
    materializes the global batch.
    """
    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(put, batch)


def all_agree_stop(stop: bool) -> bool:
    """Global early-stop agreement: any host voting stop stops everyone
    (reference trainer.py:462-465 broadcast_object_list of the stop flag —
    here a max-reduction so the decision is symmetric, not rank-0-owned)."""
    if jax.process_count() == 1:
        return stop
    from jax.experimental import multihost_utils

    votes = multihost_utils.process_allgather(np.asarray([stop], np.int32))
    return bool(np.asarray(votes).max())


def broadcast_scalar(value: float, root: int = 0) -> float:
    """Broadcast a host-level scalar from the root process (reference
    trainer.py:267 amp-flag broadcast)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    if root == 0:
        arr = np.asarray([value], np.float64)
        return float(multihost_utils.broadcast_one_to_all(arr)[0])
    # broadcast_one_to_all always sources process 0, so non-zero roots go
    # through an allgather and every host indexes the root's row
    votes = multihost_utils.process_allgather(np.asarray([value], np.float64))
    return float(np.asarray(votes).reshape(jax.process_count(), -1)[root, 0])


def sync_hosts(tag: str = "barrier"):
    """Barrier (reference torch_distributed_zero_first cache rendezvous)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
