"""Multi-host skeleton: 2 CPU processes forming one 4-device mesh.

Exercises parallel/multihost.py — jax.distributed.initialize, global mesh,
per-host data sharding via make_array_from_process_local_data, global mean
reduction, stop-flag agreement — the TPU-native replacement for the
reference's multi-node DDP (utils/dist.py + trainer.py:217-228).
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

CHILD = textwrap.dedent("""
    import os
    import numpy as np
    import jax
    import jax.numpy as jnp

    os.environ["YAT_FORCE_CPU"] = "1"
    from yolo_ad_refine_tpu.parallel import multihost as MH

    assert MH.maybe_initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    mesh = MH.global_mesh()
    hb, start, stop = MH.per_host_batch_slice(8)
    assert hb == 4
    # each host contributes rows valued by GLOBAL index
    local = np.arange(start, stop, dtype=np.float32).reshape(4, 1)
    batch = MH.shard_host_local_batch({"x": local}, mesh)
    assert batch["x"].shape == (8, 1)

    with mesh:
        total = jax.jit(lambda b: b["x"].sum())(batch)
    assert float(total) == sum(range(8)), float(total)

    # stop-flag agreement: host 1 votes stop -> both stop
    mine = jax.process_index() == 1
    assert MH.all_agree_stop(mine) is True
    # broadcast from root
    v = MH.broadcast_scalar(3.5 if jax.process_index() == 0 else 0.0)
    assert v == 3.5, v
    MH.sync_hosts("done")
    print(f"HOST{jax.process_index()} OK")
""")


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    procs = []
    for pid in range(2):
        repo = Path(__file__).parent.parent
        env = dict(os.environ)
        env.update({
            "YAT_FORCE_CPU": "1",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "YAT_COORDINATOR": f"127.0.0.1:{port}",
            "YAT_NUM_PROCESSES": "2",
            "YAT_PROCESS_ID": str(pid),
            # the child runs as `python /tmp/.../child.py`, so the repo is
            # not on its sys.path (script dir is) — pass it explicitly
            "PYTHONPATH": str(repo) + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=str(Path.cwd()),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out[-3000:]}"
        assert f"HOST{pid} OK" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
