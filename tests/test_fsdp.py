"""FSDP (sharded-state) training vs replicated DP: same math, sharded layout.

The reference's distributed stack is DDP-only (SURVEY.md §2.4); FSDP here is
the TPU-native extension (scaling-book recipe: shard every large leaf, let
XLA insert all-gather/reduce-scatter). These tests prove (a) the sharding
specs actually shard, (b) two training steps produce the same parameters as
the replicated path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_ad_refine_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    shard_batch,
    shard_state,
    state_shardings,
)

TINY = """
nc: 4
backbone:
  - [-1, 1, Conv, [16, 3, 2]]
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
head:
  - [[2, 3, 4], 1, Detect, [nc]]
"""


def _setup(tmp_path):
    from yolo_ad_refine_tpu.models.model import build_detection_model
    from yolo_ad_refine_tpu.train.loss import DetectionLoss
    from yolo_ad_refine_tpu.train.optim import build_optimizer
    from yolo_ad_refine_tpu.train.step import TrainState, make_train_step

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY)
    model = build_detection_model(str(cfg), imgsz=64)
    loss_fn = DetectionLoss(nc=model.nc, strides=model.strides)
    tx, _, _ = build_optimizer(model.variables["params"], lr0=0.01, epochs=2,
                               nb=4, batch=8, nbs=8)
    state = TrainState.create(model.variables, tx)
    step = make_train_step(model.graph, loss_fn, tx)
    r = np.random.default_rng(0)
    batch = {
        "img": r.random((8, 64, 64, 3), dtype=np.float32),
        "cls": r.integers(0, model.nc, (8, 4, 1)).astype(np.float32),
        "bboxes": np.tile(np.asarray([4.0, 4.0, 32.0, 32.0], np.float32), (8, 4, 1)),
        "mask": np.ones((8, 4, 1), np.float32),
    }
    return state, step, batch


def test_state_shardings_shard_large_leaves(tmp_path):
    state, _, _ = _setup(tmp_path)
    mesh = make_mesh(8)
    sh = state_shardings(mesh, state, min_size=1024)
    leaves_sh = jax.tree.leaves(sh)
    leaves = jax.tree.leaves(state)
    n_sharded = sum(
        1 for s, x in zip(leaves_sh, leaves)
        if hasattr(x, "ndim") and not s.is_fully_replicated
    )
    assert n_sharded > 0, "no leaf was sharded"
    # every sharded leaf's sharded dim must be divisible by the mesh size
    for s, x in zip(leaves_sh, leaves):
        if hasattr(x, "ndim") and not s.is_fully_replicated:
            spec = s.spec
            for d, name in enumerate(spec):
                if name is not None:
                    assert x.shape[d] % 8 == 0


@pytest.mark.slow
def test_fsdp_matches_replicated_two_steps(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    state, step, batch = _setup(tmp_path)
    mesh = make_mesh(8)

    # replicated DP reference
    pstep = make_parallel_train_step(step, mesh)
    st_dp = jax.tree.map(lambda x: x, state)  # fresh copies (donation)
    with mesh:
        b = shard_batch(batch, mesh)
        for i in range(2):
            st_dp, m_dp = pstep(st_dp, b, jax.random.PRNGKey(i))
        params_dp = jax.device_get(st_dp.params)

    # FSDP path
    state2, step2, _ = _setup(tmp_path)
    fstep = make_parallel_train_step(step2, mesh, fsdp=True, state=state2,
                                     fsdp_min_size=1024)
    sh = state_shardings(mesh, state2, min_size=1024)
    st_f = shard_state(state2, sh)
    # the input state really is sharded before the step runs
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree.leaves(st_f) if hasattr(leaf, "sharding")
    )
    with mesh:
        b = shard_batch(batch, mesh)
        for i in range(2):
            st_f, m_f = fstep(st_f, b, jax.random.PRNGKey(i))
        params_f = jax.device_get(st_f.params)

    assert np.isclose(float(m_dp["loss"]), float(m_f["loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6),
        params_dp, params_f,
    )
