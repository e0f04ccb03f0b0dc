"""Tensor-parallel ('model' axis) train-step tests on the CPU mesh.

Exercises the 2D ('data', 'model') mesh path that __graft_entry__'s
dryrun uses: column/row-parallel ViL projections
(parallel/mesh.py:_COL_PARALLEL/_ROW_PARALLEL) with XLA-inserted
collectives.  The reference has no tensor parallelism (DDP only,
ref:engine/trainer.py:174-233) — this is the TPU-native extension, so
correctness is asserted against the pure data-parallel run of the same
step rather than against torch.
"""

import jax
import jax.numpy as jnp
import pytest

from xlstm_yolo_tpu.parallel import mesh as mesh_lib

TINY = "xlstm_yolo_tpu/cfg/models/vil-det-tiny.yaml"


def _one_step(n_data: int, n_model: int):
    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import TrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model)
    model, d = build_detection_model(TINY, training=True)
    B, M = 8, 8  # divisible by the 'data' extent of both mesh shapes
    batch = {
        "img": jnp.linspace(0, 1, B * 160 * 160 * 3, dtype=jnp.float32)
        .reshape(B, 160, 160, 3),
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.tile(jnp.asarray([10.0, 10.0, 80.0, 90.0]), (B, M, 1)),
        "mask": jnp.ones((B, M), bool).at[:, 4:].set(False),
    }
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)({"params": rng, "droppath": rng}, batch["img"])
    tx, _, _ = opt_lib.build_optimizer(
        variables["params"], name="AdEMAMix", lr=1e-3, iterations=10,
        nc=d.get("nc", 80),
    )
    state = TrainState.create(variables, tx)

    param_sh = mesh_lib.make_param_shardings(mesh, state.params)
    state = state.replace(
        params=jax.device_put(state.params, param_sh),
        ema=state.ema._replace(params=jax.device_put(state.ema.params, param_sh)),
    )
    batch = jax.device_put(batch, mesh_lib.make_batch_sharding(mesh, batch))
    step = jax.jit(make_train_step(model, tx, nc=d.get("nc", 80)))
    with mesh:
        new_state, metrics = step(state, batch, rng)
        jax.block_until_ready(new_state.params)
    return mesh, param_sh, new_state, float(metrics["loss"])


@pytest.mark.slow
def test_tp_train_step_matches_dp():
    """4x2 (data x model) one-step loss == 8x1 pure-DP loss."""
    _, sh_tp, state_tp, loss_tp = _one_step(4, 2)
    _, _, state_dp, loss_dp = _one_step(8, 1)
    assert loss_tp == pytest.approx(loss_dp, rel=2e-4), (loss_tp, loss_dp)

    # updated params agree too (not just the scalar loss)
    p_tp = jax.tree.leaves(jax.device_get(state_tp.params))
    p_dp = jax.tree.leaves(jax.device_get(state_dp.params))
    worst = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(p_tp, p_dp)
    )
    assert worst < 5e-3, f"max param divergence {worst}"

    # the 'model' axis must actually shard something: at least one ViL
    # projection kernel carries a non-replicated PartitionSpec
    specs = [s.spec for s in jax.tree.leaves(sh_tp)]
    n_sharded = sum(1 for s in specs if any(ax is not None for ax in s))
    assert n_sharded > 0, "tensor-parallel pspecs are all replicated"


@pytest.mark.slow
def test_flat_state_dp_matches_single_device():
    """FlatTrainState (the trainer's pure-DP default) under an 8-device
    data-sharded mesh: XLA must psum the flat grad across the batch
    shards and keep the big replicated vector consistent — the loss and
    updated flat params must match the same step on one device."""
    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import FlatTrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    model, d = build_detection_model(TINY, training=True)
    B, M = 8, 8
    batch = {
        "img": jnp.linspace(0, 1, B * 160 * 160 * 3, dtype=jnp.float32)
        .reshape(B, 160, 160, 3),
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.tile(jnp.asarray([10.0, 10.0, 80.0, 90.0]), (B, M, 1)),
        "mask": jnp.ones((B, M), bool).at[:, 4:].set(False),
    }
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)({"params": rng, "droppath": rng}, batch["img"])
    tx, _, _ = opt_lib.build_flat_optimizer(
        variables["params"], name="AdEMAMix", lr=1e-3, iterations=10,
        nc=d.get("nc", 80))
    step = jax.jit(make_train_step(model, tx, nc=d.get("nc", 80)))

    # single device
    st1 = FlatTrainState.create(variables, tx)
    st1, m1 = step(st1, batch, rng)

    # 8-way data-sharded
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    st8 = FlatTrainState.create(variables, tx)
    st8 = st8.replace(flat_params=jax.device_put(
        st8.flat_params, mesh_lib.replicated(mesh, st8.flat_params)))
    batch8 = jax.device_put(batch, mesh_lib.make_batch_sharding(mesh, batch))
    with mesh:
        st8, m8 = step(st8, batch8, rng)
        jax.block_until_ready(st8.flat_params)

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=2e-4)
    worst = float(jnp.max(jnp.abs(st8.flat_params - st1.flat_params)))
    assert worst < 5e-3, f"max flat-param divergence {worst}"


@pytest.mark.slow
def test_hybrid_state_tp_matches_tree_tp():
    """HybridTrainState (flat replicated block + sharded leaves) on the
    4x2 (data x model) mesh: one step must match the tree-path TP step —
    the trainer's XY_TP>1 + flat-opt configuration."""
    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import HybridTrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    n_data, n_model = 4, 2
    mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model)
    model, d = build_detection_model(TINY, training=True)
    B, M = 8, 8
    batch = {
        "img": jnp.linspace(0, 1, B * 160 * 160 * 3, dtype=jnp.float32)
        .reshape(B, 160, 160, 3),
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.tile(jnp.asarray([10.0, 10.0, 80.0, 90.0]), (B, M, 1)),
        "mask": jnp.ones((B, M), bool).at[:, 4:].set(False),
    }
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)({"params": rng, "droppath": rng}, batch["img"])
    # no warmup here: AdEMAMix updates are sign-normalized, so a near-zero
    # bias gradient's sign noise between two different compiled programs
    # moves the param by the full lr — warmup's 0.1 bias lr would put that
    # noise ceiling at ~0.13 (observed 0.093). The warmup/bias-group math
    # itself is locked elementwise by test_flat_opt.test_hybrid_matches_*.
    kw = dict(name="AdEMAMix", lr=1e-3, iterations=10, nc=d.get("nc", 80))

    smask = mesh_lib.sharded_mask(variables["params"], n_model)
    assert sum(map(bool, jax.tree.leaves(smask))) > 0, "nothing sharded"
    tx_h, _, _ = opt_lib.build_hybrid_optimizer(variables["params"], smask, **kw)
    st_h = HybridTrainState.create(variables, tx_h, smask)
    param_sh = mesh_lib.make_param_shardings(mesh, variables["params"])
    sh_tuple = tuple(s for s, m in zip(jax.tree.leaves(param_sh),
                                       jax.tree.leaves(smask)) if m)
    st_h = st_h.replace(
        sharded_params=jax.device_put(st_h.sharded_params, sh_tuple),
        ema_sharded=jax.device_put(st_h.ema_sharded, sh_tuple),
    )
    batch_sh = jax.device_put(batch, mesh_lib.make_batch_sharding(mesh, batch))
    step_h = jax.jit(make_train_step(model, tx_h, nc=d.get("nc", 80)))
    with mesh:
        st_h, m_h = step_h(st_h, batch_sh, rng)
        jax.block_until_ready(st_h.flat_params)

    # tree-path TP reference
    from xlstm_yolo_tpu.engine.steps import TrainState

    tx_t, _, _ = opt_lib.build_optimizer(variables["params"], **kw)
    st_t = TrainState.create(variables, tx_t)
    st_t = st_t.replace(
        params=jax.device_put(st_t.params, param_sh),
        ema=st_t.ema._replace(params=jax.device_put(st_t.ema.params, param_sh)),
    )
    step_t = jax.jit(make_train_step(model, tx_t, nc=d.get("nc", 80)))
    with mesh:
        st_t, m_t = step_t(st_t, batch_sh, rng)
        jax.block_until_ready(st_t.params)

    assert float(m_h["loss"]) == pytest.approx(float(m_t["loss"]), rel=2e-4)
    p_h = jax.tree.leaves(jax.device_get(st_h.params))
    p_t = jax.tree.leaves(jax.device_get(st_t.params))
    worst = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(p_h, p_t)
    )
    assert worst < 5e-3, f"max param divergence {worst}"
    # EMA agrees too (exercises the hybrid's split EMA)
    e_h = jax.tree.leaves(jax.device_get(st_h.ema.params))
    e_t = jax.tree.leaves(jax.device_get(st_t.ema.params))
    worst_e = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(e_h, e_t)
    )
    assert worst_e < 5e-3, f"max EMA divergence {worst_e}"


def test_param_pspec_rules():
    """Column/row-parallel rules map the ViL projection names correctly."""
    import numpy as np

    col = mesh_lib.param_pspec(
        (jax.tree_util.DictKey("proj_up"), jax.tree_util.DictKey("kernel")),
        np.zeros((16, 32)), 2,
    )
    row = mesh_lib.param_pspec(
        (jax.tree_util.DictKey("proj_down"), jax.tree_util.DictKey("kernel")),
        np.zeros((32, 16)), 2,
    )
    other = mesh_lib.param_pspec(
        (jax.tree_util.DictKey("conv"), jax.tree_util.DictKey("kernel")),
        np.zeros((3, 3, 1, 16)), 2,
    )
    odd = mesh_lib.param_pspec(  # indivisible feature dim stays replicated
        (jax.tree_util.DictKey("proj_up"), jax.tree_util.DictKey("kernel")),
        np.zeros((16, 33)), 2,
    )
    from jax.sharding import PartitionSpec as P

    assert col == P(None, mesh_lib.MODEL_AXIS)
    assert row == P(mesh_lib.MODEL_AXIS, None)
    assert other == P()
    assert odd == P()
