"""Flat-buffer optimizer equivalence vs the per-leaf tree chain.

The flat path (engine/optimizers.build_flat_optimizer +
engine/steps.FlatTrainState) must reproduce the tree path's math exactly:
same clip -> masked weight decay -> per-group warmup lr -> optimizer
update, just computed on one raveled vector. These tests lock that in on
CPU for every supported optimizer, then check the full train step +
EMA + checkpoint round-trip on the tiny model.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.flatten_util import ravel_pytree

from xlstm_yolo_tpu.engine import optimizers as opt_lib

CFG_TINY = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-tiny.yaml"


def _params(key):
    k = jax.random.split(key, 8)
    # leaf names chosen to exercise the group masks: 'kernel' decays,
    # 'bias'/'scale'/1-D 'weight' don't, biases get the warmup bias lr
    return {
        "conv": {"kernel": jax.random.normal(k[0], (3, 3, 8, 16)) * 0.1,
                 "bias": jax.random.normal(k[1], (16,)) * 0.1},
        "norm": {"weight": jax.random.normal(k[2], (16,)), "scale": jax.random.normal(k[3], (16,))},
        "lin": {"kernel": jax.random.normal(k[4], (16, 4)) * 0.1,
                "bias": jax.random.normal(k[5], (4,)) * 0.1},
        "blk": {"kernel": jax.random.normal(k[6], (32, 8)) * 3.0},  # big: trips the clip
    }


@pytest.mark.parametrize("name", ["SGD", "AdamW", "Adam", "AdEMAMix"])
@pytest.mark.parametrize("warmup", [0, 4])
def test_flat_matches_tree_updates(name, warmup):
    params = _params(jax.random.PRNGKey(0))
    sched = opt_lib.cosine_lr(0.01, 0.1, epochs=5, steps_per_epoch=4)
    kw = dict(name=name, lr=0.01, momentum=0.9, weight_decay=5e-4,
              schedule=sched, iterations=20, clip_norm=1.0,
              warmup_steps=warmup)
    tx_t, _, _ = opt_lib.build_optimizer(params, **kw)
    tx_f, _, _ = opt_lib.build_flat_optimizer(params, **kw)

    flat0, unravel = ravel_pytree(params)
    st_t, st_f = tx_t.init(params), tx_f.init(flat0)
    p_t, p_f = params, flat0
    for i in range(9):
        g_t = jax.tree.map(lambda p: jnp.sin(p * (i + 1.0)) + 0.01 * p, p_t)
        g_f, _ = ravel_pytree(g_t)
        u_t, st_t = tx_t.update(g_t, st_t, p_t)
        u_f, st_f = tx_f.update(g_f, st_f, p_f)
        p_t = optax.apply_updates(p_t, u_t)
        p_f = p_f + u_f
        np.testing.assert_allclose(
            ravel_pytree(p_t)[0], p_f, rtol=3e-5, atol=3e-7,
            err_msg=f"{name} warmup={warmup} step {i}")


@pytest.mark.parametrize("name", ["SGD", "AdamW", "Adam", "AdEMAMix"])
@pytest.mark.parametrize("warmup", [0, 4])
def test_hybrid_matches_tree_updates(name, warmup):
    """build_hybrid_optimizer (flat replicated block + per-leaf sharded
    leaves, joint global-norm clip) reproduces the tree chain."""
    params = _params(jax.random.PRNGKey(0))
    # mark one big kernel and one bias as 'model'-sharded: exercises the
    # per-leaf decay path and the sharded-bias warmup-lr path
    smask = jax.tree_util.tree_map_with_path(
        lambda p, l: (p[-1].key == "kernel" and l.shape == (32, 8))
        or (p[0].key == "lin" and p[-1].key == "bias"), params)
    sched = opt_lib.cosine_lr(0.01, 0.1, epochs=5, steps_per_epoch=4)
    kw = dict(name=name, lr=0.01, momentum=0.9, weight_decay=5e-4,
              schedule=sched, iterations=20, clip_norm=1.0,
              warmup_steps=warmup)
    tx_t, _, _ = opt_lib.build_optimizer(params, **kw)
    tx_h, _, _ = opt_lib.build_hybrid_optimizer(params, smask, **kw)

    flat0, shard0, split, rebuild = opt_lib.partition_params(params, smask)
    assert len(shard0) == 2 and flat0.size == ravel_pytree(params)[0].size - sum(
        s.size for s in shard0)
    # rebuild inverts split
    np.testing.assert_allclose(
        ravel_pytree(rebuild(flat0, shard0))[0], ravel_pytree(params)[0])

    st_t, st_h = tx_t.init(params), tx_h.init((flat0, shard0))
    p_t, p_h = params, (flat0, shard0)
    for i in range(9):
        g_t = jax.tree.map(lambda p: jnp.sin(p * (i + 1.0)) + 0.01 * p, p_t)
        g_h = split(g_t)
        u_t, st_t = tx_t.update(g_t, st_t, p_t)
        u_h, st_h = tx_h.update(g_h, st_h, p_h)
        p_t = optax.apply_updates(p_t, u_t)
        p_h = (p_h[0] + u_h[0],
               tuple(p + u for p, u in zip(p_h[1], u_h[1])))
        np.testing.assert_allclose(
            ravel_pytree(p_t)[0], ravel_pytree(rebuild(*p_h))[0],
            rtol=3e-5, atol=3e-7, err_msg=f"{name} warmup={warmup} step {i}")


def test_flat_rmsprop_falls_back():
    params = _params(jax.random.PRNGKey(1))
    with pytest.raises(NotImplementedError):
        opt_lib.build_flat_optimizer(params, name="RMSProp")


@pytest.mark.slow
def test_flat_train_step_matches_tree_and_roundtrips(tmp_path):
    """Full tiny-model train step: flat state == tree state (params + EMA),
    and the flat state checkpoint round-trips through the tree layout."""
    from xlstm_yolo_tpu.engine.steps import FlatTrainState, TrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    model, _ = build_detection_model(str(CFG_TINY), training=True)
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (2, 160, 160, 3))
    variables = model.init({"params": rng, "droppath": rng}, img)

    kw = dict(name="SGD", lr=0.01, momentum=0.9, weight_decay=5e-4,
              iterations=100, warmup_steps=3)
    tx_t, _, _ = opt_lib.build_optimizer(variables["params"], **kw)
    tx_f, _, _ = opt_lib.build_flat_optimizer(variables["params"], **kw)
    st_t = TrainState.create(variables, tx_t)
    st_f = FlatTrainState.create(variables, tx_f)

    batch = {
        "img": img,
        "cls": jnp.zeros((2, 8), jnp.int32),
        "bboxes": jnp.tile(jnp.asarray([20.0, 20.0, 90.0, 90.0]), (2, 8, 1)),
        "mask": jnp.asarray([[True] + [False] * 7] * 2),
    }
    step_t = jax.jit(make_train_step(model, tx_t, nc=80))
    step_f = jax.jit(make_train_step(model, tx_f, nc=80))
    r = jax.random.PRNGKey(3)
    for _ in range(2):
        st_t, m_t = step_t(st_t, batch, r)
        st_f, m_f = step_f(st_f, batch, r)
    np.testing.assert_allclose(float(m_t["loss"]), float(m_f["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        ravel_pytree(st_t.params)[0], st_f.flat_params, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        ravel_pytree(st_t.ema.params)[0], st_f.ema_flat, rtol=1e-4, atol=1e-6)

    # checkpoint round-trip: on-disk layout is the tree form
    save_checkpoint(tmp_path / "ck", st_f, epoch=0, best_fitness=0.5, args={})
    blank = FlatTrainState.create(variables, tx_f)
    restored, start_epoch, best = load_checkpoint(tmp_path / "ck", blank)
    assert start_epoch == 1 and best == 0.5
    np.testing.assert_allclose(np.asarray(restored.flat_params),
                               np.asarray(st_f.flat_params), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(restored.ema_flat),
                               np.asarray(st_f.ema_flat), rtol=1e-6)
    assert int(restored.step) == int(st_f.step)


@pytest.mark.parametrize("name", ["AdamW", "Adam", "AdEMAMix"])
def test_adam_family_bias_warmup_zeroed(name):
    """Adam-family builders must ignore warmup_bias_lr (parity:
    ref:engine/trainer.py:798 zeroes it — "no higher than 0.01 for
    Adam"): during warmup the bias group's first update must NOT be
    boosted toward lr 0.1. Regression for the round-4 classify-stall
    bug (Adam-normalized 0.1-lr bias steps saturate ViL gate biases)."""
    params = _params(jax.random.PRNGKey(0))
    kw = dict(name=name, lr=0.01, momentum=0.9, weight_decay=0.0,
              iterations=20, clip_norm=1e9, warmup_steps=100,
              warmup_bias_lr=0.1)
    tx, _, _ = opt_lib.build_optimizer(params, **kw)
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, st, params)
    # step 1 of 100-step warmup: non-bias lr ~ 0.01/100 = 1e-4; a leaked
    # 0.1 bias warmup start would give the bias group |u| ~ 0.1 (Adam
    # update magnitude ~ lr). Bias update must be the same order as the
    # kernel update, not ~1000x larger.
    bias_mag = float(jnp.abs(u["conv"]["bias"]).max())
    kern_mag = float(jnp.abs(u["conv"]["kernel"]).max())
    assert bias_mag < 10 * kern_mag + 1e-8, (name, bias_mag, kern_mag)
    assert bias_mag < 1e-2, (name, bias_mag)


def test_sgd_bias_warmup_kept():
    """SGD keeps the reference's 0.1 bias warmup lr (trainer.py:369-378)."""
    params = _params(jax.random.PRNGKey(0))
    kw = dict(name="SGD", lr=0.01, momentum=0.9, weight_decay=0.0,
              iterations=20, clip_norm=1e9, warmup_steps=100,
              warmup_bias_lr=0.1)
    tx, _, _ = opt_lib.build_optimizer(params, **kw)
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, st, params)
    bias_mag = float(jnp.abs(u["conv"]["bias"]).max())
    kern_mag = float(jnp.abs(u["conv"]["kernel"]).max())
    # bias group starts near 0.1*(1-1/100) ~ 0.099 lr; kernel near 1e-4
    assert bias_mag > 100 * kern_mag, (bias_mag, kern_mag)
