"""Multi-scale training: static shape buckets over one shared parameter
set (VERDICT r2 item 9; ref:models/yolo/detect/train.py:60)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CFG_TINY = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-tiny.yaml"


def test_forward_shapes_scale_with_input():
    """One parameter set serves every bucket: pos-embeds and PatchMerger
    queries interpolate, grids rescale proportionally."""
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    model, _ = build_detection_model(str(CFG_TINY), nc=2, training=True)
    rng = jax.random.PRNGKey(0)
    v = jax.jit(model.init)({"params": rng, "droppath": rng},
                            jnp.zeros((1, 160, 160, 3), jnp.float32))
    for sz, grids in ((128, (16, 8, 4)), (160, (20, 10, 5)), (192, (24, 12, 6))):
        out, _ = model.apply(v, jnp.zeros((1, sz, sz, 3), jnp.float32),
                             rngs={"droppath": rng}, mutable=["batch_stats"])
        maps = out["one2many"]
        assert tuple(m.shape[1] for m in maps) == grids


@pytest.mark.slow
def test_multiscale_train_step():
    """The bucketed train step resizes the batch + geometry on device and
    produces finite loss/grads at a non-base bucket."""
    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import TrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    model, _ = build_detection_model(str(CFG_TINY), nc=2, training=True)
    rng = jax.random.PRNGKey(0)
    v = jax.jit(model.init)({"params": rng, "droppath": rng},
                            jnp.zeros((1, 160, 160, 3), jnp.float32))
    tx, _, _ = opt_lib.build_optimizer(v["params"], name="SGD", lr=0.01)
    state = TrainState.create(v, tx)
    step = jax.jit(make_train_step(model, tx, nc=2, accumulate=1, imgsz_out=192))

    B, M = 2, 8
    r = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(r.integers(0, 255, (B, 160, 160, 3)), jnp.uint8),
        "cls": jnp.asarray(r.integers(0, 2, (B, M)), jnp.int32),
        "bboxes": jnp.asarray(
            np.concatenate([r.uniform(10, 60, (B, M, 2)),
                            r.uniform(80, 150, (B, M, 2))], -1), jnp.float32),
        "mask": jnp.asarray(np.arange(M)[None] < 3).repeat(B, 0),
    }
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    d = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params))
    assert max(d) > 0
