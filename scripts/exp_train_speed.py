#!/usr/bin/env python
"""Flagship train-step throughput on the real TPU: native vs v2 kernels.

Usage: python scripts/exp_train_speed.py {native|v2} [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
WARMUP, ITERS = 2, 10


def main():
    kernel = {"native": "chunkwise--native_autograd",
              "v2": "chunkwise--pallas_xl_chunk_siging_v2"}[sys.argv[1]]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import optax

    from xlstm_yolo_tpu.engine.optimizers import ademamix
    from xlstm_yolo_tpu.engine.steps import TrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    model, _ = build_detection_model(
        CFG, training=True, compute_dtype=jnp.bfloat16, chunkwise_kernel=kernel)
    img0 = jnp.zeros((batch, 640, 640, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)({"params": rng, "droppath": rng}, img0)
    tx = ademamix(3e-4)
    state = TrainState.create(variables, tx)

    step = jax.jit(make_train_step(model, tx, nc=80, end2end=True))

    M = 32
    def mk(key):
        img = jax.random.randint(key, (batch, 640, 640, 3), 0, 255, jnp.uint8)
        cls = jnp.zeros((batch, M), jnp.int32)
        bb = jnp.tile(jnp.asarray([100.0, 100.0, 300.0, 300.0]), (batch, M, 1))
        mask = jnp.ones((batch, M), bool).at[:, 8:].set(False)
        return {"img": img, "cls": cls, "bboxes": bb, "mask": mask}

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)
    batches = [mk(k) for k in keys]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])

    print(f"{sys.argv[1]}-b{batch}: compiling...", flush=True)
    t0 = time.perf_counter()
    for i, b in enumerate(batches[:WARMUP]):
        state, items = step(state, b, jax.random.fold_in(rng, i))
        _ = float(jax.tree.leaves(items)[0])
        print(f"warmup {i} done ({time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    for i, b in enumerate(batches[WARMUP:]):
        state, items = step(state, b, jax.random.fold_in(rng, 100 + i))
    _ = float(jax.tree.leaves(items)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"RESULT train-{sys.argv[1]}-b{batch}: {batch / dt:.1f} img/s "
          f"({dt * 1e3:.0f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
