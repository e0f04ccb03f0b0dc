#!/usr/bin/env python
"""A/B the fused Pallas TAL-metric kernel INSIDE the real train step.

VERDICT r4 item 3: the kernel (ops/pallas/tal_metric.py) was built in r3
and TPU-parity-validated standalone, but never measured where it was
built to run — the full train step's loss section (22.2 ms of 164.5 at
b8, r4 decomp).  This script traces the SAME make_train_step twice, once
with XY_TAL_KERNEL=0 (jnp assigner) and once =1 (Pallas metric stage),
and interleaves timed rounds of the two compiled programs so relay
drift cancels.

Relay-safe protocol: distinct device-resident batches, state threaded
through iterations (defeats dispatch dedup), pipelined dispatch with a
scalar fetch barrier per round.  Usage: python scripts/exp_tal_ab.py
Writes /tmp/tpu_queue/tal_ab.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
BATCH, M = 8, 32
WARMUP, ITERS, ROUNDS = 2, 8, 4


def main():
    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import FlatTrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    rng = jax.random.PRNGKey(0)
    img_f = jnp.zeros((BATCH, 640, 640, 3), jnp.float32)
    model_tr, _ = build_detection_model(
        CFG, training=True, compute_dtype=jnp.bfloat16)
    v_tr = jax.jit(model_tr.init)({"params": rng, "droppath": rng}, img_f)
    tx, _, _ = opt_lib.build_flat_optimizer(
        v_tr["params"], name="SGD", lr=0.01, momentum=0.9, weight_decay=5e-4)

    @jax.jit
    def make_train_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        img = jax.random.randint(k1, (BATCH, 640, 640, 3), 0, 255, jnp.uint8)
        cls = jax.random.randint(k2, (BATCH, M), 0, 80, jnp.int32)
        xy = jax.random.uniform(k3, (BATCH, M, 2), minval=40.0, maxval=560.0)
        wh = jax.random.uniform(jax.random.fold_in(k3, 1), (BATCH, M, 2),
                                minval=16.0, maxval=120.0)
        boxes = jnp.concatenate([xy, xy + wh], -1)
        mask = jnp.arange(M)[None, :] < 8
        return {"img": img, "cls": cls, "bboxes": boxes,
                "mask": jnp.broadcast_to(mask, (BATCH, M))}

    n_b = WARMUP + ITERS
    batches = [make_train_batch(k)
               for k in jax.random.split(jax.random.PRNGKey(1), n_b)]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])

    variants = {}
    losses = {}
    for name, env in (("jnp", "0"), ("pallas", "1")):
        os.environ["XY_TAL_KERNEL"] = env
        # fresh jit wrapper per variant; the env var is read at TRACE time
        # (utils/tal.py:170), which happens on the first call below
        step = jax.jit(make_train_step(model_tr, tx, nc=80, accumulate=1))
        state = FlatTrainState.create(v_tr, tx)
        srng = jax.random.PRNGKey(8)
        t0 = time.perf_counter()
        for b in batches[:WARMUP]:
            srng, sub = jax.random.split(srng)
            state, mtr = step(state, b, sub)
            losses[name] = float(mtr["loss"])  # sync
        print(f"RESULT compile_{name}: {time.perf_counter() - t0:.0f}s "
              f"loss={losses[name]:.3f}", flush=True)
        variants[name] = (step, state, srng)

    # same warmed-up loss program => the two variants must agree
    print(f"RESULT loss_delta: {abs(losses['jnp'] - losses['pallas']):.5f}",
          flush=True)

    times = {"jnp": [], "pallas": []}
    for r in range(ROUNDS):
        for name in ("jnp", "pallas"):
            step, state, srng = variants[name]
            t0 = time.perf_counter()
            for b in batches[WARMUP:]:
                srng, sub = jax.random.split(srng)
                state, mtr = step(state, b, sub)
            _ = float(mtr["loss"])  # ordered execution: barrier
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            times[name].append(round(ms, 2))
            variants[name] = (step, state, srng)
            print(f"RESULT round{r} {name}: {ms:.2f} ms/step", flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    out = {
        "batch": BATCH, "iters": ITERS, "rounds": ROUNDS,
        "times_ms": times, "median_ms": med,
        "loss_jnp": losses["jnp"], "loss_pallas": losses["pallas"],
        "speedup_pallas": round(med["jnp"] / med["pallas"], 4),
    }
    Path("/tmp/tpu_queue").mkdir(exist_ok=True)
    Path("/tmp/tpu_queue/tal_ab.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
