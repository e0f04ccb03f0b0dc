#!/usr/bin/env python
"""A/B the fused FFN-branch backward in the real train step.

Follow-up to the epilogue fusion win (164.67 -> 159.66 ms/step):
ops/pallas/ffn.py fuses the [ffn_norm -> gate/z -> silu*z -> down]
backward into one Pallas kernel.  Interleaves timed rounds of the full
train step with layers.FFN_FUSE off/on (EPI_FUSE stays at its
default ON in both variants, so this measures the FFN increment).

Usage: python scripts/exp_ffn_fuse.py   ->  /tmp/tpu_queue/ffn_ab.json
"""

from __future__ import annotations

import json
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
    from xlstm_yolo_tpu.nn import layers as L
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

    batches = [make_train_batch(k)
               for k in jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])

    variants = {}
    losses = {}
    for name, flag in (("unfused", False), ("fused", True)):
        L.FFN_FUSE = flag  # read at TRACE time (nn/layers.py mlstm_branch)
        step = jax.jit(make_train_step(model_tr, tx, nc=80, accumulate=1))
        state = FlatTrainState.create(v_tr, tx)
        srng = jax.random.PRNGKey(8)
        t0 = time.perf_counter()
        for b in batches[:WARMUP]:
            srng, sub = jax.random.split(srng)
            state, mtr = step(state, b, sub)
            losses[name] = float(mtr["loss"])
        print(f"RESULT compile_{name}: {time.perf_counter() - t0:.0f}s "
              f"loss={losses[name]:.3f}", flush=True)
        variants[name] = (step, state, srng)

    print(f"RESULT loss_delta: {abs(losses['unfused'] - losses['fused']):.5f}",
          flush=True)

    times = {"unfused": [], "fused": []}
    for r in range(ROUNDS):
        for name in times:
            step, state, srng = variants[name]
            t0 = time.perf_counter()
            for b in batches[WARMUP:]:
                srng, sub = jax.random.split(srng)
                state, mtr = step(state, b, sub)
            _ = float(mtr["loss"])
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            times[name].append(round(ms, 2))
            variants[name] = (step, state, srng)
            print(f"RESULT round{r} {name}: {ms:.2f} ms/step", flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    out = {
        "batch": BATCH, "iters": ITERS, "rounds": ROUNDS,
        "times_ms": times, "median_ms": med,
        "loss_unfused": losses["unfused"], "loss_fused": losses["fused"],
        "speedup_fused": round(med["unfused"] / med["fused"], 4),
    }
    Path("/tmp/tpu_queue").mkdir(exist_ok=True)
    Path("/tmp/tpu_queue/ffn_ab.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
