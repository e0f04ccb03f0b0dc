#!/usr/bin/env python
"""Same-session remat A/B: stage-1 checkpoint on vs off, one process.

exp_remat.py ran the two variants as separate subprocess sessions and
got contradictory numbers (grad favored off by ~19 ms, full step said
on was faster) — the ±10-15% session noise swamps the effect. Here both
step functions are TRACED IN ONE PROCESS (XY_CKPT_THRESH is read at
trace time, layers.py ViLBlockPair) and timed interleaved A/B/A/B with
the relay-safe protocol, so session drift cancels.

Usage: python scripts/exp_remat2.py [batch]
Writes /tmp/tpu_queue/remat2.json
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
WARMUP, ROUNDS = 2, 6
M = 32


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tiny = len(sys.argv) > 2 and sys.argv[2] == "tiny"
    cfg, imgsz = CFG, 640
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg, imgsz = CFG.parent / "vil-det-tiny.yaml", 160

    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import FlatTrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    rng = jax.random.PRNGKey(0)
    img0 = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)

    def build(thresh: str):
        os.environ["XY_CKPT_THRESH"] = thresh  # read at trace time
        model, _ = build_detection_model(
            cfg, training=True, compute_dtype=jnp.bfloat16,
            chunkwise_kernel="auto" if tiny else "chunkwise--pallas_xl_chunk_siging_v2")
        variables = jax.jit(model.init)({"params": rng, "droppath": rng}, img0)
        tx, _, _ = opt_lib.build_flat_optimizer(
            variables["params"], name="SGD", lr=0.01, momentum=0.9)
        state = FlatTrainState.create(variables, tx)
        step = jax.jit(make_train_step(model, tx, nc=80, end2end=True))
        return state, step

    st_on, step_on = build("6400")
    st_off, step_off = build("999999999")

    def mk(key):
        img = jax.random.randint(key, (batch, imgsz, imgsz, 3), 0, 255, jnp.uint8)
        cls = jnp.zeros((batch, M), jnp.int32)
        bb = jnp.tile(jnp.asarray([100.0, 100.0, 300.0, 300.0]), (batch, M, 1))
        mask = jnp.ones((batch, M), bool).at[:, 8:].set(False)
        return {"img": img, "cls": cls, "bboxes": bb, "mask": mask}

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ROUNDS)
    batches = [mk(k) for k in keys]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])

    states = {"on": st_on, "off": st_off}
    steps = {"on": step_on, "off": step_off}
    for lab in ("on", "off"):  # compile + warm both before timing
        t0 = time.perf_counter()
        for i in range(WARMUP):
            states[lab], it = steps[lab](states[lab], batches[i],
                                         jax.random.fold_in(rng, i))
            _ = float(it["loss"])
        print(f"{lab}: compiled+warm ({time.perf_counter() - t0:.1f}s)", flush=True)

    times = {"on": [], "off": []}
    for r in range(ROUNDS):  # interleaved so drift cancels
        for lab in ("on", "off") if r % 2 == 0 else ("off", "on"):
            t0 = time.perf_counter()
            states[lab], it = steps[lab](states[lab], batches[WARMUP + r],
                                         jax.random.fold_in(rng, 100 + r))
            _ = float(it["loss"])  # barrier
            times[lab].append((time.perf_counter() - t0) * 1e3)

    results = {"batch": batch}
    for lab in ("on", "off"):
        ts = sorted(times[lab])
        results[lab] = {"median_ms": round(ts[len(ts) // 2], 2),
                        "all_ms": [round(t, 1) for t in times[lab]]}
        print(f"RESULT remat_{lab}: median {results[lab]['median_ms']} ms", flush=True)

    out = Path("/tmp/tpu_queue/remat2.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
