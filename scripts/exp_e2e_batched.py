#!/usr/bin/env python
"""Same-session A/B: two-pass vs stacked-batched E2E loss, FULL train step.

The E2E loss is fusion-count-bound (exp_loss_bench: 22.6 ms at b8 for
~2-3 ms of traffic); _e2e_detect_loss_batched runs one2many + one2one as
ONE stacked (2B) pass with a per-sample top-k.  XY_E2E_BATCHED is read
at trace time, so both step functions trace in one process and run
interleaved A/B/A/B (protocol of scripts/exp_remat2.py).

Usage: python scripts/exp_e2e_batched.py [batch]
Writes /tmp/tpu_queue/e2e_batched.json
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

    model, _ = build_detection_model(
        cfg, training=True, compute_dtype=jnp.bfloat16,
        chunkwise_kernel="auto" if tiny else "chunkwise--pallas_xl_chunk_siging_v2")
    variables = jax.jit(model.init)({"params": rng, "droppath": rng}, img0)
    tx, _, _ = opt_lib.build_flat_optimizer(
        variables["params"], name="SGD", lr=0.01, momentum=0.9)

    def build(flag: str):
        os.environ["XY_E2E_BATCHED"] = flag  # read at trace time
        state = FlatTrainState.create(variables, tx)
        step = jax.jit(make_train_step(model, tx, nc=80, end2end=True))
        return state, step

    st_t, step_t = build("0")
    st_b, step_b = build("1")

    def mk(key):
        img = jax.random.randint(key, (batch, imgsz, imgsz, 3), 0, 255, jnp.uint8)
        cls = jnp.zeros((batch, M), jnp.int32)
        bb = jnp.tile(jnp.asarray([100.0, 100.0, 300.0, 300.0]), (batch, M, 1))
        mask = jnp.ones((batch, M), bool).at[:, 8:].set(False)
        return {"img": img, "cls": cls, "bboxes": bb, "mask": mask}

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ROUNDS)
    batches = [mk(k) for k in keys]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])

    states = {"twopass": st_t, "batched": st_b}
    steps = {"twopass": step_t, "batched": step_b}
    losses = {}
    for lab in ("twopass", "batched"):
        t0 = time.perf_counter()
        for i in range(WARMUP):
            states[lab], it = steps[lab](states[lab], batches[i],
                                         jax.random.fold_in(rng, i))
            losses[lab] = float(it["loss"])
        print(f"{lab}: compiled+warm ({time.perf_counter() - t0:.1f}s) "
              f"loss {losses[lab]:.4f}", flush=True)
    assert abs(losses["twopass"] - losses["batched"]) < 1e-2 * max(
        1.0, abs(losses["twopass"])), losses

    times = {"twopass": [], "batched": []}
    for r in range(ROUNDS):
        order = ("twopass", "batched") if r % 2 == 0 else ("batched", "twopass")
        for lab in order:
            t0 = time.perf_counter()
            states[lab], it = steps[lab](states[lab], batches[WARMUP + r],
                                         jax.random.fold_in(rng, 100 + r))
            _ = float(it["loss"])  # barrier
            times[lab].append((time.perf_counter() - t0) * 1e3)

    results = {"batch": batch}
    for lab in ("twopass", "batched"):
        ts = sorted(times[lab])
        results[lab] = {"median_ms": round(ts[len(ts) // 2], 2),
                        "all_ms": [round(t, 1) for t in times[lab]]}
        print(f"RESULT e2e_{lab}: median {results[lab]['median_ms']} ms",
              flush=True)

    out = Path("/tmp/tpu_queue/e2e_batched.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
