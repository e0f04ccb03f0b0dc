#!/usr/bin/env python
"""Flat-buffer optimizer+EMA vs per-leaf tree chain: full-step A/B on TPU.

The flagship has 731 param leaves (median 384 elements); the tree path's
clip + optimizer + apply + EMA emit ~8 tiny XLA fusions per leaf, while
FlatTrainState (engine/steps.py) runs ~15 large fused ops over one ~109 MB
vector. CPU equivalence is locked in tests/test_flat_opt.py; this script
measures whether the fused form pays on the real chip.

Times the SHIPPED train step (make_train_step, AdEMAMix + warmup like a
real run) with the relay-safe protocol, tree state vs flat state, same
batches. Usage: python scripts/exp_flat_opt.py [batch]
Writes /tmp/tpu_queue/flat_opt.json
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
WARMUP, ITERS = 2, 8
M = 32


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tiny = len(sys.argv) > 2 and sys.argv[2] == "tiny"
    cfg, imgsz = CFG, 640
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg, imgsz = CFG.parent / "vil-det-tiny.yaml", 160

    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import FlatTrainState, TrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    model, _ = build_detection_model(
        cfg, training=True, compute_dtype=jnp.bfloat16,
        chunkwise_kernel="auto" if tiny else "chunkwise--pallas_xl_chunk_siging_v2")
    rng = jax.random.PRNGKey(0)
    img0 = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    variables = jax.jit(model.init)({"params": rng, "droppath": rng}, img0)

    def mk(key):
        img = jax.random.randint(key, (batch, imgsz, imgsz, 3), 0, 255, jnp.uint8)
        cls = jnp.zeros((batch, M), jnp.int32)
        bb = jnp.tile(jnp.asarray([100.0, 100.0, 300.0, 300.0]), (batch, M, 1))
        mask = jnp.ones((batch, M), bool).at[:, 8:].set(False)
        return {"img": img, "cls": cls, "bboxes": bb, "mask": mask}

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)
    batches = [mk(k) for k in keys]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])

    kw = dict(name="AdEMAMix", lr=3e-4, momentum=0.9, weight_decay=5e-4,
              iterations=1000, warmup_steps=100)
    results = {"batch": batch}
    for label in ("tree", "flat"):
        build = (opt_lib.build_flat_optimizer if label == "flat"
                 else opt_lib.build_optimizer)
        tx, _, _ = build(variables["params"], **kw)
        state_cls = FlatTrainState if label == "flat" else TrainState
        state = state_cls.create(variables, tx)
        step = jax.jit(make_train_step(model, tx, nc=80, end2end=True))

        t0 = time.perf_counter()
        for i in range(WARMUP):
            state, items = step(state, batches[i], jax.random.fold_in(rng, i))
            _ = float(items["loss"])
        print(f"{label}: compiled+warm ({time.perf_counter() - t0:.1f}s)", flush=True)
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, items = step(state, batches[WARMUP + i],
                                jax.random.fold_in(rng, 100 + i))
        _ = float(items["loss"])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[label] = round(ms, 2)
        print(f"RESULT {label}: {ms:.1f} ms/step", flush=True)
        del state, step, tx

    if "tree" in results and "flat" in results:
        results["speedup"] = round(results["tree"] / results["flat"], 4)
    out = Path("/tmp/tpu_queue/flat_opt.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
