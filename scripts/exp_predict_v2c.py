#!/usr/bin/env python
"""TPU experiment 3: fused single-program predict with the gather-free
sort-based postprocess — native scan and v2 Pallas variants."""

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
WARMUP = 2
ITERS = 16
V2 = "chunkwise--pallas_xl_chunk_siging_v2"


def probe(tries=30, sleep=30):
    for t in range(tries):
        try:
            x = jnp.ones((128, 128), jnp.bfloat16)
            y = np.asarray(jax.jit(lambda a: a @ a)(x))
            print("probe ok", float(y[0, 0]), flush=True)
            return
        except Exception as e:  # worker recovering
            print(f"probe failed ({t}): {type(e).__name__}", flush=True)
            time.sleep(sleep)
    raise SystemExit("worker did not recover")


def measure(predict, fused_vars, label, batch):
    @jax.jit
    def make_batch(key):
        return jax.random.randint(key, (batch, 640, 640, 3), 0, 255, jnp.uint8)

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)
    batches = [make_batch(k) for k in keys]
    _ = np.asarray(batches[-1][0, 0, 0])
    for b in batches[:WARMUP]:
        np.asarray(jax.tree.leaves(predict(fused_vars, b))[0])
    t0 = time.perf_counter()
    outs = [predict(fused_vars, b) for b in batches[WARMUP:]]
    _ = np.asarray(jax.tree.leaves(outs[-1])[0])
    dt = time.perf_counter() - t0
    ips = batch * ITERS / dt
    print(f"{label}: {ips:.1f} img/s ({dt / ITERS * 1e3:.1f} ms/batch)", flush=True)
    return ips


def build_fused(fused_np, kernel, sort_post):
    from xlstm_yolo_tpu.nn.tasks import DetectionModel, build_detection_model

    model, _ = build_detection_model(
        CFG, compute_dtype=jnp.bfloat16, fused=True, chunkwise_kernel=kernel,
    )
    fused_vars = jax.tree.map(jnp.asarray, fused_np)

    @jax.jit
    def predict(variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _ = model.apply(variables, x)
        return y

    return predict, fused_vars


def main():
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.fuse import fuse_variables

    probe()

    model_init, _ = build_detection_model(CFG, compute_dtype=jnp.bfloat16)
    variables = jax.jit(model_init.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32)
    )
    fused_np = fuse_variables(jax.tree.map(np.asarray, variables))
    del variables
    results = {}

    # 1) v2 Pallas fused single program, sort-based postprocess (the build)
    predict, fv = build_fused(fused_np, V2, sort_post=True)
    results["v2-fused-sortpost-b8"] = measure(predict, fv, "v2-fused-sortpost-b8", 8)
    probe(tries=2, sleep=20)
    print(json.dumps(results), flush=True)

    # 2) same at batch 16
    results["v2-fused-sortpost-b16"] = measure(predict, fv, "v2-fused-sortpost-b16", 16)
    probe(tries=2, sleep=20)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
