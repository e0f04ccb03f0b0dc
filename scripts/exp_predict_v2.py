#!/usr/bin/env python
"""TPU experiment: native XLA-scan predict vs v2-Pallas two-program predict.

Measures, in ONE session (relay noise is ±10-15% across sessions):
  a) tiny matmul probe (worker health)
  b) current default: one fused program, XLA chunkwise scan, on-device topk
  c) two-program split: decode_only forward + separate topk program,
     XLA scan (isolates the split cost from the kernel change)
  d) two-program split with the v2 Pallas chunkwise kernel

Protocol per docs/KNOWN_ISSUES.md: distinct device-made inputs, pipelined
dispatch, small host fetch as barrier.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
BATCH = 8
WARMUP = 2
ITERS = 16


def probe():
    x = jnp.ones((128, 128), jnp.bfloat16)
    y = np.asarray(jax.jit(lambda a: a @ a)(x))
    print("probe ok", float(y[0, 0]), flush=True)


def measure(predict, fused_vars, label):
    @jax.jit
    def make_batch(key):
        return jax.random.randint(key, (BATCH, 640, 640, 3), 0, 255, jnp.uint8)

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)
    batches = [make_batch(k) for k in keys]
    _ = np.asarray(batches[-1][0, 0, 0])
    for b in batches[:WARMUP]:
        np.asarray(jax.tree.leaves(predict(fused_vars, b))[0])
    t0 = time.perf_counter()
    outs = [predict(fused_vars, b) for b in batches[WARMUP:]]
    _ = np.asarray(jax.tree.leaves(outs[-1])[0])
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt
    print(f"{label}: {ips:.1f} img/s ({dt / ITERS * 1e3:.1f} ms/batch)", flush=True)
    return ips


def build(fused_vars_np, kernel, decode_only):
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    model, _ = build_detection_model(
        CFG, compute_dtype=jnp.bfloat16, fused=True,
        chunkwise_kernel=kernel, decode_only=decode_only,
    )
    fused_vars = jax.tree.map(jnp.asarray, fused_vars_np)

    if decode_only:
        from xlstm_yolo_tpu.nn.head import topk_postprocess

        @jax.jit
        def post(y):
            return topk_postprocess(y, 300, 80)

        @jax.jit
        def fwd(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            y, _ = model.apply(variables, x)
            return y

        def predict(variables, img_u8):
            return post(fwd(variables, img_u8))
    else:
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
        jax.random.PRNGKey(0), jnp.zeros((BATCH, 640, 640, 3), jnp.float32)
    )
    fused_np = fuse_variables(jax.tree.map(np.asarray, variables))
    del variables

    results = {}
    for label, kernel, decode_only in [
        ("native-fused", "auto", False),
        ("native-2prog", "auto", True),
        ("pallasv2-2prog", "chunkwise--pallas_xl_chunk_siging_v2", True),
    ]:
        predict, fused_vars = build(fused_np, kernel, decode_only)
        results[label] = measure(predict, fused_vars, label)
        probe()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
