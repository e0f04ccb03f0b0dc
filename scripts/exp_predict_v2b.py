#!/usr/bin/env python
"""TPU experiment 2: shrink the two-program split cost; probe fused v2.

Order is safety-first (a fault wedges the worker 5-15 min):
  a) v2 two-program with max-score folded into the fwd program
     (post only does top_k on (B, A) + row gathers)
  b) v2 two-program at batch 16 (native single-program batch-16 faults;
     the split program may not)
  c) RISKY LAST: v2 single fused program incl. topk (the v1 fused graph
     faulted; v2 has a different program shape)
Each result prints immediately (flush) so partials survive a fault.
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
WARMUP = 2
ITERS = 16
V2 = "chunkwise--pallas_xl_chunk_siging_v2"


def probe():
    x = jnp.ones((128, 128), jnp.bfloat16)
    y = np.asarray(jax.jit(lambda a: a @ a)(x))
    print("probe ok", float(y[0, 0]), flush=True)


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
    fused_vars = jax.tree.map(jnp.asarray, fused_np)
    results = {}

    # a) split with max folded into fwd
    model_d, _ = build_detection_model(
        CFG, compute_dtype=jnp.bfloat16, fused=True,
        chunkwise_kernel=V2, decode_only=True,
    )

    @jax.jit
    def fwd_max(variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _ = model_d.apply(variables, x)
        return y, y[..., 4:].max(-1)

    @jax.jit
    def post_small(y, best):
        k = 300
        _, idx = jax.lax.top_k(best, k)
        rows = jnp.take_along_axis(y, idx[..., None], axis=1)  # (B, k, 4+nc)
        boxes, scores = rows[..., :4], rows[..., 4:]
        nc = scores.shape[-1]
        flat_scores, flat_idx = jax.lax.top_k(scores.reshape(scores.shape[0], -1), k)
        anchor_idx = flat_idx // nc
        cls_idx = flat_idx % nc
        boxes = jnp.take_along_axis(boxes, anchor_idx[..., None], axis=1)
        return jnp.concatenate(
            [boxes, flat_scores[..., None], cls_idx[..., None].astype(boxes.dtype)], -1
        )

    def predict_a(variables, img_u8):
        y, best = fwd_max(variables, img_u8)
        return post_small(y, best)

    results["v2-2prog-maxfused-b8"] = measure(predict_a, fused_vars, "v2-2prog-maxfused-b8", 8)
    probe()
    print(json.dumps(results), flush=True)

    # b) batch 16 split
    results["v2-2prog-maxfused-b16"] = measure(predict_a, fused_vars, "v2-2prog-maxfused-b16", 16)
    probe()
    print(json.dumps(results), flush=True)

    # c) RISKY: fused single program with topk
    model_f, _ = build_detection_model(
        CFG, compute_dtype=jnp.bfloat16, fused=True, chunkwise_kernel=V2,
    )

    @jax.jit
    def predict_c(variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _ = model_f.apply(variables, x)
        return y

    results["v2-fused-b8"] = measure(predict_c, fused_vars, "v2-fused-b8", 8)
    probe()
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
