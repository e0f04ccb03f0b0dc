#!/usr/bin/env python
"""Chunk-size sweep for the v2 kernel's TRAIN path (fw + custom VJP).

The shipped cs=640 at S=6400 was tuned on the predict forward
(nn/layers.py _call_v2_bsh measured table). The backward pass — reverse
dC scan + fused dQKV kernels — holds more (L, L) transients per grid
step, so its optimum may sit at a smaller L. Times value_and_grad of
the raw kernel at the flagship hot shape (B8, S6400, NH12, DH32) per
chunk size, relay-safe (distinct inputs, pipelined, scalar fetch).

Usage: python scripts/exp_chunk_train.py [sizes...]
Writes /tmp/tpu_queue/chunk_train.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import (
    mlstm_siging_chunkwise_pallas_v2_bsh as kern,
)

B, S, NH, DH = 8, 6400, 12, 32
H = NH * DH
WARMUP, ITERS = 2, 8


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [256, 320, 400, 640, 800]
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    mk = lambda k, sh: jax.random.normal(k, sh, jnp.float32).astype(jnp.bfloat16)
    qs = [mk(k, (B, S, H)) for k in jax.random.split(ks[0], WARMUP + ITERS)]
    kk, vv = mk(ks[1], (B, S, H)), mk(ks[2], (B, S, H))
    ii = jax.random.normal(ks[3], (B, S, NH), jnp.float32)
    ff = jax.random.normal(ks[4], (B, S, NH), jnp.float32) + 2.0
    _ = np.asarray(qs[-1][0, 0, 0])

    results = {}
    for cs in sizes:
        if S % cs:
            print(f"skip cs={cs}: not a divisor of {S}")
            continue

        def loss(q, k, v, i, f):
            h = kern(q, k, v, i, f, num_heads=NH, chunk_size=cs,
                     compute_dtype=jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32))

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
        try:
            t0 = time.perf_counter()
            for i in range(WARMUP):
                val, grads = g(qs[i], kk, vv, ii, ff)
                _ = float(val) + float(grads[0][0, 0, 0])
            print(f"cs={cs}: compiled+warm ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
            t0 = time.perf_counter()
            for i in range(ITERS):
                val, grads = g(qs[WARMUP + i], kk, vv, ii, ff)
            _ = float(val) + float(grads[0][0, 0, 0])
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            results[cs] = round(ms, 2)
            print(f"RESULT cs={cs}: {ms:.2f} ms fwd+bwd", flush=True)
        except Exception as e:
            results[cs] = f"fail: {type(e).__name__}: {str(e)[:120]}"
            print(f"RESULT cs={cs}: {results[cs]}", flush=True)

    out = Path("/tmp/tpu_queue/chunk_train.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
