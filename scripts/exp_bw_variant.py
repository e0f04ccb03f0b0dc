#!/usr/bin/env python
"""A/B the v2 backward-kernel redesigns on the real TPU.

Variants (module flag xlstm_yolo_tpu.ops.pallas.chunkwise_v2.BW_VARIANT,
set per-loop-iteration BEFORE tracing — both variants trace in ONE
process so the comparison is same-session):

  row   fused single-pass backward (reverse dC scan folded into the
        dQ/dK/dV kernel), chunk outputs (L, DH)
  col   same fusion, transposed (DH, L) outputs so the big output
        matmuls keep the MXU lane dim L-wide instead of DH=32
        (25% cap) + one XLA transpose per grad outside the kernel

Baseline to beat: the committed two-pass backward measured
17.2 ms fwd+bwd at (B8, S6400, NH12, DH32, cs640)
(scripts/exp_chunk_train.py, COMPONENTS.md round-3 sweep).

Relay-safe protocol: distinct device inputs, pipelined dispatch,
scalar fetch barrier.  Also times fwd-only (unchanged between
variants) so bwd = total - fwd can be attributed.

Usage: python scripts/exp_bw_variant.py [S] [cs]
Writes /tmp/tpu_queue/bw_variant.json
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

import xlstm_yolo_tpu.ops.pallas.chunkwise_v2 as m

B, NH, DH = 8, 12, 32
H = NH * DH
WARMUP, ITERS = 2, 8


def time_fn(g, inputs, fixed):
    t0 = time.perf_counter()
    for i in range(WARMUP):
        out = g(inputs[i], *fixed)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = g(inputs[WARMUP + i], *fixed)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3, compile_s


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 6400
    cs = int(sys.argv[2]) if len(sys.argv) > 2 else 640

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    mk = lambda k, sh: jax.random.normal(k, sh, jnp.float32).astype(jnp.bfloat16)
    qs = [mk(k, (B, S, H)) for k in jax.random.split(ks[0], WARMUP + ITERS)]
    kk, vv = mk(ks[1], (B, S, H)), mk(ks[2], (B, S, H))
    ii = jax.random.normal(ks[3], (B, S, NH), jnp.float32)
    ff = jax.random.normal(ks[4], (B, S, NH), jnp.float32) + 2.0
    _ = np.asarray(qs[-1][0, 0, 0])

    results = {"shape": f"B{B} S{S} NH{NH} DH{DH} cs{cs}"}

    def loss(q, k, v, i, f):
        h = m.mlstm_siging_chunkwise_pallas_v2_bsh(
            q, k, v, i, f, num_heads=NH, chunk_size=cs,
            compute_dtype=jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32))

    # fwd-only reference point (identical for both variants)
    fwd = jax.jit(loss)
    ms, comp = time_fn(fwd, qs, (kk, vv, ii, ff))
    results["fwd_only_ms"] = round(ms, 2)
    print(f"RESULT fwd_only: {ms:.2f} ms (compile {comp:.0f}s)", flush=True)

    # interleave the two variants A/B/A/B to cancel session drift
    for variant in ("row", "col", "row2", "col2"):
        m.BW_VARIANT = variant.rstrip("2")
        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
        try:
            ms, comp = time_fn(g, qs, (kk, vv, ii, ff))
            results[variant] = round(ms, 2)
            print(f"RESULT {variant}: {ms:.2f} ms fwd+bwd (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:
            results[variant] = f"fail: {type(e).__name__}: {str(e)[:160]}"
            print(f"RESULT {variant}: {results[variant]}", flush=True)

    out = Path("/tmp/tpu_queue/bw_variant.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
