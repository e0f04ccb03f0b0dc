#!/usr/bin/env python
"""A/B the v3 sub-chunked forward kernel vs the v2 forward, on-chip.

VERDICT r5 item 1: the v2 fw runs 2-3x above its tile floor; v3
(ops/pallas/chunkwise_fw3.py) restructures the body with in-kernel
Lb-row sub-chunking + head-interleaved pipelining.  Times the
save_states=True (train fwd) and save_states=False (inference/primal)
variants at the flagship shape, interleaved rounds, lax.scan-pipelined
so each variant is ONE dispatch per round (relay-safe).

Usage: python scripts/exp_fw3.py   ->  /tmp/tpu_queue/fw3.json
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

from xlstm_yolo_tpu.ops.pallas.chunkwise_fw3 import fw3  # noqa: E402
from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import _fw  # noqa: E402

B, S, NH, DH, CS = 8, 6400, 12, 32, 640
N = 8  # scan iterations per timed dispatch
ROUNDS = 4
bf16 = jnp.bfloat16
f32 = jnp.float32


def make_inputs(key):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (N, B, S, NH * DH), f32).astype(bf16)
    k = jax.random.normal(ks[1], (N, B, S, NH * DH), f32).astype(bf16)
    v = jax.random.normal(ks[2], (N, B, S, NH * DH), f32).astype(bf16)
    i = jax.random.normal(ks[3], (N, B, S, NH), f32) - 2.0
    f = jax.random.normal(ks[4], (N, B, S, NH), f32) + 3.0
    return q, k, v, i, f


def scan_fn(fn):
    @jax.jit
    def run(stacked, jitter):
        # jitter: distinct per call — the relay dedups IDENTICAL
        # dispatches (CLAUDE.md), so every timed call must differ in args
        def body(c, xs):
            outs = fn(*xs)
            s = sum(jnp.sum(o.astype(f32)) for o in outs if o is not None)
            return c + s, None
        out, _ = jax.lax.scan(body, jitter * 1e-20, stacked)
        return out
    return run


def main():
    variants = {
        "v2_save": scan_fn(lambda q, k, v, i, f: _fw(
            q, k, v, i, f, NH, chunk_size=CS, eps=1e-6,
            compute_dtype=bf16, save_states=True)),
        "v3_lb128_save": scan_fn(lambda q, k, v, i, f: fw3(
            q, k, v, i, f, NH, chunk_size=CS, sub_chunk=128, eps=1e-6,
            compute_dtype=bf16, save_states=True)),
        "v3_lb320_save": scan_fn(lambda q, k, v, i, f: fw3(
            q, k, v, i, f, NH, chunk_size=CS, sub_chunk=320, eps=1e-6,
            compute_dtype=bf16, save_states=True)),
        "v3_cs1280_save": scan_fn(lambda q, k, v, i, f: fw3(
            q, k, v, i, f, NH, chunk_size=1280, sub_chunk=128, eps=1e-6,
            compute_dtype=bf16, save_states=True)),
        "v2_nosave": scan_fn(lambda q, k, v, i, f: _fw(
            q, k, v, i, f, NH, chunk_size=CS, eps=1e-6,
            compute_dtype=bf16, save_states=False)),
        "v3_lb128_nosave": scan_fn(lambda q, k, v, i, f: fw3(
            q, k, v, i, f, NH, chunk_size=CS, sub_chunk=128, eps=1e-6,
            compute_dtype=bf16, save_states=False)),
        "v3_cs1280_nosave": scan_fn(lambda q, k, v, i, f: fw3(
            q, k, v, i, f, NH, chunk_size=1280, sub_chunk=128, eps=1e-6,
            compute_dtype=bf16, save_states=False)),
    }
    stacked = make_inputs(jax.random.PRNGKey(0))
    _ = np.asarray(stacked[0][0, 0, 0, 0])

    jit_i = 0

    def jit_next():
        nonlocal jit_i
        jit_i += 1
        return jnp.asarray(float(jit_i), f32)

    vals = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        vals[name] = float(fn(stacked, jit_next()))
        print(f"RESULT compile_{name}: {time.perf_counter() - t0:.0f}s "
              f"val={vals[name]:.1f}", flush=True)

    # value cross-checks (same math, fp-reassociation tolerance)
    for a, b in (("v2_save", "v3_lb128_save"), ("v2_nosave", "v3_lb128_nosave")):
        rel = abs(vals[a] - vals[b]) / max(abs(vals[a]), 1.0)
        print(f"RESULT reldiff {a} vs {b}: {rel:.2e}", flush=True)

    times = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out = fn(stacked, jit_next())
            _ = float(out)
            ms = (time.perf_counter() - t0) / N * 1e3
            times[name].append(round(ms, 3))
            print(f"RESULT round{r} {name}: {ms:.3f} ms/call", flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    out = {"shape": [B, S, NH, DH], "cs": CS, "N": N,
           "times_ms": times, "median_ms": med}
    Path("/tmp/tpu_queue").mkdir(exist_ok=True)
    Path("/tmp/tpu_queue/fw3.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
