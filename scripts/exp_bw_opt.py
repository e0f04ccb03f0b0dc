#!/usr/bin/env python
"""Backward-kernel launch-config sweep (VERDICT r3 item 1).

The v2 fused bw kernel's default grid at the flagship train shape
(B8 S6400 NH12 DH32 cs640) is (B=8, HG=3, NC=10) = 240 sequential grid
steps; at the measured ~28 us fixed per-step pipeline overhead the floor
alone (~6.7 ms) accounts for most of the ~7.6 ms bw time.  Two new
launch knobs (ops/pallas/chunkwise_v2.BW_CFG) cut the step count:

  g        head-group per grid step (wider G needs a raised VMEM limit)
  cc       chunks per grid step (in-kernel reverse loop; transient
           (L, L) VMEM does NOT grow with cc)
  vmem_mb  Mosaic scoped-VMEM limit raise (v5e has 128 MB physical)

This script compiles every candidate config ONCE, then interleaves
timed rounds across variants (relay noise is session-level, so same-
session interleaving is the only trustworthy A/B).  Also measures the
fwd-only kernel so bw = (fwd+bwd) - fwd decomposes.

Usage: python scripts/exp_bw_opt.py
Writes /tmp/tpu_queue/bw_opt.json
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

from xlstm_yolo_tpu.ops.pallas import chunkwise_v2 as m

kern = m.mlstm_siging_chunkwise_pallas_v2_bsh

SMOKE = bool(int(__import__("os").environ.get("XY_SMOKE", "0")))
if SMOKE:  # CPU interpret-mode plumbing check, not a measurement
    B, S, NH, DH, CS = 2, 64, 4, 16, 16
    WARMUP, ROUNDS, ITERS = 1, 1, 1
    VARIANTS = [
        ("base", 0, 1, 0), ("g4_cc2", 4, 2, 0), ("g4_cc4_v48", 4, 4, 48),
    ]
else:
    B, S, NH, DH, CS = 8, 6400, 12, 32, 640
    WARMUP, ROUNDS, ITERS = 2, 4, 4  # ROUNDS interleaved passes of ITERS each

    # (name, g, cc, vmem_mb); grid steps = B * (NH/g) * (NC/cc), NC = 10
    VARIANTS = [
        ("base_g4",        4, 1, 0),    # 240 steps (current default)
        ("g4_cc2",         4, 2, 0),    # 120
        ("g4_cc5",         4, 5, 0),    # 48
        ("g4_cc10_v48",    4, 10, 48),  # 24
        ("g12_v64",       12, 1, 64),   # 80
        ("g12_cc2_v80",   12, 2, 80),   # 40
    ]
H = NH * DH


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    mk = lambda k, sh: jax.random.normal(k, sh, jnp.float32).astype(jnp.bfloat16)
    qs = [mk(k, (B, S, H)) for k in jax.random.split(ks[0], 64)]
    kk, vv = mk(ks[1], (B, S, H)), mk(ks[2], (B, S, H))
    ii = jax.random.normal(ks[3], (B, S, NH), jnp.float32)
    ff = jax.random.normal(ks[4], (B, S, NH), jnp.float32) + 2.0
    _ = np.asarray(qs[-1][0, 0, 0])
    print("inputs on device", flush=True)

    def set_cfg(g, cc, vmem):
        m.BW_CFG["g"], m.BW_CFG["cc"], m.BW_CFG["vmem_mb"] = g, cc, vmem

    # fwd-only reference (launch config of the fw kernel is untouched)
    def fwd(q, k, v, i, f):
        h = kern(q, k, v, i, f, num_heads=NH, chunk_size=CS,
                 compute_dtype=jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32))

    fns = {}
    fns["fwd_only"] = jax.jit(fwd)

    for name, g, cc, vmem in VARIANTS:
        set_cfg(g, cc, vmem)

        def loss(q, k, v, i, f):
            h = kern(q, k, v, i, f, num_heads=NH, chunk_size=CS,
                     compute_dtype=jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32))

        fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
        t0 = time.perf_counter()
        try:
            for i in range(WARMUP):
                val, grads = fn(qs[i], kk, vv, ii, ff)
                _ = float(val) + float(np.asarray(grads[0][0, 0, 0]))
            print(f"{name}: compiled+warm ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
            fns[name] = fn
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        set_cfg(0, 0, 0)

    # warm the fwd-only too
    for i in range(WARMUP):
        v0 = fns["fwd_only"](qs[i], kk, vv, ii, ff)
    _ = float(np.asarray(v0))

    times: dict[str, list[float]] = {n: [] for n in fns}
    idx = WARMUP
    for r in range(ROUNDS):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for i in range(ITERS):
                out = fn(qs[(idx + i) % len(qs)], kk, vv, ii, ff)
            leaf = out[0] if isinstance(out, tuple) else out
            _ = float(np.asarray(leaf))
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            times[name].append(round(ms, 2))
            idx += ITERS
        print(f"round {r}: " + " ".join(f"{n}={times[n][-1]}" for n in times),
              flush=True)

    med = {n: round(float(np.median(t)), 2) for n, t in times.items()}
    fwd_ms = med.get("fwd_only", 0.0)
    results = {
        "shape": f"B{B} S{S} NH{NH} DH{DH} cs{CS}",
        "median_ms": med,
        "bw_ms": {n: round(v - fwd_ms, 2) for n, v in med.items()
                  if n != "fwd_only"},
        "all": times,
    }
    out = Path("/tmp/tpu_queue/bw_opt.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
