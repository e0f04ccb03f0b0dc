#!/usr/bin/env python
"""D-matrix transcendental share of the v2 kernels (hypothesis test).

Launch-config sweeps (exp_bw_opt{,2}.py) measured FLAT across head
group / chunks-per-step / VMEM raises / the gate-row hoist — so the
kernel time is neither MXU-tile nor pipeline-floor bound.  Remaining
suspect: the (L, L) exp building the decay matrix D (~400M VPU
transcendentals per flagship S6400 call, identical in every config).

A/Bs the fw and fw+bw programs under D_MODE in {exp, exp2, probe}
(probe replaces exp with a multiply — wrong numerics, pure timing).
If probe collapses the time, the optimization target is transcendental
COUNT (tiled rank-1 factorization of D), not matmul shape.

Usage: python scripts/exp_bw_opt3.py
Writes /tmp/tpu_queue/bw_opt3.json
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

B, S, NH, DH, CS = 8, 6400, 12, 32, 640
H = NH * DH
WARMUP, ROUNDS, ITERS = 2, 4, 4


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    mk = lambda k, sh: jax.random.normal(k, sh, jnp.float32).astype(jnp.bfloat16)
    qs = [mk(k, (B, S, H)) for k in jax.random.split(ks[0], 24)]
    kk, vv = mk(ks[1], (B, S, H)), mk(ks[2], (B, S, H))
    ii = jax.random.normal(ks[3], (B, S, NH), jnp.float32)
    ff = jax.random.normal(ks[4], (B, S, NH), jnp.float32) + 2.0
    _ = np.asarray(qs[-1][0, 0, 0])
    print("inputs on device", flush=True)

    def fwd(q, k, v, i, f):
        h = kern(q, k, v, i, f, num_heads=NH, chunk_size=CS,
                 compute_dtype=jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32))

    fns = {}
    for mode in ("exp", "exp2", "probe"):
        m.D_MODE = mode
        for kind in ("fwd", "fwbw"):
            name = f"{kind}_{mode}"
            fn = (jax.jit(lambda q, k, v, i, f: fwd(q, k, v, i, f))
                  if kind == "fwd"
                  else jax.jit(jax.value_and_grad(
                      lambda q, k, v, i, f: fwd(q, k, v, i, f),
                      argnums=(0, 1, 2, 3, 4))))
            t0 = time.perf_counter()
            try:
                for i in range(WARMUP):
                    out = fn(qs[i], kk, vv, ii, ff)
                    leaf = out[0] if isinstance(out, tuple) else out
                    _ = float(np.asarray(leaf))
                print(f"{name}: compiled+warm ({time.perf_counter() - t0:.1f}s)",
                      flush=True)
                fns[name] = fn
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                      flush=True)
    m.D_MODE = "exp"

    times = {n: [] for n in fns}
    idx = WARMUP
    for r in range(ROUNDS):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for i in range(ITERS):
                out = fn(qs[(idx + i) % len(qs)], kk, vv, ii, ff)
            leaf = out[0] if isinstance(out, tuple) else out
            _ = float(np.asarray(leaf))
            times[name].append(round((time.perf_counter() - t0) / ITERS * 1e3, 2))
            idx += ITERS
        print(f"round {r}: " + " ".join(f"{n}={times[n][-1]}" for n in times),
              flush=True)

    med = {n: round(float(np.median(t)), 2) for n, t in times.items()}
    results = {"shape": f"B{B} S{S} NH{NH} DH{DH} cs{CS}", "median_ms": med,
               "all": times}
    out = Path("/tmp/tpu_queue/bw_opt3.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
