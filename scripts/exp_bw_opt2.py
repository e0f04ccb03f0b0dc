#!/usr/bin/env python
"""Backward launch-config sweep #2: the S1600 kernels + fuse_gates A/B.

exp_bw_opt.py covers the flagship S6400 shape; this covers the OTHER
hot family — the 40x40 grids (backbone stage 2 + FPN blocks 18/24 =
six ViL layers/step) where the default bw grid (B8, HG=3, NC=4) = 96
steps/layer is almost pure pipeline floor (~2.7 ms for ~0.3 ms of
DH-capped compute).  Also A/Bs the fused in-kernel gate-grad rows
(BW_CFG['fuse_gates']) at both shapes.

Usage: python scripts/exp_bw_opt2.py
Writes /tmp/tpu_queue/bw_opt2.json
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

B, NH, DH = 8, 12, 32
H = NH * DH
WARMUP, ROUNDS, ITERS = 2, 4, 4

# (name, S, cs, g, cc, vmem_mb, fuse_gates)
VARIANTS = [
    ("s1600_base",      1600, 400,  4, 1, 0, 0),   # 96 steps
    ("s1600_cc2",       1600, 400,  4, 2, 0, 0),   # 48
    ("s1600_cc4",       1600, 400,  4, 4, 0, 0),   # 24
    ("s1600_g12cc4_v64", 1600, 400, 12, 4, 64, 0),  # 8
    ("s1600_best_fg",   1600, 400,  4, 4, 0, 1),   # fuse_gates on cc4
    ("s6400_best_fg",   6400, 640,  4, 5, 0, 1),   # fuse_gates on cc5
    ("s6400_best",      6400, 640,  4, 5, 0, 0),   # control re-run
    ("s6400_base",      6400, 640,  4, 1, 0, 0),   # cc1 control (prior 14.78)
]


def main():
    key = jax.random.PRNGKey(0)
    shapes = sorted({(s, cs) for _, s, cs, *_ in VARIANTS})
    data = {}
    for S, _ in shapes:
        if (S,) in data:
            continue
        ks = jax.random.split(jax.random.fold_in(key, S), 5)
        mk = lambda k, sh: jax.random.normal(k, sh, jnp.float32).astype(jnp.bfloat16)
        data[(S,)] = dict(
            qs=[mk(k, (B, S, H)) for k in jax.random.split(ks[0], 24)],
            kk=mk(ks[1], (B, S, H)), vv=mk(ks[2], (B, S, H)),
            ii=jax.random.normal(ks[3], (B, S, NH), jnp.float32),
            ff=jax.random.normal(ks[4], (B, S, NH), jnp.float32) + 2.0,
        )
    for d in data.values():
        _ = np.asarray(d["qs"][-1][0, 0, 0])
    print("inputs on device", flush=True)

    def set_cfg(g, cc, vmem, fg):
        m.BW_CFG.update(g=g, cc=cc, vmem_mb=vmem, fuse_gates=fg)

    fns = {}
    # fwd-only per shape: the gate-row hoist lands here too — compare to
    # the prior session's fwd_only 9.23 ms / base fwd+bwd 14.78 ms @S6400
    for S, cs in shapes:
        def fwd(q, k, v, i, f, cs=cs):
            h = kern(q, k, v, i, f, num_heads=NH, chunk_size=cs,
                     compute_dtype=jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32))

        fn = jax.jit(fwd)
        d = data[(S,)]
        try:
            for i in range(WARMUP):
                val = fn(d["qs"][i], d["kk"], d["vv"], d["ii"], d["ff"])
                _ = float(np.asarray(val))
            fns[f"s{S}_fwd_only"] = (lambda *a, f=fn: (f(*a),), S)
        except Exception as e:
            print(f"s{S}_fwd_only: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    for name, S, cs, g, cc, vmem, fg in VARIANTS:
        set_cfg(g, cc, vmem, fg)

        def loss(q, k, v, i, f, cs=cs):
            h = kern(q, k, v, i, f, num_heads=NH, chunk_size=cs,
                     compute_dtype=jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32))

        fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
        d = data[(S,)]
        t0 = time.perf_counter()
        try:
            for i in range(WARMUP):
                val, grads = fn(d["qs"][i], d["kk"], d["vv"], d["ii"], d["ff"])
                _ = float(val) + float(np.asarray(grads[0][0, 0, 0]))
            print(f"{name}: compiled+warm ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
            fns[name] = (fn, S)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        set_cfg(0, 0, 0, 0)

    times: dict[str, list[float]] = {n: [] for n in fns}
    idx = WARMUP
    for r in range(ROUNDS):
        for name, (fn, S) in fns.items():
            d = data[(S,)]
            t0 = time.perf_counter()
            out = None
            for i in range(ITERS):
                out = fn(d["qs"][(idx + i) % len(d["qs"])], d["kk"], d["vv"],
                         d["ii"], d["ff"])
            _ = float(np.asarray(out[0]))
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            times[name].append(round(ms, 2))
            idx += ITERS
        print(f"round {r}: " + " ".join(f"{n}={times[n][-1]}" for n in times),
              flush=True)

    med = {n: round(float(np.median(t)), 2) for n, t in times.items()}
    results = {"shape": f"B{B} NH{NH} DH{DH}", "median_ms": med, "all": times}
    out = Path("/tmp/tpu_queue/bw_opt2.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
