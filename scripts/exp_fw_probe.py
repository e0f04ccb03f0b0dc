#!/usr/bin/env python
"""Isolate where the v2 chunkwise FORWARD kernel's time goes.

r5 finding (exp_fw3): sub-chunking (3x fewer padded tiles) measures
WORSE (9.8 vs 7.6 ms), so the fw is op-count/latency-bound, not
tile-bound.  This probe times stripped-down variants of the v2 body to
attribute the 7.5 ms: matmuls only, no decay matrix, no causal mask, no
state chain, no normalizer sums, and a numerics-CORRECT "merged" variant
that fuses h_intra+h_inter into one [sd|qbar] @ [[v],[C]] matmul.

All variants except 'merged' are WRONG numerically — timing only.
Usage: python scripts/exp_fw_probe.py  -> /tmp/tpu_queue/fw_probe.json
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import _cdiv, _pack_gates  # noqa: E402

B, S, NH, DH, CS = 8, 6400, 12, 32, 640
N = 8
ROUNDS = 3
bf16 = jnp.bfloat16
f32 = jnp.float32


def _body(q_ref, k_ref, v_ref, b_ref, a_ref, li_ref, g_ref,
          h_ref, c_scr, n_scr, *, G, L, DHQK, DHHV, NC, qk_scale,
          use_d, use_mask, use_state, use_sums, merged, dtype):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        c_scr[...] = jnp.zeros((G * DHQK, DHHV), f32)
        n_scr[...] = jnp.zeros((G, DHQK), f32)

    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    causal = row >= col

    qall = q_ref[0]
    kall = k_ref[0]
    vall = v_ref[0]
    for h in range(G):
        q = qall[:, h * DHQK:(h + 1) * DHQK]
        k = kall[:, h * DHQK:(h + 1) * DHQK]
        v = vall[:, h * DHHV:(h + 1) * DHHV]
        b = b_ref[0, 0, h:h + 1, :]
        a = a_ref[0, 0, h:h + 1, :]
        logi = li_ref[0, 0, h:h + 1, :]
        gbar = jnp.exp(g_ref[0, 0, 0, h])
        C_prev = c_scr[h * DHQK:(h + 1) * DHQK, :]
        n_prev = n_scr[h:h + 1, :]

        s = jax.lax.dot_general(
            q.astype(dtype), k.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32) * qk_scale
        sd = s
        if use_d:
            sd = sd * jnp.exp(b.T - b + logi)
        if use_mask:
            sd = jnp.where(causal, sd, 0.0)

        qbar = q.astype(f32) * jnp.exp(b.T) * qk_scale
        if merged:
            # state-chain-first reorder probe (the [sd|qbar]@[[v],[C]]
            # concat-merge fails Mosaic: offset mismatch on non-concat dim)
            kbar = k.astype(f32) * jnp.exp(a.T)
            dC = jax.lax.dot_general(
                kbar.astype(dtype), v.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            h_intra = jax.lax.dot_general(
                sd.astype(dtype), v.astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            h_inter = jax.lax.dot_general(
                qbar.astype(dtype), C_prev.astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            hval = h_intra + h_inter
            if use_sums:
                n_intra = jnp.sum(sd, axis=1, keepdims=True)
                n_inter = jnp.sum(qbar * n_prev, axis=1, keepdims=True)
                den = jnp.maximum(jnp.abs(n_inter + n_intra), 1.0)
                hval = hval / (den + 1e-6)
            h_ref[0, :, h * DHHV:(h + 1) * DHHV] = hval.astype(h_ref.dtype)
            if use_state:
                c_scr[h * DHQK:(h + 1) * DHQK, :] = gbar * C_prev + dC
                n_scr[h:h + 1, :] = gbar * n_prev + jnp.sum(
                    kbar, axis=0, keepdims=True)
            continue
        else:
            h_intra = jax.lax.dot_general(
                sd.astype(dtype), v.astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            h_inter = jax.lax.dot_general(
                qbar.astype(dtype), C_prev.astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            hval = h_intra + h_inter
        if use_sums:
            n_intra = jnp.sum(sd, axis=1, keepdims=True)
            n_inter = jnp.sum(qbar * n_prev, axis=1, keepdims=True)
            den = jnp.maximum(jnp.abs(n_inter + n_intra), 1.0)
            hval = hval / (den + 1e-6)
        h_ref[0, :, h * DHHV:(h + 1) * DHHV] = hval.astype(h_ref.dtype)

        if use_state:
            kbar = k.astype(f32) * jnp.exp(a.T)
            dC = jax.lax.dot_general(
                kbar.astype(dtype), v.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            c_scr[h * DHQK:(h + 1) * DHQK, :] = gbar * C_prev + dC
            n_scr[h:h + 1, :] = gbar * n_prev + jnp.sum(kbar, axis=0,
                                                        keepdims=True)


def build(name, **flags):
    L = CS
    NC = _cdiv(S, L)
    G = NH

    def fw(q, k, v, i, f):
        brow, arow, lirow, scaG = _pack_gates(i, f, NC, L)
        qkcols = lambda b_, hg, j: (b_, j, hg)  # noqa: E731
        rowm = lambda b_, hg, j: (b_, j, hg, 0)  # noqa: E731
        smem = lambda b_, hg, j: (b_, j, 0, hg)  # noqa: E731
        return pl.pallas_call(
            functools.partial(_body, G=G, L=L, DHQK=DH, DHHV=DH, NC=NC,
                              qk_scale=DH**-0.5, dtype=bf16, **flags),
            grid=(B, 1, NC),
            in_specs=[
                pl.BlockSpec((1, L, G * DH), qkcols),
                pl.BlockSpec((1, L, G * DH), qkcols),
                pl.BlockSpec((1, L, G * DH), qkcols),
                pl.BlockSpec((1, 1, G, L), rowm),
                pl.BlockSpec((1, 1, G, L), rowm),
                pl.BlockSpec((1, 1, G, L), rowm),
                pl.BlockSpec((1, 1, 1, G), smem, memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, L, G * DH), qkcols),
            out_shape=jax.ShapeDtypeStruct((B, S, NH * DH), q.dtype),
            scratch_shapes=[pltpu.VMEM((G * DH, DH), f32),
                            pltpu.VMEM((G, DH), f32)],
        )(q, k, v, brow, arow, lirow, scaG)
    return fw


def scan_fn(fn):
    @jax.jit
    def run(stacked, jitter):
        def body(c, xs):
            return c + jnp.sum(fn(*xs).astype(f32)), None
        out, _ = jax.lax.scan(body, jitter * 1e-20, stacked)
        return out
    return run


def main():
    full = dict(use_d=True, use_mask=True, use_state=True, use_sums=True,
                merged=False)
    variants = {
        "full": build("full", **full),
        "reordered": build("reordered", **{**full, "merged": True}),
        "no_d": build("no_d", **{**full, "use_d": False}),
        "no_mask": build("no_mask", **{**full, "use_mask": False}),
        "no_d_no_mask": build("ndm", **{**full, "use_d": False,
                                        "use_mask": False}),
        "no_state": build("no_state", **{**full, "use_state": False}),
        "no_sums": build("no_sums", **{**full, "use_sums": False}),
        "mm_only": build("mm_only", use_d=False, use_mask=False,
                         use_state=True, use_sums=False, merged=False),
    }
    runs = {k: scan_fn(v) for k, v in variants.items()}

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    stacked = (
        jax.random.normal(ks[0], (N, B, S, NH * DH), f32).astype(bf16),
        jax.random.normal(ks[1], (N, B, S, NH * DH), f32).astype(bf16),
        jax.random.normal(ks[2], (N, B, S, NH * DH), f32).astype(bf16),
        jax.random.normal(ks[3], (N, B, S, NH), f32) - 2.0,
        jax.random.normal(ks[4], (N, B, S, NH), f32) + 3.0,
    )
    _ = np.asarray(stacked[0][0, 0, 0, 0])

    jit_i = 0

    def jn():
        nonlocal jit_i
        jit_i += 1
        return jnp.asarray(float(jit_i), f32)

    for name, fn in runs.items():
        t0 = time.perf_counter()
        val = float(fn(stacked, jn()))
        print(f"RESULT compile_{name}: {time.perf_counter() - t0:.0f}s"
              f" val={val:.1f}", flush=True)

    times = {k: [] for k in runs}
    for r in range(ROUNDS):
        for name, fn in runs.items():
            t0 = time.perf_counter()
            _ = float(fn(stacked, jn()))
            ms = (time.perf_counter() - t0) / N * 1e3
            times[name].append(round(ms, 3))
            print(f"RESULT round{r} {name}: {ms:.3f} ms/call", flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    out = {"shape": [B, S, NH, DH], "cs": CS, "times_ms": times,
           "median_ms": med}
    Path("/tmp/tpu_queue").mkdir(exist_ok=True)
    Path("/tmp/tpu_queue/fw_probe.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(med))


if __name__ == "__main__":
    main()
