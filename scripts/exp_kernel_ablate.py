#!/usr/bin/env python
"""Micro-bench the v2 chunkwise kernel at the flagship hot shape.

B=8, S=6400, H=384 (NH=12, DH=32) — the shape behind pair80/fusion80
(~25 ms of the ~34 ms predict body).  Used with temporary kernel-body
ablations (drop exp / drop decay) to attribute time between MXU matmuls
and VPU gate work.  Relay-safe protocol: distinct device inputs inside
one scanned program, small fetch barrier.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import (
    mlstm_siging_chunkwise_pallas_v2_bsh as kern,
)

B, S, NH, DH = 8, 6400, 12, 32
H = NH * DH
N = 16
CS = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
BP = int(sys.argv[2]) if len(sys.argv) > 2 else 0  # 0 = auto

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 5)
mk = lambda k, sh: jax.random.normal(k, sh, jnp.float32).astype(jnp.bfloat16)
qs = jnp.stack([mk(k, (B, S, H)) for k in jax.random.split(ks[0], N)])
kk = mk(ks[1], (B, S, H))
vv = mk(ks[2], (B, S, H))
ii = jax.random.normal(ks[3], (B, S, NH), jnp.float32)
ff = jax.random.normal(ks[4], (B, S, NH), jnp.float32) + 2.0


@jax.jit
def scanned(qstack):
    def body(c, q):
        h = kern(q, kk, vv, ii, ff, num_heads=NH, chunk_size=CS, batch_pack=BP)
        return c, h.reshape(-1)[:4]
    _, ys = jax.lax.scan(body, None, qstack)
    return ys


np.asarray(scanned(qs))  # compile + warm
t0 = time.perf_counter()
out = scanned(qs)
np.asarray(out)
dt = (time.perf_counter() - t0) / N * 1e3
print(f"RESULT v2-kernel B{B} S{S} NH{NH} DH{DH} cs={CS}: {dt:.3f} ms", flush=True)
