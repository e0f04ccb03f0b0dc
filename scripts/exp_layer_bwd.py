#!/usr/bin/env python
"""Incremental-truncation drill into the ViLLayer backward.

exp_bwd_blocks located the layer cost: mLSTM cell fwd 4.2 / bwd 6.1 ms,
but one full ViLLayer is fwd 4.9 / bwd 10.7 ms while every other sub-op
(proj denses, dwconv, FFN, norms) measures ~free individually — so
~3.4 ms of backward is unattributed composition overhead.  This script
rebuilds the mlstm-branch math stage by stage (same shapes, same kernel)
and times fwd and value_and_grad at each truncation point, so the first
stage whose *increment* is expensive names the culprit.

Also A/Bs the ifgate projection: the shipped path materializes a
concat([q,k,v]) (B, S, 3*inner) cast to f32 (~236 MB at flagship shape)
just to produce a 2*NH-wide gate preactivation; the split variant
computes q@Wq + k@Wk + v@Wv from slices of the same (3*inner, 2*NH)
kernel, which XLA can fuse without the concat buffer (and with the
f32 cast folded into the dot operands).

Usage: python scripts/exp_layer_bwd.py [stage ...]
Writes /tmp/tpu_queue/layer_bwd.json
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import flax.linen as nn  # noqa: E402

from xlstm_yolo_tpu.nn import layers as L  # noqa: E402

N = 8
B = 8
DIM, INNER, NH, S, HW, CS = 192, 384, 12, 6400, 80, 640
bf16 = jnp.bfloat16
f32 = jnp.float32
results = {}


def timeit2(label, module, variables, stacked):
    def fwd_one(v, x):
        y = module.apply(v, x)
        return jax.tree.leaves(y)[0].astype(f32).sum()

    @jax.jit
    def fwd_scan(v, st):
        def body(c, x):
            return c + fwd_one(v, x), None
        out, _ = jax.lax.scan(body, jnp.zeros([], f32), st)
        return out

    @jax.jit
    def grad_scan(v, st):
        def body(c, x):
            val, grads = jax.value_and_grad(fwd_one)(v, x)
            gsum = sum(jnp.sum(g.astype(f32)) for g in jax.tree.leaves(grads))
            return c + val + gsum, None
        out, _ = jax.lax.scan(body, jnp.zeros([], f32), st)
        return out

    ms = {}
    for tag, fn in (("fwd", fwd_scan), ("grad", grad_scan)):
        float(fn(variables, stacked))  # compile+warm
        t0 = time.perf_counter()
        float(fn(variables, stacked))
        ms[tag] = (time.perf_counter() - t0) / N * 1e3
    results[label] = {"fwd_ms": round(ms["fwd"], 3),
                      "fwdgrad_ms": round(ms["grad"], 3),
                      "bwd_ms": round(ms["grad"] - ms["fwd"], 3)}
    print(f"RESULT {label}: fwd {ms['fwd']:.2f} | fwd+grad {ms['grad']:.2f}"
          f" | bwd {ms['grad'] - ms['fwd']:.2f} ms", flush=True)
    out = Path("/tmp/tpu_queue/layer_bwd.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))


def rand_stack(shape, dtype=bf16):
    ks = jax.random.split(jax.random.PRNGKey(0), N)
    return jnp.stack([
        jax.random.normal(k, shape, f32).astype(dtype) for k in ks])


class Trunc(nn.Module):
    """ViLLayer mlstm-branch replica, truncated after `stage`.

    Stages: 1 proj_up | 2 +conv+silu | 3 +qk/v proj | 4 +ifgate preact
    | 5 +v2 kernel | 6 +outnorm | 7 +skip+proj_down.
    `ifgate_mode`: "concat" (shipped) or "split" (concat-free).
    """

    stage: int
    ifgate_mode: str = "concat"

    @nn.compact
    def __call__(self, x):  # (B, S, DIM) bf16
        x_inner = nn.Dense(2 * INNER, dtype=bf16, name="proj_up")(x)
        if self.stage == 1:
            return x_inner
        x_qk, x_v = jnp.split(x_inner, 2, axis=-1)
        conv_out = L.SequenceConv2d(dim=INNER, kernel_size=3,
                                    seqlens=(HW, HW), dtype=bf16,
                                    name="conv")(x_qk)
        x_qk_act = nn.silu(conv_out)
        if self.stage == 2:
            return x_qk_act
        qk = nn.Dense(2 * INNER, dtype=bf16, name="qk_proj")(x_qk_act)
        q, k = jnp.split(qk, 2, axis=-1)
        v = nn.Dense(INNER, dtype=bf16, name="v_proj")(x_v)
        if self.stage == 3:
            return q + k + v
        w = self.param("ifgate_kernel",
                       nn.initializers.normal(0.02), (3 * INNER, 2 * NH), f32)
        b = self.param("ifgate_bias", nn.initializers.zeros, (2 * NH,), f32)
        if self.ifgate_mode == "concat":
            gate_in = jnp.concatenate([q, k, v], axis=-1)
            if_preact = gate_in.astype(f32) @ w + b
        else:
            wq, wk, wv = jnp.split(w, 3, axis=0)
            if_preact = (q.astype(f32) @ wq + k.astype(f32) @ wk
                         + v.astype(f32) @ wv + b)
        if_preact = L.soft_cap(if_preact, 15.0)
        i_pre, f_pre = jnp.split(if_preact, 2, axis=-1)
        if self.stage == 4:
            return if_preact
        from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import (
            mlstm_siging_chunkwise_pallas_v2_bsh as kern,
        )
        h = kern(q, k, v, i_pre, f_pre, num_heads=NH, chunk_size=CS,
                 eps=5e-5, compute_dtype=bf16)
        if self.stage == 5:
            return h
        h = L.MultiHeadLayerNorm(
            num_heads=NH, head_dim=INNER // NH, use_bias=True, eps=1e-6,
            data_format="BSND", name="outnorm",
        )(h.astype(bf16).reshape(B, S, NH, INNER // NH)).reshape(B, S, INNER)
        if self.stage == 6:
            return h
        skip = self.param("learnable_skip", nn.initializers.ones, (INNER,), f32)
        h = h + skip.astype(h.dtype) * x_qk_act
        return nn.Dense(DIM, dtype=bf16, name="proj_down")(h)


def main():
    key = jax.random.PRNGKey(0)
    stages = sys.argv[1:] or ["t1", "t2", "t3", "t4", "t4s", "t5", "t5s",
                              "t6", "t7", "layer"]
    x0 = jnp.zeros((B, S, DIM), bf16)
    st = rand_stack((B, S, DIM))

    for tag in stages:
        if tag == "layer":
            KERN = "chunkwise--pallas_xl_chunk_siging_v2"
            m = L.ViLLayer(dim=DIM, seqlens=(HW, HW), chunk_size=512,
                           qkv_block_size=32, conv_kind="2d", training=True,
                           chunkwise_kernel=KERN, compute_dtype=bf16)
            v = m.init(key, x0)
            timeit2("villayer-full", m, v, st)
            continue
        stage = int(tag[1])
        mode = "split" if tag.endswith("s") else "concat"
        m = Trunc(stage=stage, ifgate_mode=mode)
        v = m.init(key, x0)
        timeit2(f"trunc{stage}-{mode}", m, v, st)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
