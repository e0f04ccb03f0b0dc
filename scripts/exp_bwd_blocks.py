#!/usr/bin/env python
"""Per-component FORWARD vs BACKWARD time on TPU (scan-amortized).

exp_bwd_decomp.py showed the train backward runs at 3-4.7x the forward
for the ViL segments (stage-1 pair: fwd 7.2 / bwd 33.5 ms; FPN+head:
fwd 17.9 / bwd 51.6) where ~2-2.5x is the healthy ratio.  This drills
into which sub-op owns the excess: each component is timed fwd-only and
value_and_grad (grads kept alive), both as a lax.scan over N distinct
inputs inside ONE program (amortizes the ~3.5 ms relay dispatch).

Usage: python scripts/exp_bwd_blocks.py [step ...]
Writes /tmp/tpu_queue/bwd_blocks.json
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

N = 8
B = 8
bf16 = jnp.bfloat16
results = {}


def timeit2(label, module, variables, stacked):
    """Time module.apply fwd-only and value_and_grad over params+input."""
    mut = ["batch_stats"] if "batch_stats" in variables else False

    def fwd_one(v, x):
        y = module.apply(v, x, mutable=mut) if mut else module.apply(v, x)
        if mut:
            y = y[0]
        return jax.tree.leaves(y)[0].astype(jnp.float32).sum()

    @jax.jit
    def fwd_scan(v, st):
        def body(c, x):
            return c + fwd_one(v, x), None
        out, _ = jax.lax.scan(body, jnp.zeros([], jnp.float32), st)
        return out

    @jax.jit
    def grad_scan(v, st):
        def body(c, x):
            val, grads = jax.value_and_grad(fwd_one)(v, x)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return c + val + gsum, None
        out, _ = jax.lax.scan(body, jnp.zeros([], jnp.float32), st)
        return out

    ms = {}
    for tag, fn in (("fwd", fwd_scan), ("grad", grad_scan)):
        float(fn(variables, stacked))  # compile+warm
        t0 = time.perf_counter()
        float(fn(variables, stacked))
        ms[tag] = (time.perf_counter() - t0) / N * 1e3
    ratio = ms["grad"] / max(ms["fwd"], 1e-9)
    results[label] = {"fwd_ms": round(ms["fwd"], 3),
                      "fwdgrad_ms": round(ms["grad"], 3),
                      "ratio": round(ratio, 2)}
    print(f"RESULT {label}: fwd {ms['fwd']:.2f} ms | fwd+grad "
          f"{ms['grad']:.2f} ms | ratio {ratio:.2f}", flush=True)
    out = Path("/tmp/tpu_queue/bwd_blocks.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))


def rand_stack(shape, dtype=bf16):
    ks = jax.random.split(jax.random.PRNGKey(0), N)
    return jnp.stack([
        jax.random.normal(k, shape, jnp.float32).astype(dtype) for k in ks])


def main():
    import flax.linen as nn

    from xlstm_yolo_tpu.nn import blocks as Bl
    from xlstm_yolo_tpu.nn import layers as L

    key = jax.random.PRNGKey(0)
    steps = sys.argv[1:] or [
        "dense", "dw80", "cell80", "ffn80", "layer80", "pair80",
        "fusion80", "fusion40", "norm80",
    ]
    KERN = "chunkwise--pallas_xl_chunk_siging_v2"

    if "dense" in steps:  # proj_up-sized matmul (192 -> 768) @ S6400
        m = nn.Dense(768, dtype=bf16)
        v = m.init(key, jnp.zeros((B, 6400, 192), bf16))
        timeit2("dense192->768@6400", m, v, rand_stack((B, 6400, 192)))

    if "dw80" in steps:  # the ViLLayer depthwise conv (inner=384) @ 80x80
        m = L.SequenceConv2d(dim=384, kernel_size=3, seqlens=(80, 80), dtype=bf16)
        v = m.init(key, jnp.zeros((B, 6400, 384), bf16))
        timeit2("dwconv384@80x80", m, v, rand_stack((B, 6400, 384)))

    if "cell80" in steps:  # mLSTM cell alone (inner=384, NH12, DH32)

        class Cell3(nn.Module):
            @nn.compact
            def __call__(self, x):
                return L.MatrixLSTMCell(
                    dim=384, num_heads=12, chunk_size=512,
                    mode="train_with_padding", chunkwise_kernel=KERN,
                    compute_dtype=bf16)(x, x, x)

        c = Cell3()
        v = c.init(key, jnp.zeros((B, 6400, 384), bf16))
        timeit2("cell384nh12@6400", c, v, rand_stack((B, 6400, 384)))

    if "ffn80" in steps:  # the ViLLayer FFN at dim 192 @ S6400
        class FFN(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = nn.Dense(512, dtype=bf16)(x)
                return nn.Dense(192, dtype=bf16)(nn.silu(h))

        f = FFN()
        v = f.init(key, jnp.zeros((B, 6400, 192), bf16))
        timeit2("ffn192@6400", f, v, rand_stack((B, 6400, 192)))

    if "norm80" in steps:  # pre-norm LayerNorm @ S6400
        m = nn.LayerNorm(dtype=bf16)
        v = m.init(key, jnp.zeros((B, 6400, 384), bf16))
        timeit2("layernorm384@6400", m, v, rand_stack((B, 6400, 384)))

    if "layer80" in steps:  # one directional ViLLayer
        m = L.ViLLayer(dim=192, seqlens=(80, 80), chunk_size=512,
                       qkv_block_size=32, conv_kind="2d", training=True,
                       chunkwise_kernel=KERN, compute_dtype=bf16)
        v = m.init(key, jnp.zeros((B, 6400, 192), bf16))
        timeit2("villayer192@6400", m, v, rand_stack((B, 6400, 192)))

    if "pair80" in steps:  # the full stage-1 pair (2 directions)
        m = L.ViLBlockPair(dim=192, seqlens=(80, 80), chunk_size=512,
                           qkv_block_size=32, conv_kind="2d", training=True,
                           chunkwise_kernel=KERN, compute_dtype=bf16)
        v = m.init(key, jnp.zeros((B, 6400, 192), bf16))
        timeit2("pair192@6400", m, v, rand_stack((B, 6400, 192)))

    for tag, hw, cs in (("fusion80", 80, 512), ("fusion40", 40, 512)):
        if tag in steps:
            m = Bl.ViLFusionBlock(c1=384, dim=192, seqlens=(hw, hw),
                                  chunk_size=cs, qkv_block_size=32,
                                  mlp_ratio=4.0, training=True,
                                  chunkwise_kernel=KERN, compute_dtype=bf16)
            v = m.init({"params": key, "droppath": key},
                       jnp.zeros((B, hw, hw, 384), bf16))
            timeit2(f"fusion384->192@{hw}", m, v, rand_stack((B, hw, hw, 384)))

    out = Path("/tmp/tpu_queue/bwd_blocks.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
