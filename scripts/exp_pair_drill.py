#!/usr/bin/env python
"""Drill into ViLBlockPair@80x80 cost: bare GEMMs, transposes, norms,
depthwise conv, FFN, cell - each scan-amortized (16 iters, one program)."""
import sys, time
from pathlib import Path
import jax, jax.numpy as jnp, numpy as np
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
N, B, S, D = 16, 8, 6400, 192
bf16 = jnp.bfloat16

def timeit(label, fn, stacked):
    @jax.jit
    def scanned(st):
        def body(c, x):
            y = fn(x)
            return c, jax.tree.leaves(y)[0].reshape(-1)[:4].astype(jnp.float32)
        _, ys = jax.lax.scan(body, None, st)
        return ys
    np.asarray(scanned(stacked))
    t0 = time.perf_counter()
    np.asarray(scanned(stacked))
    print(f"RESULT {label}: {(time.perf_counter()-t0)/N*1e3:.2f} ms", flush=True)

def stack(shape, dtype=bf16):
    ks = jax.random.split(jax.random.PRNGKey(0), N)
    return jnp.stack([jax.random.normal(k, shape, jnp.float32).astype(dtype) for k in ks])

def main():
    from xlstm_yolo_tpu.nn import layers as L
    key = jax.random.PRNGKey(1)
    W1 = jax.random.normal(key, (192, 768), jnp.float32).astype(bf16) * 0.02
    W2 = jax.random.normal(key, (384, 768), jnp.float32).astype(bf16) * 0.02

    x = stack((B, S, D))
    timeit("gemm 51200x192x768", lambda a: a @ W1, x)
    x384 = stack((B, S, 384))
    timeit("gemm 51200x384x768", lambda a: a @ W2, x384)
    timeit("rmsnorm-pass", lambda a: (a.astype(jnp.float32) * jax.lax.rsqrt(
        jnp.mean(a.astype(jnp.float32)**2, -1, keepdims=True) + 1e-6)).astype(bf16), x384)
    timeit("flip-S", lambda a: jnp.flip(a, axis=1), x384)
    timeit("heads-transpose", lambda a: jnp.swapaxes(a.reshape(B, S, 12, 32), 1, 2), x384)
    timeit("silu-pass", lambda a: jax.nn.silu(a), x384)

    sc = L.SequenceConv2d(dim=384, seqlens=(80, 80), dtype=bf16)
    v = sc.init(key, jnp.zeros((B, S, 384), bf16))
    timeit("seqconv2d-dw", lambda a: sc.apply(v, a), x384)

    ffn = L.FeedForward(dim=192, proj_factor=2.6667, round_up_to=64, num_blocks=1, dtype=bf16)
    vf = ffn.init(key, jnp.zeros((B, S, D), bf16))
    timeit("ffn", lambda a: ffn.apply(vf, a), x)

    cell = L.MatrixLSTMCell(dim=384, num_heads=12, chunk_size=512, mode="inference",
                            compute_dtype=bf16)
    q = stack((B, S, 384))
    vc = cell.init(key, q[0], q[0], q[0])
    timeit("cell-native", lambda a: cell.apply(vc, a, a, a), q)
    cellp = L.MatrixLSTMCell(dim=384, num_heads=12, chunk_size=512, mode="inference",
                             chunkwise_kernel="chunkwise--pallas_xl_chunk_siging_v2",
                             compute_dtype=bf16)
    vp = cellp.init(key, q[0], q[0], q[0])
    timeit("cell-v2", lambda a: cellp.apply(vp, a, a, a), q)

if __name__ == "__main__":
    main()
