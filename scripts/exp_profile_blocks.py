#!/usr/bin/env python
"""Per-component TPU time budget via scan-amortized microbenches.

Each component is wrapped in a lax.scan over 16 distinct inputs inside
ONE program (amortizes relay dispatch overhead); reported ms is per
iteration.  Usage: python scripts/exp_profile_blocks.py [step ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N = 16
B = 8
bf16 = jnp.bfloat16


def timeit(label, fn, *args):
    """fn maps one input -> out; we scan it over stacked distinct inputs."""
    @jax.jit
    def scanned(stacked):
        def body(c, x):
            y = fn(*x) if isinstance(x, tuple) else fn(x)
            return c, jax.tree.leaves(y)[0].reshape(-1)[:4]
        _, ys = jax.lax.scan(body, None, stacked)
        return ys

    stacked = args[0]
    np.asarray(scanned(stacked))  # compile+warm
    t0 = time.perf_counter()
    out = scanned(stacked)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"RESULT {label}: {dt:.2f} ms", flush=True)
    return dt


def rand(key, shape, dtype=bf16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def stack(shape, dtype=bf16):
    ks = jax.random.split(jax.random.PRNGKey(0), N)
    return jnp.stack([rand(k, shape, dtype) for k in ks])


def main():
    from xlstm_yolo_tpu.nn import blocks as Bl
    from xlstm_yolo_tpu.nn import layers as L

    key = jax.random.PRNGKey(0)
    steps = sys.argv[1:] or [
        "patch", "pair80", "pair80_v2", "merger", "fusion20", "fusion40",
        "fusion80", "conv80", "head",
    ]

    if "patch" in steps:
        m = L.VitPatchEmbed(dim=192, patch_size=(8, 8), dtype=bf16)
        v = m.init(key, jnp.zeros((B, 640, 640, 3), bf16))
        timeit("patch-embed", lambda x: m.apply(v, x), stack((B, 640, 640, 3)))

    for tag, kern in (("pair80", "chunkwise--native_autograd"),
                      ("pair80_v2", "chunkwise--pallas_xl_chunk_siging_v2")):
        if tag in steps:
            m = L.ViLBlockPair(dim=192, seqlens=(80, 80), chunk_size=512,
                               qkv_block_size=32, chunkwise_kernel=kern,
                               compute_dtype=bf16)
            v = m.init(key, jnp.zeros((B, 6400, 192), bf16))
            timeit(tag, lambda x: m.apply(v, x), stack((B, 6400, 192)))

    if "merger" in steps:
        m = Bl.PatchMerger(dim=192, num_tokens_out=1600)
        v = m.init(key, jnp.zeros((B, 6400, 192), bf16))
        timeit("patch-merger", lambda x: m.apply(v, x), stack((B, 6400, 192)))

    for tag, hw in (("fusion20", 20), ("fusion40", 40), ("fusion80", 80)):
        if tag in steps:
            m = Bl.ViLFusionBlock(c1=384, dim=192, seqlens=(hw, hw),
                                  chunk_size=512 if hw > 20 else 256,
                                  qkv_block_size=32, mlp_ratio=4.0,
                                  compute_dtype=bf16, fused=True)
            vi = m.init(key, jnp.zeros((B, hw, hw, 384), bf16))
            timeit(tag, lambda x: m.apply(vi, x), stack((B, hw, hw, 384)))

    if "conv80" in steps:
        m = Bl.ConvBNAct(c2=192, k=3, s=2, fused=True, dtype=bf16)
        v = m.init(key, jnp.zeros((B, 80, 80, 192), bf16))
        timeit("conv3x3s2-80px", lambda x: m.apply(v, x), stack((B, 80, 80, 192)))

    if "head" in steps:
        from xlstm_yolo_tpu.nn.head import v10Detect
        ch = (192, 192, 192, 192)
        m = v10Detect(nc=80, ch=ch, img_size=640, dtype=bf16, fused=True,
                      sort_postprocess=True)
        feats0 = [jnp.zeros((B, s, s, 192), bf16) for s in (80, 40, 20, 10)]
        v = m.init(key, feats0, img_hw=(640, 640))
        stacked = tuple(stack((B, s, s, 192)) for s in (80, 40, 20, 10))

        @jax.jit
        def scanned(st):
            def body(c, xs):
                y, _ = m.apply(v, list(xs), img_hw=(640, 640))
                return c, y.reshape(-1)[:4]
            _, ys = jax.lax.scan(body, None, st)
            return ys

        np.asarray(scanned(stacked))
        t0 = time.perf_counter()
        out = scanned(stacked)
        np.asarray(out)
        print(f"RESULT head(towers+decode+post): "
              f"{(time.perf_counter() - t0) / N * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
