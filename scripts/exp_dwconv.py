#!/usr/bin/env python
"""Depthwise-conv formulation shootout on the TPU (FPN/head perf pass).

The predict profile attributes ~20 ms of 39.6 ms/batch to FPN+head;
the v10 cls tower (nn/head.py:185-188) and SequenceConv2d in every ViL
block are depthwise 3x3 convs, which XLA lowers to grouped convolution
on TPU — historically VPU-bound and slow. Candidates, all numerically
identical (same weights):

  grouped : lax.conv_general_dilated(feature_group_count=C)  (current)
  shift9  : 9 shifted elementwise FMAs (pad + static slices) — pure
            VPU streaming XLA can fuse into one pass
  matmul  : im2col over the 3x3 window -> (HW, 9) x (9,) per channel —
            ruled out a priori (C separate tiny matmuls)

Each variant is scanned over N distinct inputs in ONE program
(relay-safe protocol: utils/benchmarks.py).

Usage: python scripts/exp_dwconv.py
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
bf16 = jnp.bfloat16


def dw_grouped(x, w):
    """Current lowering: grouped conv. x (B,H,W,C), w (3,3,1,C)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def dw_shift9(x, w):
    """9 shifted FMAs. w (3,3,1,C) -> broadcast taps."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            out = out + xp[:, dy : dy + H, dx : dx + W, :].astype(jnp.float32) * w[dy, dx, 0].astype(jnp.float32)
    return out.astype(x.dtype)


def timeit(label, fn, shapes, dtype=bf16):
    r = np.random.default_rng(0)
    xs = jnp.asarray(r.standard_normal((N, *shapes[0])), dtype)
    w = jnp.asarray(r.standard_normal(shapes[1]), dtype)

    @jax.jit
    def scanned(xs, w):
        def body(c, x):
            y = fn(x, w)
            return c + y.astype(jnp.float32).mean(), None
        s, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return s

    scanned(xs, w).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        s = scanned(xs, w)
    float(s)  # small fetch barrier
    dt = (time.perf_counter() - t0) / (3 * N) * 1e3
    print(f"{label:38s} {dt:8.3f} ms/iter")
    return dt


def main():
    # Warm the SESSION first: the first timed program after worker spin-up
    # absorbs a multi-second one-off (observed 1663 ms/iter for a 0.6 ms
    # kernel on 2026-08-18; block_until_ready returns early through the
    # relay so the per-case warmup call does not cover it). Measured
    # conclusion (v5e, warmed): grouped 0.58 vs shift9 0.64 ms at
    # 80x80x192, equal at smaller levels — all dispatch-bound (~0.46 ms
    # floor); DW_IMPL stays "grouped".
    x = jnp.ones((256, 256), bf16)
    for _ in range(3):
        float((x @ x).sum())

    # real flagship shapes (vil-det-192 @640, batch 8): every FPN level
    # and the v10 cls tower run dw3x3 at 192 channels (c3 = max(192, 80));
    # the backbone stage-1 SequenceConv2d is the 80x80x192 case.
    cases = [
        ("dw3x3 80x80x192 (P2 + backbone)", ((8, 80, 80, 192), (3, 3, 1, 192))),
        ("dw3x3 40x40x192 (P3)", ((8, 40, 40, 192), (3, 3, 1, 192))),
        ("dw3x3 20x20x192 (P4)", ((8, 20, 20, 192), (3, 3, 1, 192))),
        ("dw3x3 10x10x192 (P5)", ((8, 10, 10, 192), (3, 3, 1, 192))),
    ]
    for name, shapes in cases:
        a = timeit(f"{name} grouped", dw_grouped, shapes)
        b = timeit(f"{name} shift9", dw_shift9, shapes)
        # parity check (on-device, small fetch)
        r = np.random.default_rng(1)
        x = jnp.asarray(r.standard_normal((2, *shapes[0][1:])), bf16)
        w = jnp.asarray(r.standard_normal(shapes[1]), bf16)
        d = float(jnp.max(jnp.abs(
            dw_grouped(x, w).astype(jnp.float32) - dw_shift9(x, w).astype(jnp.float32))))
        print(f"{name}: grouped {a:.3f} vs shift9 {b:.3f} ms  (max|d|={d:.2e})\n")


if __name__ == "__main__":
    main()
