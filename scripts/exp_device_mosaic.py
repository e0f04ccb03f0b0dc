#!/usr/bin/env python
"""On-chip cost of the device mosaic-4 at the flagship train shape.

Times jit(mosaic4_device) on (8, 4, 640, 640, 3) uint8 batches — the
number that goes next to the host pipeline rates in docs/E2E_TRAIN.md.
Usage: python scripts/exp_device_mosaic.py
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

from xlstm_yolo_tpu.data.device_mosaic import mosaic4_device  # noqa: E402

B, S, M, N = 8, 640, 32, 8


def main():
    @jax.jit
    def mk(key):
        k1, k2 = jax.random.split(key)
        imgs = jax.random.randint(k1, (B, 4, S, S, 3), 0, 255, jnp.uint8)
        xy = jax.random.uniform(k2, (B, 4, M, 2), minval=10.0, maxval=500.0)
        wh = jax.random.uniform(jax.random.fold_in(k2, 1), (B, 4, M, 2),
                                minval=8.0, maxval=100.0)
        return imgs, jnp.concatenate([xy, xy + wh], -1), \
            jnp.zeros((B, 4, M), jnp.int32), jnp.ones((B, 4, M), bool)

    fn = jax.jit(lambda a, k: mosaic4_device(*a, k))
    batches = [mk(k) for k in jax.random.split(jax.random.PRNGKey(0), N + 2)]
    _ = np.asarray(batches[-1][0][0, 0, 0, 0])
    t0 = time.perf_counter()
    for i, a in enumerate(batches[:2]):
        out = fn(a, jax.random.PRNGKey(i))
        _ = float(out[1][0, 0, 0])
    print(f"RESULT compile: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for i, a in enumerate(batches[2:]):
        out = fn(a, jax.random.PRNGKey(100 + i))
    _ = float(out[1][0, 0, 0])
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"RESULT mosaic4_device: {ms:.2f} ms/batch8 "
          f"({B * 1e3 / ms:.0f} img/s equiv)", flush=True)
    Path("/tmp/tpu_queue").mkdir(exist_ok=True)
    Path("/tmp/tpu_queue/device_mosaic.json").write_text(
        json.dumps({"ms_per_batch8": round(ms, 2)}))


if __name__ == "__main__":
    main()
