#!/usr/bin/env python
"""Is returning a many-leaf state pytree expensive on this runtime?

The train step returns ~1000+ buffers (params + 3-EMA AdEMAMix state +
EMA twin + batch_stats) and donation is rejected by the relay runtime
(docs/KNOWN_ISSUES.md) — if per-buffer overhead is real, flattening the
optimizer/EMA state (optax.flatten) is a direct win.

Times an EMA-like elementwise update over the SAME total bytes arranged
as (a) many small leaves vs (b) three big arrays.

Usage: python scripts/exp_state_overhead.py [n_leaves] [total_mb]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

WARMUP, ITERS = 2, 16


def main():
    n_leaves = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    total_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 240.0
    per = max(int(total_mb * 1e6 / 4 / n_leaves), 16)

    def mk_leafy(key):
        ks = jax.random.split(key, 8)
        # 8 distinct blocks replicated into n_leaves entries (distinct
        # values per call via the key; per-leaf distinctness irrelevant)
        base = [jax.random.normal(k, (per,), jnp.float32) for k in ks]
        return {f"l{i}": base[i % 8] * (1.0 + i * 1e-6) for i in range(n_leaves)}

    def mk_flat(key):
        n = per * n_leaves
        third = n // 3
        ks = jax.random.split(key, 3)
        return {f"f{i}": jax.random.normal(k, (third,), jnp.float32)
                for i, k in enumerate(ks)}

    upd = jax.jit(lambda t: jax.tree.map(lambda x: x * 0.9999 + 0.0001, t))

    results = {"n_leaves": n_leaves, "total_mb": total_mb}
    for name, mk in [("leafy", mk_leafy), ("flat", mk_flat)]:
        keys = jax.random.split(jax.random.PRNGKey(0), WARMUP + ITERS)
        inputs = [mk(k) for k in keys]
        _ = np.asarray(jax.tree.leaves(inputs[-1])[0])[0]
        for x in inputs[:WARMUP]:
            _ = np.asarray(jax.tree.leaves(upd(x))[0])[0]
        t0 = time.perf_counter()
        out = None
        for x in inputs[WARMUP:]:
            out = upd(x)
        _ = np.asarray(jax.tree.leaves(out)[0])[0]
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[name + "_ms"] = round(ms, 2)
        print(f"RESULT {name}: {ms:.2f} ms", flush=True)

    out = Path("/tmp/tpu_queue/state_overhead.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
