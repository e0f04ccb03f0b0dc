"""Model introspection: params/FLOPs/layer profile + seeding.

Parity targets: ref:ultralytics/utils/torch_utils.py — model_info
(:303), get_flops (:374, via XLA cost analysis instead of thop),
profile() op benchmark (:659), init_seeds (:487).
"""

from __future__ import annotations

import random
import time

import jax
import jax.numpy as jnp
import numpy as np


def init_seeds(seed: int = 0, deterministic: bool = True) -> jax.Array:
    """Seed host RNGs; JAX is deterministic by construction — the
    returned PRNGKey is the device-side stream (no cudnn toggles)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def n_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def get_flops(fn, *example_args) -> float:
    """Analytical FLOPs of a jitted fn from XLA's cost analysis (GFLOPs)."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) / 1e9
    except Exception:
        return -1.0


def model_info(model, variables, imgsz: int = 640, verbose: bool = True) -> dict:
    """Params + GFLOPs summary (parity: torch_utils.model_info)."""
    params = variables.get("params", variables)
    img = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    gflops = get_flops(lambda v, x: jax.tree.leaves(model.apply(v, x))[0], variables, img)
    info = {
        "params": n_params(params),
        "GFLOPs@{}px".format(imgsz): round(gflops, 1),
        "layers": len(getattr(model, "specs", ())),
    }
    if verbose:
        print(", ".join(f"{k}: {v:,}" if isinstance(v, int) else f"{k}: {v}" for k, v in info.items()))
    return info


def profile_ops(ops: list, n: int = 10, warmup: int = 2) -> list[dict]:
    """Micro-benchmark a list of (name, fn, args) device ops.

    Parity: torch_utils.profile(:659).  Uses chained differential timing
    so remote-runtime RTT/dedup do not pollute results (KNOWN_ISSUES.md).
    """
    rows = []
    for name, fn, args in ops:
        jfn = jax.jit(fn)
        for _ in range(warmup):
            jax.block_until_ready(jfn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = jfn(*args)
        first = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / n * 1e3
        rows.append({"op": name, "ms": round(dt, 3), "gflops": round(get_flops(fn, *args), 2)})
    return rows
