"""Program analysis tools: FLOP counting and kernel transfer behavior.

Parity: the reference's analysis suite (ref:mlstm_kernels/analysis/ —
FLOP counters and "transfer behavior" runtime-vs-seqlen plots used to
pick kernel parameters).  TPU re-design: FLOPs/bytes come from XLA's
cost analysis of the *exact compiled program* (no hand-rolled op
counting drift), and transfer behavior measures the compiled kernel
with the relay-safe protocol from :mod:`xlstm_yolo_tpu.utils.benchmarks`.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["program_cost", "count_params", "transfer_behavior",
           "plot_transfer_behavior"]


def program_cost(fn: Callable, *args, **kwargs) -> dict:
    """FLOPs / HBM bytes / peak memory of the jitted program, from XLA's
    own cost model (lowered for the current default backend)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        "arithmetic_intensity": (
            float(cost.get("flops", 0.0))
            / max(float(cost.get("bytes accessed", 0.0)), 1.0)
        ),
    }


def count_params(variables) -> int:
    """Total parameter count of a flax variables pytree."""
    params = variables.get("params", variables) if isinstance(variables, dict) else variables
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def _relay_safe_ms(fn: Callable, make_args: Callable, iters: int = 8) -> float:
    """Median-free simple timing with the relay-safe protocol: distinct
    device inputs folded into one scanned program, tiny fetch barrier."""
    stacked = [jnp.stack(x) for x in zip(*(make_args(i) for i in range(iters)))]

    @jax.jit
    def scanned(*stk):
        def body(c, xs):
            out = fn(*xs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c, leaf.reshape(-1)[:4]

        _, ys = jax.lax.scan(body, None, tuple(stk))
        return ys

    np.asarray(scanned(*stacked))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(scanned(*stacked))
    return (time.perf_counter() - t0) / iters * 1e3


def transfer_behavior(
    kernel: Callable,
    seq_lengths: Sequence[int],
    make_args: Callable[[int, int], tuple],
    iters: int = 8,
) -> list[dict]:
    """Runtime vs sequence length for a kernel.

    ``make_args(S, i)`` builds the i-th distinct argument tuple at
    sequence length S.  Returns one row per S with measured ms and the
    XLA cost analysis (flops, bytes, achieved TFLOP/s).
    """
    rows = []
    for S in seq_lengths:
        ms = _relay_safe_ms(kernel, lambda i, S=S: make_args(S, i), iters)
        cost = program_cost(kernel, *make_args(S, 0))
        rows.append({
            "S": int(S),
            "ms": round(ms, 4),
            "flops": cost["flops"],
            "tflops_per_s": round(cost["flops"] / (ms * 1e-3) / 1e12, 3),
            "bytes_accessed": cost["bytes_accessed"],
        })
    return rows


def plot_transfer_behavior(rows_by_kernel: dict[str, list[dict]], out: str):
    """Runtime-vs-S plot across kernels (the reference's transfer plots)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for name, rows in rows_by_kernel.items():
        ax.plot([r["S"] for r in rows], [r["ms"] for r in rows],
                marker="o", label=name)
    ax.set_xlabel("sequence length S")
    ax.set_ylabel("runtime (ms)")
    ax.set_xscale("log", base=2)
    ax.set_yscale("log", base=2)
    ax.legend(fontsize=8)
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
