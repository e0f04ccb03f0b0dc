"""Automatic batch-size selection from device memory.

TPU re-design of ref:ultralytics/utils/autobatch.py (CUDA-memory binary
search): on TPU the per-batch HBM need is *predicted analytically* with
jax's compile-time memory analysis (no OOM probing — XLA compilation is
expensive and deterministic, so we ask the compiled executable for its
memory footprint instead of trial-running).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def device_memory_bytes() -> int:
    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return 16 * 1024**3  # v5e default HBM


def compiled_memory_bytes(fn, *args) -> int:
    """Peak memory estimate of the lowered+compiled fn from XLA."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        analysis = compiled.memory_analysis()
        return int(
            analysis.temp_size_in_bytes
            + analysis.argument_size_in_bytes
            + analysis.output_size_in_bytes
        )
    except Exception:
        return -1


def autobatch(make_step, imgsz: int = 640, fraction: float = 0.8,
              candidates=(4, 8, 16, 32, 64)) -> int:
    """Pick the largest candidate whose predicted footprint fits.

    ``make_step(batch_size)`` must return (fn, example_args).
    """
    limit = int(device_memory_bytes() * fraction)
    best = candidates[0]
    for bs in candidates:
        fn, args = make_step(bs)
        need = compiled_memory_bytes(fn, *args)
        if need < 0:
            break
        if need <= limit:
            best = bs
        else:
            break
    return best
