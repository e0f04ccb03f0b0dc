"""Profiling harness: jax.profiler traces + named-step annotation.

TPU-native replacement for the reference's profiling surface
(ref:ultralytics/utils/torch_utils.py:659 ``profile``, and
mlstm_kernels' benchmark tooling): captures an XLA/TPU trace viewable in
TensorBoard or Perfetto (``xplane.pb`` under ``<dir>/plugins/profile``),
with ``TraceAnnotation`` scopes so train/predict steps are named in the
timeline.

Usage:
    with trace("runs/profile"):
        for step in range(10):
            with annotate(f"step{step}"):
                state = train_step(state, batch)

Note: the relay-attached TPU runtime may not export device traces; the
host-side timeline and XLA metadata still capture dispatch structure.
``Profile`` (utils/ops.py) remains the cheap wall-clock timer.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax

__all__ = ["trace", "annotate", "profile_step"]


@contextlib.contextmanager
def trace(logdir: str | Path, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace into ``logdir``."""
    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir), create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def profile_step(fn, *args, logdir: str | Path = "runs/profile", iters: int = 3):
    """Trace ``iters`` calls of a jitted step; returns the trace dir.

    The first call compiles outside the trace so the timeline shows
    steady-state execution only.
    """
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    with trace(logdir) as d:
        for i in range(iters):
            with annotate(f"step{i}"):
                out = fn(*args)
        jax.block_until_ready(out)
    return d
