"""Sequence-length wrappers around the chunkwise kernels.

TPU re-design of ref:mlstm_kernels/torch/kernel_wrappers.py:12,204.

Differences from the reference, on purpose:
- Everything here must be jit-compatible: padding amounts and chunk
  splits are computed from *static* shapes (S is static under jit), so
  plain Python control flow is fine — it resolves at trace time.
- ``pad_zeros`` additionally supports an automatic divisor mode that
  picks the largest chunk size <= target that divides S, avoiding the
  up-to-28%% padding waste the reference incurs (e.g. S=1600 at chunk
  512 pads to 2048); the recurrence is exact w.r.t. chunk size so this
  is numerics-neutral.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["pick_chunk_size", "wrap_chunkwise_pad_zeros", "wrap_chunkwise_arbitrary_sequence_length"]


def pick_chunk_size(S: int, target: int, strict: bool = False, min_chunk: int = 16) -> int:
    """Largest divisor of S that is <= target (>= min_chunk), else target.

    With ``strict`` the reference behaviour is kept: return ``target``
    and rely on zero-padding.
    """
    if strict or S % target == 0:
        return min(target, S) if S % min(target, S) == 0 or strict else target
    best = 0
    for c in range(min(target, S), min_chunk - 1, -1):
        if S % c == 0:
            best = c
            break
    return best if best >= min_chunk else target


def wrap_chunkwise_pad_zeros(
    kernel: Callable,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    i: jax.Array,
    f: jax.Array,
    chunk_size: int,
    auto_divisor: bool = True,
    **kwargs,
) -> jax.Array:
    """Zero-pad S to a multiple of the chunk size, run, slice back.

    Training-mode wrapper (no state threading), parity with
    ref:mlstm_kernels/torch/kernel_wrappers.py:204-265.
    """
    assert not kwargs.get("return_last_states", False), (
        "pad_zeros wrapper must not return states (they would include padding)"
    )
    S = q.shape[2]
    if getattr(kernel, "handles_ragged", False):
        # kernel masks its own ragged last chunk — no HBM pad round-trip
        return kernel(q, k, v, i, f, chunk_size=chunk_size, **kwargs)
    cs = pick_chunk_size(S, chunk_size) if auto_divisor else chunk_size
    pad = (-S) % cs
    if pad == 0:
        return kernel(q, k, v, i, f, chunk_size=cs, **kwargs)
    pad4 = [(0, 0), (0, 0), (0, pad), (0, 0)]
    pad3 = [(0, 0), (0, 0), (0, pad)]
    h = kernel(
        jnp.pad(q, pad4),
        jnp.pad(k, pad4),
        jnp.pad(v, pad4),
        jnp.pad(i, pad3),
        jnp.pad(f, pad3),
        chunk_size=cs,
        **kwargs,
    )
    return h[:, :, :S, :]


def wrap_chunkwise_arbitrary_sequence_length(
    chunkwise_kernel: Callable,
    sequence_kernel: Callable,
    step_kernel: Callable,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    i: jax.Array,
    f: jax.Array,
    c_initial: jax.Array | None = None,
    n_initial: jax.Array | None = None,
    chunk_size: int = 64,
    eps: float = 1e-6,
    return_last_states: bool = True,
    **kwargs,
):
    """Inference-mode wrapper for arbitrary S with state threading.

    Re-design of ref:mlstm_kernels/torch/kernel_wrappers.py:12-201:
    the chunkwise kernel covers the largest prefix that is a multiple of
    a chunk size (greedy halving 64->32->16 as in the reference, but all
    decisions are static), the remaining tail (< 16 steps, or a single
    step) runs through the recurrent sequence / step kernel, threading
    (C, n) states across the boundary.
    """
    B, NH, S, DHQK = q.shape
    state = (c_initial, n_initial)

    if S == 1:
        C0, n0 = _zeros_like_state(state, q, v)
        h, (C, n) = step_kernel(
            q[:, :, 0], k[:, :, 0], v[:, :, 0], i[:, :, 0], f[:, :, 0],
            C0, n0, eps=eps,
        )
        h = h[:, :, None, :]
        return (h, (C, n)) if return_last_states else h

    # greedy chunk-size halving over the prefix (static math)
    cs = chunk_size
    prefix = 0
    remaining = S
    plan = []  # list of (start, length, chunk_size)
    while cs >= 16 and remaining >= cs:
        seg = (remaining // cs) * cs
        plan.append((prefix, seg, cs))
        prefix += seg
        remaining -= seg
        cs //= 2

    h_parts = []
    C, n = _zeros_like_state(state, q, v)
    m = None  # running-max state of exp-gate (stabilized) kernels
    for start, seg, seg_cs in plan:
        sl = slice(start, start + seg)
        h_seg, st = chunkwise_kernel(
            q[:, :, sl], k[:, :, sl], v[:, :, sl], i[:, :, sl], f[:, :, sl],
            chunk_size=seg_cs, c_initial=C, n_initial=n,
            return_last_states=True, eps=eps,
            **({"m_initial": m} if m is not None else {}), **kwargs,
        )
        C, n = st[0], st[1]
        m = st[2] if len(st) > 2 else None
        h_parts.append(h_seg)

    if remaining > 0:
        sl = slice(prefix, S)
        import inspect

        seq_kw = {}
        if m is not None and "m_initial" in inspect.signature(sequence_kernel).parameters:
            seq_kw["m_initial"] = m
        h_tail, st = sequence_kernel(
            q[:, :, sl], k[:, :, sl], v[:, :, sl], i[:, :, sl], f[:, :, sl],
            c_initial=C, n_initial=n, eps=eps, return_last_states=True,
            **seq_kw,
        )
        C, n = st[0], st[1]
        h_parts.append(h_tail)

    h = h_parts[0] if len(h_parts) == 1 else jnp.concatenate(h_parts, axis=2)
    return (h, (C, n)) if return_last_states else h


def _zeros_like_state(state, q, v):
    c, n = state
    B, NH, _, DHQK = q.shape
    DHHV = v.shape[-1]
    if c is None:
        c = jnp.zeros((B, NH, DHQK, DHHV), jnp.float32)
    if n is None:
        n = jnp.zeros((B, NH, DHQK), jnp.float32)
    return c, n
