"""Chunkwise-parallel mLSTM in pure jnp (TPU-friendly scan formulation).

This is the linear-time formulation the framework trains with: the
sequence is split into chunks of length L; a small recurrent state
``C`` (DHQK x DHHV) and normalizer ``n`` (DHQK) are carried across chunk
boundaries with ``lax.scan`` while everything inside a chunk is a dense
batched matmul on the MXU.

Math parity targets (re-derived, not translated):
- sigmoid-input-gate variant ("siging"):
  ref:mlstm_kernels/triton/chunkwise/xl_chunk_siging/fw_kernel_recurrent.py:14
  ref:mlstm_kernels/triton/chunkwise/xl_chunk_siging/fw_kernel_parallel.py:14
  ref:mlstm_kernels/torch/chunkwise/triton_xl_chunk_siging/chunkwise_gates.py:15
- exp-input-gate variant with running max-state ("stabilized"):
  ref:mlstm_kernels/triton/chunkwise/xl_chunk/fw_kernel_recurrent.py

Definitions per chunk k (length L), all gate math in float32:
    b[l]  = sum_{t<=l} logsig(f_t)            (intra-chunk fgate cumsum)
    a[l]  = sum_{t=l+1..L-1} logsig(f_t) + logsig(i_l)
    g     = sum_{t} logsig(f_t) = b[L-1]
    C_k   = exp(g) C_{k-1} + (exp(a) * k)^T v
    n_k   = exp(g) n_{k-1} + sum_l exp(a_l) k_l
    D[l,j]= exp(b[l] - b[j] + logsig(i_j)),  j <= l
    num_l = exp(b[l]) qs_l C_{k-1} + sum_j D[l,j] (qs_l . k_j) v_j,  qs = q / sqrt(DHQK)
    den_l = max(| exp(b[l]) qs_l . n_{k-1} + sum_j D[l,j] (qs_l . k_j) |, 1)
    h_l   = num_l / (den_l + eps)

The whole function is jax.grad-able; a hand-derived VJP and Pallas
kernels live in :mod:`xlstm_yolo_tpu.ops.pallas`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "chunkwise_log_gates",
    "mlstm_siging_chunkwise",
    "mlstm_chunkwise_stabilized",
]

f32 = jnp.float32


class ChunkGates(NamedTuple):
    """Per-chunk log-gate tensors, all float32, shape (B, NH, NC, L)."""

    vecB: jax.Array  # inclusive intra-chunk cumsum of logsig(f)
    vecA: jax.Array  # reverse-cumsum of logsig(f)[1:] + logsig(i)  (stable form)
    scaG: jax.Array  # (B, NH, NC) total chunk forget decay


def chunkwise_log_gates(i: jax.Array, f: jax.Array, chunk_size: int) -> ChunkGates:
    """Compute vecB / vecA / scaG for chunked gates.

    Stable vecA form avoids subtracting forget-gate sums
    (ref:.../chunkwise_gates.py:36-47).
    """
    B, NH, S = f.shape
    L = chunk_size
    assert S % L == 0, f"S={S} not divisible by chunk_size={L}"
    NC = S // L
    logf = jax.nn.log_sigmoid(f.astype(f32)).reshape(B, NH, NC, L)
    logi = jax.nn.log_sigmoid(i.astype(f32)).reshape(B, NH, NC, L)
    vecB = jnp.cumsum(logf, axis=-1)
    # rev-cumsum of logf shifted left by one: a_l = sum_{t>l} logf_t
    rev = jnp.cumsum(logf[..., ::-1], axis=-1)[..., ::-1]  # sum_{t>=l}
    tail = jnp.concatenate([rev[..., 1:], jnp.zeros((B, NH, NC, 1), f32)], axis=-1)
    vecA = tail + logi
    scaG = vecB[..., -1]
    return ChunkGates(vecB, vecA, scaG)


def _split_chunks(x: jax.Array, L: int) -> jax.Array:
    B, NH, S = x.shape[:3]
    return x.reshape(B, NH, S // L, L, *x.shape[3:])


def mlstm_siging_chunkwise(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    i: jax.Array,
    f: jax.Array,
    chunk_size: int = 64,
    c_initial: jax.Array | None = None,  # (B, NH, DHQK, DHHV)
    n_initial: jax.Array | None = None,  # (B, NH, DHQK)
    qk_scale: float | None = None,
    normalize: bool = True,
    return_last_states: bool = False,
    eps: float = 1e-6,
    compute_dtype: jnp.dtype | None = None,
    stopgrad_norm: bool = False,
):
    """Chunkwise sigmoid-input-gate mLSTM (linear time, fully jittable).

    Returns ``h`` of shape (B, NH, S, DHHV) in the dtype of ``q`` and, if
    ``return_last_states``, the final ``(C, n)`` state in float32.
    ``stopgrad_norm`` detaches the max(|.|,1) denominator like the
    reference's custom backward (and our Pallas VJP) does.
    """
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    L = chunk_size
    NC = S // L
    assert S % L == 0, f"S={S} not divisible by chunk_size={L} (use wrappers)"
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    # matmul-operand dtype follows the input: bf16 in -> bf16 operands with
    # f32 accumulation (the reference Triton kernels' tl.dot semantics,
    # fw_kernel_parallel.py); f32 in (CPU goldens) stays f32.
    cd = compute_dtype or (q.dtype if q.dtype in (jnp.bfloat16, jnp.float16) else f32)

    gates = chunkwise_log_gates(i, f, L)
    vecB, vecA, scaG = gates

    qc = _split_chunks(q, L)  # (B, NH, NC, L, DHQK)
    kc = _split_chunks(k, L)
    vc = _split_chunks(v, L)

    # --- per-chunk state increments (parallel over chunks, MXU matmuls) ---
    abar = jnp.exp(vecA)  # (B, NH, NC, L) in [0, 1]
    kbar = kc.astype(cd) * abar[..., None].astype(cd)
    dC = jnp.einsum("bhnld,bhnlv->bhndv", kbar, vc.astype(cd), preferred_element_type=f32)
    dN = kbar.astype(f32).sum(axis=-2)  # (B, NH, NC, DHQK)
    gbar = jnp.exp(scaG)  # (B, NH, NC)

    # --- inter-chunk linear recurrence: C_k = gbar_k * C_{k-1} + dC_k ---
    C0 = (
        c_initial.astype(f32)
        if c_initial is not None
        else jnp.zeros((B, NH, DHQK, DHHV), f32)
    )
    n0 = (
        n_initial.astype(f32) if n_initial is not None else jnp.zeros((B, NH, DHQK), f32)
    )

    def step(carry, xs):
        C, n = carry
        g_k, dC_k, dN_k = xs
        C_new = g_k[..., None, None] * C + dC_k
        n_new = g_k[..., None] * n + dN_k
        return (C_new, n_new), (C, n)  # emit the state *before* this chunk

    (C_last, n_last), (C_prev, n_prev) = jax.lax.scan(
        step,
        (C0, n0),
        (
            jnp.moveaxis(gbar, -1, 0),  # (NC, B, NH)
            jnp.moveaxis(dC, 2, 0),  # (NC, B, NH, DHQK, DHHV)
            jnp.moveaxis(dN, 2, 0),  # (NC, B, NH, DHQK)
        ),
    )
    C_prev = jnp.moveaxis(C_prev, 0, 2)  # (B, NH, NC, DHQK, DHHV)
    n_prev = jnp.moveaxis(n_prev, 0, 2)  # (B, NH, NC, DHQK)

    # --- intra-chunk parallel part ---
    ltr = jnp.tril(jnp.ones((L, L), dtype=bool))
    logi_c = jax.nn.log_sigmoid(i.astype(f32)).reshape(B, NH, NC, L)
    logD = vecB[..., :, None] - vecB[..., None, :] + logi_c[..., None, :]
    # mask BEFORE exp: the masked upper triangle has b[l]-b[j] > 0 which
    # OVERFLOWS exp once trained f-gates close (b spans hundreds of
    # logsig steps), and where(ltr, exp(logD), 0)'s VJP then multiplies
    # the inf by the zeroed cotangent -> NaN gradients with a finite
    # forward (the r5 real-training NaN at step ~28; the fw value was
    # always fine because where masked the inf).  exp(-inf) = 0 with a
    # zero derivative, so masking the argument is exact in fw AND bw.
    # (The exp-gate variant below and both parallel paths already mask
    # their log matrices this way — this was the one unmasked site.)
    matD = jnp.exp(jnp.where(ltr, logD, -jnp.inf))  # (B, NH, NC, L, L)

    matS = jnp.einsum(
        "bhnld,bhnjd->bhnlj", qc.astype(cd), kc.astype(cd), preferred_element_type=f32
    ) * jnp.asarray(qk_scale, f32)
    matSD = (matS * matD).astype(cd)

    bbar = jnp.exp(vecB)  # (B, NH, NC, L)
    qbar = qc.astype(f32) * bbar[..., None] * jnp.asarray(qk_scale, f32)
    h_inter = jnp.einsum(
        "bhnld,bhndv->bhnlv",
        qbar.astype(cd),
        C_prev.astype(cd),
        preferred_element_type=f32,
    )

    if normalize:
        # ones-augmented v: the (L, L) matSD feeds exactly ONE dot that
        # yields both the numerator and the intra normalizer (f32 accum) —
        # a single consumer lets XLA fuse matS's gate epilogue instead of
        # materializing a second (B, NH, NC, L, L) buffer in HBM.
        vc_ext = jnp.concatenate(
            [vc.astype(cd), jnp.ones((B, NH, NC, L, 1), cd)], axis=-1
        )
        h_ext = jnp.einsum(
            "bhnlj,bhnjv->bhnlv", matSD, vc_ext, preferred_element_type=f32
        )
        num = h_inter + h_ext[..., :DHHV]
        n_intra = h_ext[..., DHHV]
        n_inter = jnp.einsum(
            "bhnld,bhnd->bhnl", qbar, n_prev, preferred_element_type=f32
        )
        den = jnp.maximum(jnp.abs(n_inter + n_intra), 1.0)
        if stopgrad_norm:
            den = jax.lax.stop_gradient(den)
        h = num / (den[..., None] + eps)
    else:
        h_intra = jnp.einsum(
            "bhnlj,bhnjv->bhnlv", matSD, vc.astype(cd), preferred_element_type=f32
        )
        h = h_inter + h_intra

    h = h.reshape(B, NH, S, DHHV).astype(q.dtype)
    if return_last_states:
        return h, (C_last, n_last)
    return h


def mlstm_chunkwise_stabilized(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    i: jax.Array,
    f: jax.Array,
    chunk_size: int = 64,
    c_initial: jax.Array | None = None,
    n_initial: jax.Array | None = None,
    m_initial: jax.Array | None = None,  # (B, NH) running max state
    qk_scale: float | None = None,
    return_last_states: bool = False,
    eps: float = 1e-6,
    stopgrad_norm: bool = False,
):
    """Chunkwise mLSTM with exp input gate and running max-state.

    ``stopgrad_norm`` detaches the denominator AND the max-stabilizers
    (m states / m_comb) — the reference backward treats both as
    constants (ref:triton/chunkwise/xl_chunk bw kernels), and the Pallas
    custom VJP matches that convention.

    The exp() input gate can exceed 1, so a per-head running max ``m`` is
    carried across chunks and both C and n are stored relative to it
    (ref:mlstm_kernels/triton/chunkwise/xl_chunk/fw_kernel_recurrent.py).

    Recurrence (with intra-chunk gates b, a, g as in the siging variant but
    a_l = sum_{t>l} logsig(f_t) + i_l using the *raw* i):
        m_k  = max(g + m_{k-1}, max_l a_l)
        C_k  = exp(g + m_{k-1} - m_k) C_{k-1} + (exp(a - m_k) k)^T v
        n_k  = exp(g + m_{k-1} - m_k) n_{k-1} + sum_l exp(a_l - m_k) k_l
    Output combination per query l:
        m_comb = max(b[l] + m_{k-1}, d_max_row_l)
        num    = exp(b[l] + m_{k-1} - m_comb) qs C_{k-1}
                 + sum_j exp(logD[l,j] - m_comb) (qs.k_j) v_j
        den    = max(|analogous n terms|, exp(-m_comb))
        h      = num / (den + eps)
    """
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    L = chunk_size
    NC = S // L
    assert S % L == 0
    if qk_scale is None:
        qk_scale = DHQK**-0.5

    logf = jax.nn.log_sigmoid(f.astype(f32)).reshape(B, NH, NC, L)
    ic = i.astype(f32).reshape(B, NH, NC, L)
    vecB = jnp.cumsum(logf, axis=-1)
    rev = jnp.cumsum(logf[..., ::-1], axis=-1)[..., ::-1]
    tail = jnp.concatenate([rev[..., 1:], jnp.zeros((B, NH, NC, 1), f32)], axis=-1)
    vecA = tail + ic  # raw i, may be > 0
    scaG = vecB[..., -1]  # (B, NH, NC)

    cd = q.dtype if q.dtype in (jnp.bfloat16, jnp.float16) else f32
    qc = _split_chunks(q, L).astype(f32)
    kc = _split_chunks(k, L).astype(f32)
    vc = _split_chunks(v, L).astype(f32)

    C0 = c_initial.astype(f32) if c_initial is not None else jnp.zeros((B, NH, DHQK, DHHV), f32)
    n0 = n_initial.astype(f32) if n_initial is not None else jnp.zeros((B, NH, DHQK), f32)
    m0 = m_initial.astype(f32) if m_initial is not None else jnp.zeros((B, NH), f32)

    vecA_max = vecA.max(axis=-1)  # (B, NH, NC)

    sg = jax.lax.stop_gradient if stopgrad_norm else (lambda x: x)

    def step(carry, xs):
        C, n, m = carry
        g_k, amax_k, a_k, k_k, v_k = xs
        m_new = sg(jnp.maximum(g_k + m, amax_k))
        gbar = jnp.exp(g_k + m - m_new)
        abar = jnp.exp(a_k - m_new[..., None])  # (B, NH, L)
        kbar = k_k * abar[..., None]
        C_new = gbar[..., None, None] * C + jnp.einsum(
            "bhld,bhlv->bhdv", kbar, v_k, preferred_element_type=f32
        )
        n_new = gbar[..., None] * n + kbar.sum(-2)
        return (C_new, n_new, m_new), (C, n, m)

    (C_last, n_last, m_last), (C_prev, n_prev, m_prev) = jax.lax.scan(
        step,
        (C0, n0, m0),
        (
            jnp.moveaxis(scaG, -1, 0),
            jnp.moveaxis(vecA_max, -1, 0),
            jnp.moveaxis(vecA, 2, 0),
            jnp.moveaxis(kc, 2, 0),
            jnp.moveaxis(vc, 2, 0),
        ),
    )
    C_prev = jnp.moveaxis(C_prev, 0, 2)
    n_prev = jnp.moveaxis(n_prev, 0, 2)
    m_prev = jnp.moveaxis(m_prev, 0, 2)  # (B, NH, NC)

    ltr = jnp.tril(jnp.ones((L, L), dtype=bool))
    logD = vecB[..., :, None] - vecB[..., None, :] + ic[..., None, :]
    logD = jnp.where(ltr, logD, -jnp.inf)
    d_max = logD.max(axis=-1)  # (B, NH, NC, L)

    b_inter = vecB + m_prev[..., None]  # (B, NH, NC, L)
    m_comb = sg(jnp.maximum(b_inter, d_max))

    matD = jnp.exp(logD - m_comb[..., None])
    matS = (
        jnp.einsum(
            "bhnld,bhnjd->bhnlj", qc.astype(cd), kc.astype(cd),
            preferred_element_type=f32,
        )
        * qk_scale
    )
    matSD = (matS * matD).astype(cd)

    bbar = jnp.exp(b_inter - m_comb)
    qbar = qc * bbar[..., None] * qk_scale

    # single consumer for the (L, L) matSD: ones-augmented v gives the
    # numerator and intra normalizer from one dot with f32 accumulation
    vc_ext = jnp.concatenate(
        [vc.astype(cd), jnp.ones((B, NH, NC, L, 1), cd)], axis=-1
    )
    h_ext = jnp.einsum(
        "bhnlj,bhnjv->bhnlv", matSD, vc_ext, preferred_element_type=f32
    )
    num = jnp.einsum(
        "bhnld,bhndv->bhnlv", qbar.astype(cd), C_prev.astype(cd),
        preferred_element_type=f32,
    ) + h_ext[..., :DHHV]
    den_raw = jnp.einsum(
        "bhnld,bhnd->bhnl", qbar, n_prev, preferred_element_type=f32
    ) + h_ext[..., DHHV]
    den = sg(jnp.maximum(jnp.abs(den_raw), jnp.exp(-m_comb)))
    h = (num / (den[..., None] + eps)).reshape(B, NH, S, DHHV).astype(q.dtype)

    if return_last_states:
        return h, (C_last, n_last, m_last)
    return h
