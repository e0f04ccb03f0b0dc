"""Pallas TPU kernel: chunkwise mLSTM with exp input gate + running max-state.

TPU counterpart of the reference's ``xl_chunk`` Triton family
(ref:mlstm_kernels/triton/chunkwise/xl_chunk/fw_kernel_recurrent.py —
the exp-gate variant whose input gate can exceed 1, so a per-head
running max ``m`` is carried across chunks and C/n are stored relative
to it).  Same fused single-pass design as the siging kernel: the
sequential TPU grid carries (C, n, m) in VMEM scratch.

Forward only (training uses the sigmoid-gate variant the shipped
models run; this kernel serves the exp-gate LM configs at inference —
autodiff falls back to the jnp scan).  Math matches
ops.mlstm_chunkwise_stabilized:

    m_k  = max(g + m_{k-1}, max_l a_l)
    C_k  = e^{g + m_{k-1} - m_k} C_{k-1} + (e^{a - m_k} k)^T v
    n_k  = likewise
    m_c  = max(b[l] + m_{k-1}, rowmax(logD))
    num  = e^{b + m_{k-1} - m_c} qs C_{k-1} + (qs k^T ∘ e^{logD - m_c}) v
    den  = max(|...|, e^{-m_c})
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlstm_yolo_tpu.ops.pallas.chunkwise import _cumsum_row, _interpret, _revcumsum_row

f32 = jnp.float32


def _fw_kernel(
    q_ref, k_ref, v_ref, i_ref, f_ref, g_ref,
    h_ref, m_scr_io,
    c_scr, n_scr,
    *, L: int, DHQK: int, DHHV: int, NC: int, qk_scale: float, eps: float,
    dtype: Any,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        c_scr[...] = jnp.zeros((DHQK, DHHV), f32)
        n_scr[...] = jnp.zeros((1, DHQK), f32)
        m_scr_io[0] = jnp.zeros((1, 1), f32)

    C_prev = c_scr[...]
    n_prev = n_scr[...]
    m_prev = m_scr_io[0]  # (1, 1) running max (output buffer doubles as scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    i_row = i_ref[0, 0].astype(f32)  # raw i (exp gate), (1, L)
    f_row = f_ref[0, 0]
    logf = jax.nn.log_sigmoid(f_row.astype(f32))
    b = _cumsum_row(logf)
    a = _revcumsum_row(logf) + i_row
    g = g_ref[0, 0, 0, 0]  # chunk total decay from SMEM

    # ---- intra-chunk with per-row stabilizer -------------------------------
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    logD = jnp.where(row >= col, b.T - b + i_row, -jnp.inf)  # (L, L)
    d_max = jnp.max(logD, axis=1, keepdims=True)  # (L, 1)
    b_inter = b.T + m_prev  # (L, 1) broadcast of (1,1)
    m_comb = jnp.maximum(b_inter, d_max)  # (L, 1)

    D = jnp.exp(logD - m_comb)
    s = jax.lax.dot_general(
        q.astype(dtype), k.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale
    sd = s * D

    qbar = q.astype(f32) * jnp.exp(b_inter - m_comb) * qk_scale
    num = jax.lax.dot_general(
        sd.astype(dtype), v.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + jax.lax.dot_general(
        qbar.astype(dtype), C_prev.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    den_raw = jnp.sum(sd, axis=1, keepdims=True) + jnp.sum(qbar * n_prev, axis=1, keepdims=True)
    den = jnp.maximum(jnp.abs(den_raw), jnp.exp(-m_comb))
    h_ref[0] = (num / (den + eps)).astype(h_ref.dtype)

    # ---- state update with max-state renormalization -----------------------
    a_max = jnp.max(a, axis=1, keepdims=True)  # (1, 1)
    m_new = jnp.maximum(g + m_prev, a_max)  # (1, 1)
    gbar = jnp.exp(g + m_prev - m_new)  # (1, 1)
    abar = jnp.exp(a - m_new)  # (1, L)
    kbar = k.astype(f32) * abar.T
    dC = jax.lax.dot_general(
        kbar.astype(dtype), v.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    c_scr[...] = gbar * C_prev + dC
    n_scr[...] = gbar * n_prev + jnp.sum(kbar, axis=0, keepdims=True)
    m_scr_io[0] = m_new


def mlstm_chunkwise_exp_pallas(
    q, k, v, i, f,
    chunk_size: int = 128,
    c_initial=None, n_initial=None, m_initial=None,
    qk_scale: float | None = None,
    return_last_states: bool = False,
    eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
):
    """Forward of the exp-gate chunkwise mLSTM (inference path)."""
    assert c_initial is None and m_initial is None, (
        "initial states for the exp-gate Pallas path: round 2 (use the jnp scan)"
    )
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    L = chunk_size
    assert S % L == 0
    NC = S // L
    BNH = B * NH
    if qk_scale is None:
        qk_scale = DHQK**-0.5

    qf = q.reshape(BNH, S, DHQK)
    kf = k.reshape(BNH, S, DHQK)
    vf = v.reshape(BNH, S, DHHV)
    ifl = i.reshape(BNH, NC, 1, L).astype(f32)
    ffl = f.reshape(BNH, NC, 1, L).astype(f32)
    scaG = jax.nn.log_sigmoid(f.astype(f32)).reshape(BNH, NC, L).sum(-1).reshape(BNH, NC, 1, 1)

    row4 = lambda bi, j: (bi, j, 0, 0)
    h, m_last = pl.pallas_call(
        functools.partial(
            _fw_kernel, L=L, DHQK=DHQK, DHHV=DHHV, NC=NC,
            qk_scale=qk_scale, eps=eps, dtype=compute_dtype,
        ),
        grid=(BNH, NC),
        in_specs=[
            pl.BlockSpec((1, L, DHQK), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L, DHQK), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L, DHHV), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, 1, 1), row4, memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, DHHV), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, 1, 1), lambda bi, j: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, S, DHHV), q.dtype),
            jax.ShapeDtypeStruct((BNH, 1, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((DHQK, DHHV), f32),
            pltpu.VMEM((1, DHQK), f32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, ifl, ffl, scaG)
    h = h.reshape(B, NH, S, DHHV)
    if return_last_states:
        # last (C, n) live only in scratch; round 2 adds explicit outputs
        raise NotImplementedError("return_last_states: use the jnp scan variant")
    return h
