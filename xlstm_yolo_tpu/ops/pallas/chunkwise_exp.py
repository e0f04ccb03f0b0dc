"""Pallas TPU kernels: chunkwise mLSTM with exp input gate (fw + bw).

TPU counterpart of the reference's ``xl_chunk`` Triton family
(ref:mlstm_kernels/triton/chunkwise/xl_chunk/*.py — the exp-gate
variant whose input gate can exceed 1, so a per-head running max ``m``
is carried across chunks and C/n are stored relative to it).  Same
fused single-pass design as the siging kernel (`chunkwise.py`): the
sequential TPU grid carries (C, n, m) in VMEM scratch.

Backward (round 2): the reference backward treats the stabilizers
(scaM states, row m_comb) and the denominator as constants
(ref:.../xl_chunk/bw_kernel_recurrent.py), so the kernels are the
siging backward with the stabilizer factors substituted:
    D~      = e^{logD - m_comb}         (for D)
    e^{b}   -> e^{b + m_prev - m_comb}  (Qbar factor)
    e^{a}   -> e^{a - m_new}            (Kbar factor)
    di      = (k . dk).sum              (raw exp gate: d e^i/di = e^i)
    df      = revcumsum((q . dq).sum - (k . dk).sum) * sigmoid(-f)

Math matches ops.mlstm_chunkwise_stabilized(stopgrad_norm=True):

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
NEG = -1e30  # -inf stand-in that survives exp() without NaNs in-kernel


def _exp_gates(i_row, f_row, L):
    """(1, L) rows -> b (cumsum logf), a (revcumsum logf + raw i), logD parts."""
    logf = jax.nn.log_sigmoid(f_row.astype(f32))
    i_raw = i_row.astype(f32)
    b = _cumsum_row(logf)
    a = _revcumsum_row(logf) + i_raw
    return b, a, i_raw


def _fw_kernel(
    q_ref, k_ref, v_ref, i_ref, f_ref, g_ref, c0_ref, n0_ref, m0_ref,
    h_ref, nout_ref, mcomb_ref, cstates_ref, mstates_ref,
    clast_ref, nlast_ref, mlast_ref,
    c_scr, n_scr, m_scr,
    *, L: int, DHQK: int, DHHV: int, NC: int, qk_scale: float, eps: float,
    use_initial: bool, save_states: bool, dtype: Any,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if use_initial:
            c_scr[...] = c0_ref[0].astype(f32)
            n_scr[...] = n0_ref[0].astype(f32)
            m_scr[...] = m0_ref[0].astype(f32)
        else:
            c_scr[...] = jnp.zeros((DHQK, DHHV), f32)
            n_scr[...] = jnp.zeros((1, DHQK), f32)
            m_scr[...] = jnp.zeros((1, 1), f32)

    C_prev = c_scr[...]
    n_prev = n_scr[...]
    m_prev = m_scr[...]  # (1, 1)

    if save_states:
        cstates_ref[0, 0] = C_prev
        mstates_ref[0, 0] = m_prev

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    b, a, i_raw = _exp_gates(i_ref[0, 0], f_ref[0, 0], L)
    g = g_ref[0, 0, 0, 0]

    # ---- intra-chunk with per-row stabilizer -------------------------------
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    logD = jnp.where(row >= col, b.T - b + i_raw, NEG)  # (L, L)
    d_max = jnp.max(logD, axis=1, keepdims=True)  # (L, 1)
    b_inter = b.T + m_prev  # (L, 1)
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
    if save_states:
        nout_ref[0, 0] = den.T  # (1, L)
        mcomb_ref[0, 0] = m_comb.T

    # ---- state update with max-state renormalization -----------------------
    a_max = jnp.max(a, axis=1, keepdims=True)  # (1, 1)
    m_new = jnp.maximum(g + m_prev, a_max)  # (1, 1)
    gbar = jnp.exp(g + m_prev - m_new)
    abar = jnp.exp(a - m_new)  # (1, L)
    kbar = k.astype(f32) * abar.T
    dC = jax.lax.dot_general(
        kbar.astype(dtype), v.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    C_new = gbar * C_prev + dC
    n_new = gbar * n_prev + jnp.sum(kbar, axis=0, keepdims=True)
    c_scr[...] = C_new
    n_scr[...] = n_new
    m_scr[...] = m_new

    @pl.when(j == NC - 1)
    def _final():
        clast_ref[0] = C_new
        nlast_ref[0] = n_new
        mlast_ref[0] = m_new


def _pack(q, k, v, i, f):
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    BNH = B * NH
    return (
        q.reshape(BNH, S, DHQK), k.reshape(BNH, S, DHQK), v.reshape(BNH, S, DHHV),
    )


def _rows(x, NC, L):
    BNH = x.shape[0] * x.shape[1]
    return x.reshape(BNH, NC, 1, L).astype(f32)


def _fw(
    q, k, v, i, f, c_initial=None, n_initial=None, m_initial=None,
    chunk_size: int = 128, qk_scale: float | None = None, eps: float = 1e-6,
    compute_dtype=jnp.bfloat16, save_states: bool = True,
):
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    L = chunk_size
    assert S % L == 0, f"S={S} % L={L}"
    NC = S // L
    BNH = B * NH
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    use_initial = c_initial is not None

    qf, kf, vf = _pack(q, k, v, i, f)
    ifl, ffl = _rows(i, NC, L), _rows(f, NC, L)
    scaG = jax.nn.log_sigmoid(f.astype(f32)).reshape(BNH, NC, L).sum(-1).reshape(BNH, NC, 1, 1)
    c0 = c_initial.reshape(BNH, DHQK, DHHV).astype(f32) if use_initial else jnp.zeros((1, DHQK, DHHV), f32)
    n0 = n_initial.reshape(BNH, 1, DHQK).astype(f32) if use_initial else jnp.zeros((1, 1, DHQK), f32)
    m0 = m_initial.reshape(BNH, 1, 1).astype(f32) if use_initial else jnp.zeros((1, 1, 1), f32)

    row4 = lambda bi, j: (bi, j, 0, 0)
    seq = lambda bi, j: (bi, j, 0)
    one = lambda bi, j: (bi, 0, 0)
    c0_idx = one if use_initial else (lambda bi, j: (0, 0, 0))
    kern = functools.partial(
        _fw_kernel, L=L, DHQK=DHQK, DHHV=DHHV, NC=NC, qk_scale=qk_scale,
        eps=eps, use_initial=use_initial, save_states=save_states,
        dtype=compute_dtype,
    )
    in_specs = [
        pl.BlockSpec((1, L, DHQK), seq),
        pl.BlockSpec((1, L, DHQK), seq),
        pl.BlockSpec((1, L, DHHV), seq),
        pl.BlockSpec((1, 1, 1, L), row4),
        pl.BlockSpec((1, 1, 1, L), row4),
        pl.BlockSpec((1, 1, 1, 1), row4, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, DHQK, DHHV), c0_idx),
        pl.BlockSpec((1, 1, DHQK), c0_idx),
        pl.BlockSpec((1, 1, 1), c0_idx),
    ]
    scratch = [
        pltpu.VMEM((DHQK, DHHV), f32),
        pltpu.VMEM((1, DHQK), f32),
        pltpu.VMEM((1, 1), f32),
    ]

    if save_states:
        out = pl.pallas_call(
            kern,
            grid=(BNH, NC),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, L, DHHV), seq),
                pl.BlockSpec((1, 1, 1, L), row4),
                pl.BlockSpec((1, 1, 1, L), row4),
                pl.BlockSpec((1, 1, DHQK, DHHV), lambda bi, j: (bi, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, 1), lambda bi, j: (bi, j, 0, 0)),
                pl.BlockSpec((1, DHQK, DHHV), one),
                pl.BlockSpec((1, 1, DHQK), one),
                pl.BlockSpec((1, 1, 1), one),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BNH, S, DHHV), q.dtype),
                jax.ShapeDtypeStruct((BNH, NC, 1, L), f32),  # den
                jax.ShapeDtypeStruct((BNH, NC, 1, L), f32),  # m_comb
                jax.ShapeDtypeStruct((BNH, NC, DHQK, DHHV), f32),  # C pre-states
                jax.ShapeDtypeStruct((BNH, NC, 1, 1), f32),  # m pre-states
                jax.ShapeDtypeStruct((BNH, DHQK, DHHV), f32),
                jax.ShapeDtypeStruct((BNH, 1, DHQK), f32),
                jax.ShapeDtypeStruct((BNH, 1, 1), f32),
            ],
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(qf, kf, vf, ifl, ffl, scaG, c0, n0, m0)
        h, n_out, m_comb, cs, ms, c_last, n_last, m_last = out
    else:
        def kern_nosave(q_, k_, v_, i_, f_, g_, c0_, n0_, m0_,
                        h_, cl_, nl_, ml_, c_s, n_s, m_s):
            _fw_kernel(q_, k_, v_, i_, f_, g_, c0_, n0_, m0_,
                       h_, None, None, None, None, cl_, nl_, ml_,
                       c_s, n_s, m_s,
                       L=L, DHQK=DHQK, DHHV=DHHV, NC=NC, qk_scale=qk_scale,
                       eps=eps, use_initial=use_initial, save_states=False,
                       dtype=compute_dtype)

        out = pl.pallas_call(
            kern_nosave,
            grid=(BNH, NC),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, L, DHHV), seq),
                pl.BlockSpec((1, DHQK, DHHV), one),
                pl.BlockSpec((1, 1, DHQK), one),
                pl.BlockSpec((1, 1, 1), one),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BNH, S, DHHV), q.dtype),
                jax.ShapeDtypeStruct((BNH, DHQK, DHHV), f32),
                jax.ShapeDtypeStruct((BNH, 1, DHQK), f32),
                jax.ShapeDtypeStruct((BNH, 1, 1), f32),
            ],
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(qf, kf, vf, ifl, ffl, scaG, c0, n0, m0)
        h, c_last, n_last, m_last = out
        n_out = m_comb = cs = ms = None

    h = h.reshape(B, NH, S, DHHV)
    state = (
        c_last.reshape(B, NH, DHQK, DHHV),
        n_last.reshape(B, NH, DHQK),
        m_last.reshape(B, NH),
    )
    return h, n_out, m_comb, cs, ms, state


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bw_dc_kernel(
    q_ref, f_ref, mprev_ref, mcomb_ref, dh_ref, nout_ref, dclast_ref,
    dcstates_ref, dc0_ref, dc_scr,
    *, L: int, DHQK: int, DHHV: int, NC: int, qk_scale: float, eps: float,
    use_dclast: bool, dtype: Any,
):
    """Reverse scan: dC_{k-1} = gbar_k dC_k + Qbar_k^T (dH_k / den_k).

    gbar_k = e^{g_k + m_{k-1} - m_k} arrives precomputed in mprev_ref
    slot 1 (SMEM rows carry [m_prev_k, gbar_k]).  Also emits dc0 = grad
    w.r.t. the state *before* chunk 0 (= c_initial, in its m_initial
    scaling) at the last step."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if use_dclast:
            dc_scr[...] = dclast_ref[0].astype(f32)
        else:
            dc_scr[...] = jnp.zeros((DHQK, DHHV), f32)

    dC_after = dc_scr[...]
    dcstates_ref[0, 0] = dC_after

    q = q_ref[0]
    f_row = f_ref[0, 0]
    logf = jax.nn.log_sigmoid(f_row.astype(f32))
    b = _cumsum_row(logf)
    m_prev = mprev_ref[0, 0, 0, 0]
    gbar = mprev_ref[0, 0, 0, 1]  # e^{g + m_prev - m_new}, precomputed
    m_comb = mcomb_ref[0, 0]  # (1, L)
    n_row = nout_ref[0, 0]
    dhn = dh_ref[0].astype(f32) / (n_row.T + eps)
    qbar = q.astype(f32) * jnp.exp(b.T + m_prev - m_comb.T) * qk_scale
    dC_prev = gbar * dC_after + jax.lax.dot_general(
        qbar.astype(dtype), dhn.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dc_scr[...] = dC_prev

    @pl.when(j == NC - 1)
    def _final():
        dc0_ref[0] = dC_prev


def _bw_dqkv_kernel(
    q_ref, k_ref, v_ref, i_ref, f_ref, mrow_ref, mcomb_ref,
    cstates_ref, nout_ref, dh_ref, dcafter_ref,
    dq_ref, dk_ref, dv_ref,
    *, L: int, DHQK: int, DHHV: int, qk_scale: float, eps: float, dtype: Any,
):
    """Per-chunk dQ/dK/dV; mrow carries [m_prev, m_new] per chunk."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    b, a, i_raw = _exp_gates(i_ref[0, 0], f_ref[0, 0], L)
    m_prev = mrow_ref[0, 0, 0, 0]
    m_new = mrow_ref[0, 0, 0, 1]
    m_comb = mcomb_ref[0, 0]  # (1, L)
    C_prev = cstates_ref[0, 0]
    dC_after = dcafter_ref[0, 0]
    n_row = nout_ref[0, 0]
    dhn = dh_ref[0].astype(f32) / (n_row.T + eps)

    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    logD = jnp.where(row >= col, b.T - b + i_raw, NEG)
    D = jnp.exp(logD - m_comb.T)  # row-stabilized

    P = jax.lax.dot_general(
        dhn.astype(dtype), v.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * D
    s = jax.lax.dot_general(
        q.astype(dtype), k.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale
    sd = s * D

    expb = jnp.exp(b.T + m_prev - m_comb.T)  # (L, 1)
    expa = jnp.exp(a.T - m_new)

    dq = jax.lax.dot_general(
        P.astype(dtype), k.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale
    dq += jax.lax.dot_general(
        dhn.astype(dtype), C_prev.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * (expb * qk_scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk = jax.lax.dot_general(
        P.astype(dtype), q.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale
    dk += jax.lax.dot_general(
        v.astype(dtype), dC_after.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * expa
    dk_ref[0] = dk.astype(dk_ref.dtype)

    dv = jax.lax.dot_general(
        sd.astype(dtype), dhn.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dv += jax.lax.dot_general(
        (k.astype(f32) * expa).astype(dtype), dC_after.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bw(
    q, k, v, i, f, n_out, m_comb, c_states, m_states, m_last, dh,
    dc_last=None, chunk_size: int = 128, qk_scale: float | None = None,
    eps: float = 1e-6, compute_dtype=jnp.bfloat16,
):
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    L = chunk_size
    NC = S // L
    BNH = B * NH
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    use_dclast = dc_last is not None

    qf, kf, vf = _pack(q, k, v, i, f)
    ifl, ffl = _rows(i, NC, L), _rows(f, NC, L)
    dhf = dh.reshape(BNH, S, DHHV)
    scaG = jax.nn.log_sigmoid(f.astype(f32)).reshape(BNH, NC, L).sum(-1)  # (BNH, NC)

    # per-chunk scalars: m_prev_k, m_new_k (= m_prev_{k+1} | m_last),
    # gbar_k = e^{g_k + m_prev_k - m_new_k}; packed [m_prev, x] rows
    mprev = m_states.reshape(BNH, NC)
    mnew = jnp.concatenate([mprev[:, 1:], m_last.reshape(BNH, 1)], axis=1)
    gbar = jnp.exp(scaG + mprev - mnew)
    mrow_dc = jnp.stack([mprev, gbar], axis=-1).reshape(BNH, NC, 1, 2)
    mrow_qkv = jnp.stack([mprev, mnew], axis=-1).reshape(BNH, NC, 1, 2)

    row4 = lambda bi, j: (bi, j, 0, 0)
    seq = lambda bi, j: (bi, j, 0)
    rev = lambda bi, j: (bi, NC - 1 - j, 0)
    rev4 = lambda bi, j: (bi, NC - 1 - j, 0, 0)

    dc_states = pl.pallas_call(
        functools.partial(
            _bw_dc_kernel, L=L, DHQK=DHQK, DHHV=DHHV, NC=NC,
            qk_scale=qk_scale, eps=eps, use_dclast=use_dclast,
            dtype=compute_dtype,
        ),
        grid=(BNH, NC),
        in_specs=[
            pl.BlockSpec((1, L, DHQK), rev),
            pl.BlockSpec((1, 1, 1, L), rev4),
            pl.BlockSpec((1, 1, 1, 2), rev4, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, L), rev4),
            pl.BlockSpec((1, L, DHHV), rev),
            pl.BlockSpec((1, 1, 1, L), rev4),
            pl.BlockSpec(
                (1, DHQK, DHHV),
                (lambda bi, j: (bi, 0, 0)) if use_dclast else (lambda bi, j: (0, 0, 0)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, DHQK, DHHV), lambda bi, j: (bi, NC - 1 - j, 0, 0)),
            pl.BlockSpec((1, DHQK, DHHV), lambda bi, j: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, NC, DHQK, DHHV), f32),
            jax.ShapeDtypeStruct((BNH, DHQK, DHHV), f32),
        ],
        scratch_shapes=[pltpu.VMEM((DHQK, DHHV), f32)],
        interpret=_interpret(),
    )(qf, ffl, mrow_dc, m_comb, dhf, n_out, (
        dc_last.reshape(BNH, DHQK, DHHV).astype(f32)
        if use_dclast else jnp.zeros((1, DHQK, DHHV), f32)
    ))
    dc_states, dc0_arr = dc_states

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bw_dqkv_kernel, L=L, DHQK=DHQK, DHHV=DHHV,
            qk_scale=qk_scale, eps=eps, dtype=compute_dtype,
        ),
        grid=(BNH, NC),
        in_specs=[
            pl.BlockSpec((1, L, DHQK), seq),
            pl.BlockSpec((1, L, DHQK), seq),
            pl.BlockSpec((1, L, DHHV), seq),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, 1, 2), row4, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, DHQK, DHHV), lambda bi, j: (bi, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, L, DHHV), seq),
            pl.BlockSpec((1, 1, DHQK, DHHV), lambda bi, j: (bi, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L, DHQK), seq),
            pl.BlockSpec((1, L, DHQK), seq),
            pl.BlockSpec((1, L, DHHV), seq),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, S, DHQK), q.dtype),
            jax.ShapeDtypeStruct((BNH, S, DHQK), k.dtype),
            jax.ShapeDtypeStruct((BNH, S, DHHV), v.dtype),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, ifl, ffl, mrow_qkv, m_comb, c_states, n_out, dhf, dc_states)

    dq = dq.reshape(B, NH, S, DHQK)
    dk = dk.reshape(B, NH, S, DHQK)
    dv = dv.reshape(B, NH, S, DHHV)

    # gate grads: raw exp input gate (no sigmoid'), sigmoid forget gate
    qg, kg = q.astype(f32), k.astype(f32)
    dfbar = (qg * dq).sum(-1) - (kg * dk).sum(-1)
    dfrev = jnp.cumsum(dfbar[..., ::-1], axis=-1)[..., ::-1]
    df = dfrev * jax.nn.sigmoid(-f.astype(f32))
    di = (kg * dk).sum(-1)

    dc0 = dc0_arr.reshape(B, NH, DHQK, DHHV)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), di, df, dc0


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _core(q, k, v, i, f, c_initial, n_initial, m_initial,
          chunk_size, qk_scale, eps, compute_dtype, return_last_states):
    h, _, _, _, _, state = _fw(
        q, k, v, i, f, c_initial, n_initial, m_initial,
        chunk_size=chunk_size, qk_scale=qk_scale, eps=eps,
        compute_dtype=compute_dtype, save_states=False,
    )
    return (h, state) if return_last_states else h


def _core_fwd(q, k, v, i, f, c_initial, n_initial, m_initial,
              chunk_size, qk_scale, eps, compute_dtype, return_last_states):
    h, n_out, m_comb, cs, ms, state = _fw(
        q, k, v, i, f, c_initial, n_initial, m_initial,
        chunk_size=chunk_size, qk_scale=qk_scale, eps=eps,
        compute_dtype=compute_dtype, save_states=True,
    )
    res = (q, k, v, i, f, n_out, m_comb, cs, ms, state[2], c_initial is not None)
    return ((h, state) if return_last_states else h), res


def _core_bwd(chunk_size, qk_scale, eps, compute_dtype, return_last_states, res, g):
    q, k, v, i, f, n_out, m_comb, cs, ms, m_last, had_init = res
    if return_last_states:
        dh, (dc_last, _dn, _dm) = g
    else:
        dh, dc_last = g, None
    dq, dk, dv, di, df, dc0 = _bw(
        q, k, v, i, f, n_out, m_comb, cs, ms, m_last, dh, dc_last=dc_last,
        chunk_size=chunk_size, qk_scale=qk_scale, eps=eps,
        compute_dtype=compute_dtype,
    )
    dci = dc0 if had_init else None
    dni = jnp.zeros_like(dc0[..., 0]) if had_init else None
    dmi = jnp.zeros(dc0.shape[:2], dc0.dtype) if had_init else None
    return dq, dk, dv, di, df, dci, dni, dmi


_core.defvjp(_core_fwd, _core_bwd)


def mlstm_chunkwise_exp_pallas(
    q, k, v, i, f,
    chunk_size: int = 128,
    c_initial=None, n_initial=None, m_initial=None,
    qk_scale: float | None = None,
    return_last_states: bool = False,
    eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
):
    """Chunkwise exp-gate mLSTM, fused Pallas fw + custom-VJP bw."""
    B, NH, S, DHQK = q.shape
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    if c_initial is not None and m_initial is None:
        m_initial = jnp.zeros((B, NH), f32)
    return _core(
        q, k, v, i, f, c_initial, n_initial, m_initial,
        chunk_size, qk_scale, eps, compute_dtype, return_last_states,
    )
