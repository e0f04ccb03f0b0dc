"""Pallas TPU kernels: fused chunkwise sigmoid-input-gate mLSTM (fw + bw).

TPU-native replacement for the reference's six Triton kernels
(ref:mlstm_kernels/triton/chunkwise/xl_chunk_siging/*.py).  The design
differs deliberately:

- The TPU grid is *sequential* per core, so the forward is ONE fused
  kernel: grid (B*NH, NC) carries the (C, n) state in VMEM scratch
  across the chunk dimension and never materializes the (L, L) gate or
  score matrices in HBM (the reference needs two kernels because GPU
  thread-blocks can't carry state).
- Chunk states are tiny (DHQK x DHHV per head), so the forward stores
  them all; the backward skips the reference's recompute pass.
- The backward is two kernels instead of four: a reverse-scan dC kernel
  and one fused dQ/dK/dV kernel (the reference splits dQ/dK/dV into
  three launches for GPU occupancy reasons that don't apply here).
- Normalizer semantics match the reference bw exactly: the denominator
  n = max(|.|, 1) + eps is treated as a constant in the backward
  (ref:.../bw_kernel_recurrent.py:141-151 divides dH by vecN_out).
- Per-head scalar rows (gates, normalizers) are laid out (BNH, NC, L)
  and blocked as full per-head rows (Mosaic tiling constraint: block
  minors must divide (8, 128) or equal the array dims); the kernel
  slices its chunk with a dynamic index — the whole row is ~S floats,
  noise next to the qkv tiles.

Gate math (float32 throughout):
    b[l] = cumsum_l logsig(f);  a[l] = revcumsum_{>l} logsig(f) + logsig(i)
    g    = b[L-1]
    C_k  = e^g C_{k-1} + (e^a * k)^T v ;    n_k = e^g n_{k-1} + sum e^a k
    D    = tril(e^{b[l] - b[j] + logsig(i_j)})
    num  = e^b qs C_{k-1} + (qs k^T ∘ D) v ;  qs = q / sqrt(DHQK)
    den  = max(|e^b qs . n_{k-1} + rowsum(qs k^T ∘ D)|, 1)
    h    = num / (den + eps)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _interpret() -> bool:
    """Interpret kernels on CPU (test harness); compile on TPU/axon."""
    return jax.devices()[0].platform == "cpu"


def _cumsum_row(x):
    """Inclusive cumsum of a (1, L) row via a triangular matmul.

    Mosaic has no cumsum primitive; one (1,L)x(L,L) MXU pass is cheap
    relative to the chunk's (L,L) score matmuls.
    """
    L = x.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = (r <= c).astype(f32)
    return jax.lax.dot_general(
        x.astype(f32), tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )


def _revcumsum_row(x):
    """Strict reverse cumsum (sum over t > l) of a (1, L) row via matmul."""
    L = x.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = (r > c).astype(f32)
    return jax.lax.dot_general(
        x.astype(f32), tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )


def _chunk_gates(i_row, f_row):
    """(1, L) f32 chunk gate vectors: (b, a, logi).

    Mosaic cannot splat a *computed* (1,1) value across a tile, so both
    cumsums run as triangular matmuls and the chunk-total decay g comes
    in separately through SMEM.
    """
    logf = jax.nn.log_sigmoid(f_row.astype(f32))
    logi = jax.nn.log_sigmoid(i_row.astype(f32))
    b = _cumsum_row(logf)
    a = _revcumsum_row(logf) + logi
    return b, a, logi


def _fw_kernel(
    q_ref, k_ref, v_ref, i_ref, f_ref, g_ref, c0_ref, n0_ref,
    h_ref, nout_ref, cstates_ref, nstates_ref, clast_ref, nlast_ref,
    c_scr, n_scr,
    *, L: int, DHQK: int, DHHV: int, NC: int, qk_scale: float, eps: float,
    use_initial: bool, dtype: Any,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if use_initial:
            c_scr[...] = c0_ref[0].astype(f32)
            n_scr[...] = n0_ref[0].astype(f32)
        else:
            c_scr[...] = jnp.zeros((DHQK, DHHV), f32)
            n_scr[...] = jnp.zeros((1, DHQK), f32)

    C_prev = c_scr[...]  # (DHQK, DHHV) f32
    n_prev = n_scr[...]  # (1, DHQK) f32

    # stash the incoming state for the backward pass
    cstates_ref[0, 0] = C_prev
    nstates_ref[0, 0] = n_prev

    q = q_ref[0]  # (L, DHQK)
    k = k_ref[0]
    v = v_ref[0]
    i_row = i_ref[0, 0]  # (1, L)
    f_row = f_ref[0, 0]
    b, a, logi = _chunk_gates(i_row, f_row)
    gbar = jnp.exp(g_ref[0, 0, 0, 0])  # scalar from SMEM

    # ---- intra-chunk scores -------------------------------------------------
    s = jax.lax.dot_general(
        q.astype(dtype), k.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale  # (L, L)
    logD = b.T - b + logi  # (L_q, L_kv)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    D = jnp.where(row >= col, jnp.exp(logD), 0.0)
    sd = s * D  # (L, L) f32

    h_intra = jax.lax.dot_general(
        sd.astype(dtype), v.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (L, DHHV)
    n_intra = jnp.sum(sd, axis=1, keepdims=True)  # (L, 1)

    # ---- inter-chunk contribution ------------------------------------------
    qbar = q.astype(f32) * jnp.exp(b.T) * qk_scale
    h_inter = jax.lax.dot_general(
        qbar.astype(dtype), C_prev.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (L, DHHV)
    # N=1 matmuls against scratch operands trip Mosaic ("only constant
    # accumulators"); a broadcast-multiply + lane reduce is equivalent.
    n_inter = jnp.sum(qbar * n_prev, axis=1, keepdims=True)  # (L, 1)

    den = jnp.maximum(jnp.abs(n_inter + n_intra), 1.0)  # (L, 1)
    h = (h_inter + h_intra) / (den + eps)
    h_ref[0] = h.astype(h_ref.dtype)
    nout_ref[0, 0] = den.T

    # ---- state update -------------------------------------------------------
    kbar = k.astype(f32) * jnp.exp(a.T)  # (L, DHQK)
    dC = jax.lax.dot_general(
        kbar.astype(dtype), v.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (DHQK, DHHV)
    C_new = gbar * C_prev + dC
    n_new = gbar * n_prev + jnp.sum(kbar, axis=0, keepdims=True)
    c_scr[...] = C_new
    n_scr[...] = n_new

    @pl.when(j == NC - 1)
    def _final():
        clast_ref[0] = C_new
        nlast_ref[0] = n_new


def _fw(
    q, k, v, i, f, c_initial=None, n_initial=None,
    chunk_size: int = 128, qk_scale: float | None = None, eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
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

    qf = q.reshape(BNH, S, DHQK)
    kf = k.reshape(BNH, S, DHQK)
    vf = v.reshape(BNH, S, DHHV)
    ifl = i.reshape(BNH, NC, 1, L).astype(f32)
    ffl = f.reshape(BNH, NC, 1, L).astype(f32)
    scaG = jax.nn.log_sigmoid(f.astype(f32)).reshape(BNH, NC, L).sum(-1).reshape(BNH, NC, 1, 1)
    c0 = (
        c_initial.reshape(BNH, DHQK, DHHV).astype(f32)
        if use_initial
        else jnp.zeros((1, DHQK, DHHV), f32)
    )
    n0 = (
        n_initial.reshape(BNH, 1, DHQK).astype(f32)
        if use_initial
        else jnp.zeros((1, 1, DHQK), f32)
    )

    kern = functools.partial(
        _fw_kernel, L=L, DHQK=DHQK, DHHV=DHHV, NC=NC, qk_scale=qk_scale,
        eps=eps, use_initial=use_initial, dtype=compute_dtype,
    )
    row4 = lambda bi, j: (bi, j, 0, 0)  # per-chunk (1, 1, 1, L) row
    c0_idx = (lambda bi, j: (bi, 0, 0)) if use_initial else (lambda bi, j: (0, 0, 0))
    out = pl.pallas_call(
        kern,
        grid=(BNH, NC),
        in_specs=[
            pl.BlockSpec((1, L, DHQK), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L, DHQK), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L, DHHV), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, 1, 1), lambda bi, j: (bi, j, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, DHQK, DHHV), c0_idx),
            pl.BlockSpec((1, 1, DHQK), c0_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, L, DHHV), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, DHQK, DHHV), lambda bi, j: (bi, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, DHQK), row4),
            pl.BlockSpec((1, DHQK, DHHV), lambda bi, j: (bi, 0, 0)),
            pl.BlockSpec((1, 1, DHQK), lambda bi, j: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, S, DHHV), q.dtype),  # h
            jax.ShapeDtypeStruct((BNH, NC, 1, L), f32),  # n_out (denominator)
            jax.ShapeDtypeStruct((BNH, NC, DHQK, DHHV), f32),  # C states (pre)
            jax.ShapeDtypeStruct((BNH, NC, 1, DHQK), f32),  # n states (pre)
            jax.ShapeDtypeStruct((BNH, DHQK, DHHV), f32),  # C last
            jax.ShapeDtypeStruct((BNH, 1, DHQK), f32),  # n last
        ],
        scratch_shapes=[
            pltpu.VMEM((DHQK, DHHV), f32),
            pltpu.VMEM((1, DHQK), f32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, ifl, ffl, scaG, c0, n0)
    h, n_out, c_states, n_states, c_last, n_last = out
    return (
        h.reshape(B, NH, S, DHHV),
        n_out.reshape(B, NH, S),
        c_states.reshape(B, NH, NC, DHQK, DHHV),
        n_states.reshape(B, NH, NC, DHQK),
        c_last.reshape(B, NH, DHQK, DHHV),
        n_last.reshape(B, NH, DHQK),
    )


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bw_dc_kernel(
    q_ref, f_ref, g_ref, dh_ref, nout_ref, dclast_ref,
    dcstates_ref, dc0_ref, dc_scr,
    *, L: int, DHQK: int, DHHV: int, NC: int, qk_scale: float, eps: float,
    use_dclast: bool, dtype: Any,
):
    """Reverse scan: dC_{k-1} = e^g dC_k + Qbar_k^T (dH_k / n_k).

    Grid step j visits chunk jj = NC-1-j (q/dh/out blocks index-mapped;
    full-row refs sliced with jj); emits dC_jj (grad w.r.t. the state
    *after* chunk jj) at slot jj, plus dc0 = grad w.r.t. the state
    *before* chunk 0 (= c_initial) at the last step.
    """
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
    gbar = jnp.exp(g_ref[0, 0, 0, 0])  # scalar from SMEM
    n_row = nout_ref[0, 0]  # (1, L)
    dhn = dh_ref[0].astype(f32) / (n_row.T + eps)  # (L, DHHV)
    qbar = q.astype(f32) * jnp.exp(b.T) * qk_scale
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
    q_ref, k_ref, v_ref, i_ref, f_ref,
    cstates_ref, nout_ref, dh_ref, dcafter_ref,
    dq_ref, dk_ref, dv_ref,
    *, L: int, DHQK: int, DHHV: int, qk_scale: float, eps: float, dtype: Any,
):
    """Per-chunk dQ/dK/dV given stored C states and dC states (parallel)."""
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    i_row = i_ref[0, 0]
    f_row = f_ref[0, 0]
    b, a, logi = _chunk_gates(i_row, f_row)
    C_prev = cstates_ref[0, 0]
    dC_after = dcafter_ref[0, 0]
    n_row = nout_ref[0, 0]
    dhn = dh_ref[0].astype(f32) / (n_row.T + eps)  # (L, DHHV)

    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    logD = b.T - b + logi
    D = jnp.where(row >= col, jnp.exp(logD), 0.0)

    # P = (dhn V^T) ∘ D  (L, L)
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

    expb = jnp.exp(b.T)  # (L, 1)
    expa = jnp.exp(a.T)

    # dQ = scale * [ P K + e^b (dhn C_prev^T) ]
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

    # dK = scale * P^T Q + e^a (V dC_after^T)
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

    # dV = (S ∘ D)^T dhn + (e^a k) dC_after
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
    q, k, v, i, f, n_out, c_states, dh, dc_last=None,
    chunk_size: int = 128, qk_scale: float | None = None, eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
):
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    L = chunk_size
    NC = S // L
    BNH = B * NH
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    use_dclast = dc_last is not None

    qf = q.reshape(BNH, S, DHQK)
    kf = k.reshape(BNH, S, DHQK)
    vf = v.reshape(BNH, S, DHHV)
    ifl = i.reshape(BNH, NC, 1, L).astype(f32)
    ffl = f.reshape(BNH, NC, 1, L).astype(f32)
    nflat = n_out.reshape(BNH, NC, 1, L).astype(f32)
    scaG = jax.nn.log_sigmoid(f.astype(f32)).reshape(BNH, NC, L).sum(-1).reshape(BNH, NC, 1, 1)
    dhf = dh.reshape(BNH, S, DHHV)
    cs = c_states.reshape(BNH, NC, DHQK, DHHV)
    dcl = (
        dc_last.reshape(BNH, DHQK, DHHV).astype(f32)
        if use_dclast
        else jnp.zeros((1, DHQK, DHHV), f32)
    )

    row4 = lambda bi, j: (bi, j, 0, 0)
    rev = lambda bi, j: (bi, NC - 1 - j, 0)
    rev4 = lambda bi, j: (bi, NC - 1 - j, 0, 0)

    # 1) reverse-scan dC states
    dc_states = pl.pallas_call(
        functools.partial(
            _bw_dc_kernel, L=L, DHQK=DHQK, DHHV=DHHV, NC=NC,
            qk_scale=qk_scale, eps=eps, use_dclast=use_dclast,
            dtype=compute_dtype,
        ),
        grid=(BNH, NC),
        in_specs=[
            pl.BlockSpec((1, L, DHQK), rev),  # q of chunk jj
            pl.BlockSpec((1, 1, 1, L), rev4),  # f row of chunk jj
            pl.BlockSpec((1, 1, 1, 1), lambda bi, j: (bi, NC - 1 - j, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L, DHHV), rev),  # dh of chunk jj
            pl.BlockSpec((1, 1, 1, L), rev4),  # n_out row of chunk jj
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
    )(qf, ffl, scaG, dhf, nflat, dcl)
    dc_states, dc0_arr = dc_states

    # 2) fused per-chunk dQ/dK/dV
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bw_dqkv_kernel, L=L, DHQK=DHQK, DHHV=DHHV,
            qk_scale=qk_scale, eps=eps, dtype=compute_dtype,
        ),
        grid=(BNH, NC),
        in_specs=[
            pl.BlockSpec((1, L, DHQK), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L, DHQK), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L, DHHV), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, 1, DHQK, DHHV), lambda bi, j: (bi, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, L), row4),
            pl.BlockSpec((1, L, DHHV), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, 1, DHQK, DHHV), lambda bi, j: (bi, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L, DHQK), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L, DHQK), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L, DHHV), lambda bi, j: (bi, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, S, DHQK), f32),
            jax.ShapeDtypeStruct((BNH, S, DHQK), f32),
            jax.ShapeDtypeStruct((BNH, S, DHHV), f32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, ifl, ffl, cs, nflat, dhf, dc_states)

    dq = dq.reshape(B, NH, S, DHQK)
    dk = dk.reshape(B, NH, S, DHQK)
    dv = dv.reshape(B, NH, S, DHHV)

    # 3) gate grads (elementwise + cumsums; XLA fuses these fine)
    #    parity: ref:.../chunkwise_gates.py:75-100
    qg = q.astype(f32)
    kg = k.astype(f32)
    dfbar = (qg * dq).sum(-1) - (kg * dk).sum(-1)  # (B, NH, S)
    dfrev = jnp.cumsum(dfbar[..., ::-1], axis=-1)[..., ::-1]
    df = dfrev * jax.nn.sigmoid(-f.astype(f32))
    di = (kg * dk).sum(-1) * jax.nn.sigmoid(-i.astype(f32))

    dc0 = dc0_arr.reshape(B, NH, DHQK, DHHV)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), di, df, dc0


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _chunkwise_core(q, k, v, i, f, c_initial, n_initial,
                    chunk_size, qk_scale, eps, compute_dtype, return_last_states):
    h, n_out, cs, ns, c_last, n_last = _fw(
        q, k, v, i, f, c_initial, n_initial,
        chunk_size=chunk_size, qk_scale=qk_scale, eps=eps,
        compute_dtype=compute_dtype,
    )
    return (h, (c_last, n_last)) if return_last_states else h


def _core_fwd(q, k, v, i, f, c_initial, n_initial,
              chunk_size, qk_scale, eps, compute_dtype, return_last_states):
    h, n_out, cs, ns, c_last, n_last = _fw(
        q, k, v, i, f, c_initial, n_initial,
        chunk_size=chunk_size, qk_scale=qk_scale, eps=eps,
        compute_dtype=compute_dtype,
    )
    res = (q, k, v, i, f, n_out, cs, c_initial is not None)
    out = (h, (c_last, n_last)) if return_last_states else h
    return out, res


def _core_bwd(chunk_size, qk_scale, eps, compute_dtype, return_last_states, res, g):
    q, k, v, i, f, n_out, cs, had_init = res
    if return_last_states:
        dh, (dc_last, _dn_last) = g
    else:
        dh, dc_last = g, None
    dq, dk, dv, di, df, dc0 = _bw(
        q, k, v, i, f, n_out, cs, dh, dc_last=dc_last,
        chunk_size=chunk_size, qk_scale=qk_scale, eps=eps,
        compute_dtype=compute_dtype,
    )
    dci = dc0 if had_init else None
    dni = jnp.zeros_like(dc0[..., 0]) if had_init else None
    return dq, dk, dv, di, df, dci, dni


_chunkwise_core.defvjp(_core_fwd, _core_bwd)


def mlstm_siging_chunkwise_pallas(
    q, k, v, i, f,
    chunk_size: int = 128,
    c_initial=None,
    n_initial=None,
    qk_scale: float | None = None,
    normalize: bool = True,
    return_last_states: bool = False,
    eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
):
    """Drop-in Pallas counterpart of ops.mlstm_siging_chunkwise."""
    assert normalize, "unnormalized variant not implemented in the Pallas path"
    B, NH, S, DHQK = q.shape
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    return _chunkwise_core(
        q, k, v, i, f, c_initial, n_initial,
        chunk_size, qk_scale, eps, compute_dtype, return_last_states,
    )
