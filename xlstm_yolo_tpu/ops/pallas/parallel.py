"""Pallas TPU kernel: quadratic (flash-style) siging mLSTM, fw + bw.

TPU counterpart of the reference's ``parallel limit_headdim`` Triton
kernels (ref:mlstm_kernels/triton/parallel/limit_headdim/fw_kernel.py,
bw_kernel.py): the O(S^2) formulation streamed over query tiles.

Design differences from the GPU kernels, on purpose:
- Q-tiled grid (B*NH, S/TQ) with K/V resident in VMEM per step (the
  quadratic path targets short/medium S where (S, DH) fits easily),
  instead of the double-tiled flash loop — the TPU grid is sequential
  per core, so the inner KV loop buys nothing once K/V are resident.
- The sigmoid input gate needs NO running max: log D = (b_q - b_k) +
  logsig(i_k) <= 0, so accumulation is overflow-safe without the
  softmax-style stabilizer state the exp-gate flash kernel carries.
- Backward is two kernels: dQ over query tiles, dK/dV over key tiles
  (column-causal mask), plus the usual gate-grad identities.

Math matches ops.mlstm_parallel.mlstm_siging_parallel (the denominator
max(|.|,1)+eps is treated as constant in the backward, i.e. the
stopgrad_norm=True semantics of the reference bw kernels).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlstm_yolo_tpu.ops.pallas.chunkwise import _interpret

f32 = jnp.float32
NEG = -1e30


def _pick_tile(S: int, target: int = 256) -> int:
    if S <= target:
        return S
    for t in range(target - target % 8, 7, -8):
        if S % t == 0:
            return t
    return S


def _fw_kernel(
    q_ref, k_ref, v_ref, b_ref, li_ref, bq_ref,
    h_ref, nout_ref,
    *, TQ: int, S: int, DHQK: int, DHHV: int, qk_scale: float, eps: float,
    save_n: bool, dtype: Any,
):
    jq = pl.program_id(1)
    q = q_ref[0]  # (TQ, DHQK)
    k = k_ref[0]  # (S, DHQK)
    v = v_ref[0]  # (S, DHHV)
    b_q = bq_ref[0]  # (1, TQ) — this query tile's decay row
    b_all = b_ref[0]  # (1, S)
    li_all = li_ref[0]  # (1, S)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TQ, S), 0) + jq * TQ
    cols = jax.lax.broadcasted_iota(jnp.int32, (TQ, S), 1)
    logD = b_q.T - b_all + li_all  # (TQ, S)
    D = jnp.where(rows >= cols, jnp.exp(logD), 0.0)

    s = jax.lax.dot_general(
        q.astype(dtype), k.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale
    sd = s * D
    num = jax.lax.dot_general(
        sd.astype(dtype), v.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    den = jnp.maximum(jnp.abs(jnp.sum(sd, axis=1, keepdims=True)), 1.0)
    h_ref[0] = (num / (den + eps)).astype(h_ref.dtype)
    if save_n:
        nout_ref[0] = den.T


def _bw_dq_kernel(
    q_ref, k_ref, v_ref, b_ref, li_ref, bq_ref, nout_ref, dh_ref,
    dq_ref,
    *, TQ: int, S: int, DHQK: int, DHHV: int, qk_scale: float, eps: float,
    dtype: Any,
):
    jq = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    b_q = bq_ref[0]  # (1, TQ)
    b_all = b_ref[0]
    li_all = li_ref[0]
    n_row = nout_ref[0]  # (1, TQ)
    dhn = dh_ref[0].astype(f32) / (n_row.T + eps)  # (TQ, DHHV)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TQ, S), 0) + jq * TQ
    cols = jax.lax.broadcasted_iota(jnp.int32, (TQ, S), 1)
    D = jnp.where(rows >= cols, jnp.exp(b_q.T - b_all + li_all), 0.0)

    P = jax.lax.dot_general(
        dhn.astype(dtype), v.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * D
    dq = jax.lax.dot_general(
        P.astype(dtype), k.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bw_dkv_kernel(
    q_ref, k_ref, v_ref, b_ref, bk_ref, lik_ref, nout_ref, dh_ref,
    dk_ref, dv_ref,
    *, TK: int, S: int, DHQK: int, DHHV: int, qk_scale: float, eps: float,
    dtype: Any,
):
    jk = pl.program_id(1)
    q = q_ref[0]  # (S, DHQK) — full queries
    k = k_ref[0]  # (TK, DHQK)
    v = v_ref[0]  # (TK, DHHV)
    b_k = bk_ref[0]  # (1, TK)
    li_k = lik_ref[0]  # (1, TK)
    b_all = b_ref[0]  # (1, S)
    n_all = nout_ref[0]  # (1, S)
    dhn = dh_ref[0].astype(f32) / (n_all.T + eps)  # (S, DHHV)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TK, S), 0) + jk * TK  # key idx
    cols = jax.lax.broadcasted_iota(jnp.int32, (TK, S), 1)  # query idx
    # D^T[k, q] = e^{b_q - b_k + li_k} for q >= k
    logDT = b_all - b_k.T + li_k.T
    DT = jnp.where(cols >= rows, jnp.exp(logDT), 0.0)  # (TK, S)

    # P^T = DT ∘ (v dhn^T)
    PT = jax.lax.dot_general(
        v.astype(dtype), dhn.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * DT  # (TK, S)
    dk = jax.lax.dot_general(
        PT.astype(dtype), q.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale
    dk_ref[0] = dk.astype(dk_ref.dtype)

    # (S ∘ D)^T restricted to this key tile: (TK, S) of s_qk D_qk
    sT = jax.lax.dot_general(
        k.astype(dtype), q.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * qk_scale
    sdT = sT * DT
    dv = jax.lax.dot_general(
        sdT.astype(dtype), dhn.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _rows(x):
    B, NH, S = x.shape
    return x.reshape(B * NH, 1, S)


def _fw(q, k, v, i, f, qk_scale, eps, compute_dtype, save_n):
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    BNH = B * NH
    TQ = _pick_tile(S)
    NQ = S // TQ

    logf = jax.nn.log_sigmoid(f.astype(f32))
    # D[l, j] = exp(sum_{t=j+1..l} logsig f_t + logsig i_j)
    #         = exp(csum[l] - csum[j] + logsig i_j) with csum inclusive.
    vecB = jnp.cumsum(logf, axis=-1)
    logi = jax.nn.log_sigmoid(i.astype(f32))

    qf = q.reshape(BNH, S, DHQK)
    kf = k.reshape(BNH, S, DHQK)
    vf = v.reshape(BNH, S, DHHV)
    bf, lif = _rows(vecB), _rows(logi)

    kern = functools.partial(
        _fw_kernel, TQ=TQ, S=S, DHQK=DHQK, DHHV=DHHV,
        qk_scale=qk_scale, eps=eps, save_n=save_n, dtype=compute_dtype,
    )
    tile = lambda bi, j: (bi, j, 0)
    full = lambda bi, j: (bi, 0, 0)
    out_specs = [pl.BlockSpec((1, TQ, DHHV), tile)]
    out_shape = [jax.ShapeDtypeStruct((BNH, S, DHHV), q.dtype)]
    if save_n:
        out_specs.append(pl.BlockSpec((1, 1, TQ), lambda bi, j: (bi, 0, j)))
        out_shape.append(jax.ShapeDtypeStruct((BNH, 1, S), f32))
    else:
        # dummy tiny output keeps one kernel signature
        out_specs.append(pl.BlockSpec((1, 1, TQ), lambda bi, j: (bi, 0, j)))
        out_shape.append(jax.ShapeDtypeStruct((BNH, 1, S), f32))
    out = pl.pallas_call(
        kern,
        grid=(BNH, NQ),
        in_specs=[
            pl.BlockSpec((1, TQ, DHQK), tile),
            pl.BlockSpec((1, S, DHQK), full),
            pl.BlockSpec((1, S, DHHV), full),
            pl.BlockSpec((1, 1, S), full),
            pl.BlockSpec((1, 1, S), full),
            pl.BlockSpec((1, 1, TQ), lambda bi, j: (bi, 0, j)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(qf, kf, vf, bf, lif, bf)
    h, n_out = out
    return h.reshape(B, NH, S, DHHV), n_out, bf, lif


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _core(q, k, v, i, f, qk_scale, eps, compute_dtype):
    h, _, _, _ = _fw(q, k, v, i, f, qk_scale, eps, compute_dtype, save_n=True)
    return h


def _core_fwd(q, k, v, i, f, qk_scale, eps, compute_dtype):
    h, n_out, bf, lif = _fw(q, k, v, i, f, qk_scale, eps, compute_dtype, save_n=True)
    return h, (q, k, v, i, f, n_out)


def _core_bwd(qk_scale, eps, compute_dtype, res, dh):
    q, k, v, i, f, n_out = res
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    BNH = B * NH
    TQ = _pick_tile(S)
    NQ = S // TQ

    logf = jax.nn.log_sigmoid(f.astype(f32))
    vecB = jnp.cumsum(logf, axis=-1)
    logi = jax.nn.log_sigmoid(i.astype(f32))
    qf = q.reshape(BNH, S, DHQK)
    kf = k.reshape(BNH, S, DHQK)
    vf = v.reshape(BNH, S, DHHV)
    dhf = dh.reshape(BNH, S, DHHV)
    bf, lif = _rows(vecB), _rows(logi)

    tile = lambda bi, j: (bi, j, 0)
    full = lambda bi, j: (bi, 0, 0)
    nrow_tile = lambda bi, j: (bi, 0, j)

    dq = pl.pallas_call(
        functools.partial(
            _bw_dq_kernel, TQ=TQ, S=S, DHQK=DHQK, DHHV=DHHV,
            qk_scale=qk_scale, eps=eps, dtype=compute_dtype,
        ),
        grid=(BNH, NQ),
        in_specs=[
            pl.BlockSpec((1, TQ, DHQK), tile),
            pl.BlockSpec((1, S, DHQK), full),
            pl.BlockSpec((1, S, DHHV), full),
            pl.BlockSpec((1, 1, S), full),
            pl.BlockSpec((1, 1, S), full),
            pl.BlockSpec((1, 1, TQ), nrow_tile),
            pl.BlockSpec((1, 1, TQ), nrow_tile),
            pl.BlockSpec((1, TQ, DHHV), tile),
        ],
        out_specs=[pl.BlockSpec((1, TQ, DHQK), tile)],
        out_shape=[jax.ShapeDtypeStruct((BNH, S, DHQK), q.dtype)],
        interpret=_interpret(),
    )(qf, kf, vf, bf, lif, bf, n_out, dhf)[0]

    dk, dv = pl.pallas_call(
        functools.partial(
            _bw_dkv_kernel, TK=TQ, S=S, DHQK=DHQK, DHHV=DHHV,
            qk_scale=qk_scale, eps=eps, dtype=compute_dtype,
        ),
        grid=(BNH, NQ),
        in_specs=[
            pl.BlockSpec((1, S, DHQK), full),
            pl.BlockSpec((1, TQ, DHQK), tile),
            pl.BlockSpec((1, TQ, DHHV), tile),
            pl.BlockSpec((1, 1, S), full),
            pl.BlockSpec((1, 1, TQ), nrow_tile),
            pl.BlockSpec((1, 1, TQ), nrow_tile),
            pl.BlockSpec((1, 1, S), full),
            pl.BlockSpec((1, S, DHHV), full),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ, DHQK), tile),
            pl.BlockSpec((1, TQ, DHHV), tile),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, S, DHQK), k.dtype),
            jax.ShapeDtypeStruct((BNH, S, DHHV), v.dtype),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, bf, bf, lif, n_out, dhf)

    dq = dq.reshape(B, NH, S, DHQK)
    dk = dk.reshape(B, NH, S, DHQK)
    dv = dv.reshape(B, NH, S, DHHV)

    qg, kg = q.astype(f32), k.astype(f32)
    dfbar = (qg * dq).sum(-1) - (kg * dk).sum(-1)
    dfrev = jnp.cumsum(dfbar[..., ::-1], axis=-1)[..., ::-1]
    df = dfrev * jax.nn.sigmoid(-f.astype(f32))
    di = (kg * dk).sum(-1) * jax.nn.sigmoid(-i.astype(f32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), di, df


_core.defvjp(_core_fwd, _core_bwd)


def mlstm_siging_parallel_pallas(
    q, k, v, i, f,
    qk_scale: float | None = None,
    normalize: bool = True,
    eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
    **_ignored,
):
    """Flash-style quadratic siging mLSTM (fw + custom-VJP bw)."""
    assert normalize, "unnormalized variant not implemented in the Pallas path"
    if qk_scale is None:
        qk_scale = q.shape[-1] ** -0.5
    return _core(q, k, v, i, f, qk_scale, eps, compute_dtype)
