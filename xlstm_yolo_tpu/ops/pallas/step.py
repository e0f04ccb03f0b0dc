"""Pallas fused single-timestep mLSTM state update (generation path).

TPU counterpart of the reference's fused Triton step kernel
(ref:mlstm_kernels/triton/recurrent/fw_step_fused.py:19): one kernel
updates (C, n) in place and emits h for a single token, per (b, head).
Sigmoid-input-gate variant (what the ViL model runs):

    C' = sig(f) C + sig(i) k v^T ;  n' = sig(f) n + sig(i) k
    h  = (qs C') / (max(|qs . n'|, 1) + eps),  qs = q / sqrt(DHQK)

All products are VPU broadcast/reduce ops — at DH=32 the MXU has
nothing to chew on, and fusing avoids five elementwise HBM round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _step_kernel(q_ref, k_ref, v_ref, i_ref, f_ref, c_ref, n_ref,
                 h_ref, cnew_ref, nnew_ref,
                 *, DHQK: int, DHHV: int, qk_scale: float, eps: float):
    ig = jax.nn.sigmoid(i_ref[0, 0, 0, 0])  # SMEM scalars
    fg = jax.nn.sigmoid(f_ref[0, 0, 0, 0])
    q = q_ref[0].astype(f32)  # (1, DHQK)
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)  # (1, DHHV)
    C = c_ref[0].astype(f32)  # (DHQK, DHHV)
    n = n_ref[0].astype(f32)  # (1, DHQK)

    C_new = fg * C + ig * (k.T * v)  # outer product via broadcast
    n_new = fg * n + ig * k
    cnew_ref[0] = C_new
    nnew_ref[0] = n_new

    qs = q * qk_scale
    num = jnp.sum(qs.T * C_new, axis=0, keepdims=True)  # (1, DHHV)
    den = jnp.maximum(jnp.abs(jnp.sum(qs * n_new, axis=1, keepdims=True)), 1.0)
    h_ref[0] = (num / (den + eps)).astype(h_ref.dtype)


def mlstm_siging_step_pallas(
    q, k, v, i, f, c_state, n_state,
    qk_scale: float | None = None, normalize: bool = True, eps: float = 1e-6,
):
    """Drop-in for ops.mlstm_siging_step: q/k (B, NH, DHQK), v (B, NH, DHHV)."""
    assert normalize
    B, NH, DHQK = q.shape
    DHHV = v.shape[-1]
    BNH = B * NH
    if qk_scale is None:
        qk_scale = DHQK**-0.5

    qf = q.reshape(BNH, 1, DHQK)
    kf = k.reshape(BNH, 1, DHQK)
    vf = v.reshape(BNH, 1, DHHV)
    ifl = i.reshape(BNH, 1, 1, 1).astype(f32)
    ffl = f.reshape(BNH, 1, 1, 1).astype(f32)
    cf = c_state.reshape(BNH, DHQK, DHHV).astype(f32)
    nf = n_state.reshape(BNH, 1, DHQK).astype(f32)

    row = lambda bi: (bi, 0, 0)
    h, c_new, n_new = pl.pallas_call(
        functools.partial(
            _step_kernel, DHQK=DHQK, DHHV=DHHV, qk_scale=qk_scale, eps=eps
        ),
        grid=(BNH,),
        in_specs=[
            pl.BlockSpec((1, 1, DHQK), row),
            pl.BlockSpec((1, 1, DHQK), row),
            pl.BlockSpec((1, 1, DHHV), row),
            pl.BlockSpec((1, 1, 1, 1), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, DHQK, DHHV), row),
            pl.BlockSpec((1, 1, DHQK), row),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, DHHV), row),
            pl.BlockSpec((1, DHQK, DHHV), row),
            pl.BlockSpec((1, 1, DHQK), row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, 1, DHHV), q.dtype),
            jax.ShapeDtypeStruct((BNH, DHQK, DHHV), f32),
            jax.ShapeDtypeStruct((BNH, 1, DHQK), f32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, ifl, ffl, cf, nf)
    return (
        h.reshape(B, NH, DHHV),
        (c_new.reshape(B, NH, DHQK, DHHV), n_new.reshape(B, NH, DHQK)),
    )
