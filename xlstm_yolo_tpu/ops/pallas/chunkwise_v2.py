"""Experimental v2 forward kernel: head-group batching per grid step.

v1 (`chunkwise.py`) serializes grid (B*NH, NC) — 1248 tiny sequential
steps at flagship batch 8, which is step-overhead-bound.  v2 processes a
group of G heads per step with a static in-kernel loop: grid
(B*NH/G, NC), G-fold fewer steps, same math.  VMEM per step stays
modest because the (L, L) tiles are consumed head-by-head.

Forward-only for now (perf experiment; docs/NEXT_STEPS.md).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlstm_yolo_tpu.ops.pallas.chunkwise import _chunk_gates, _interpret

f32 = jnp.float32


def _fw_kernel_v2(
    q_ref, k_ref, v_ref, i_ref, f_ref, g_ref,
    h_ref,
    c_scr, n_scr,
    *, G: int, L: int, DHQK: int, DHHV: int, NC: int, qk_scale: float,
    eps: float, dtype: Any,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        c_scr[...] = jnp.zeros((G * DHQK, DHHV), f32)
        n_scr[...] = jnp.zeros((G, DHQK), f32)

    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)

    for h in range(G):  # static unroll over the head group
        q = q_ref[0, h, 0]
        k = k_ref[0, h, 0]
        v = v_ref[0, h, 0]
        i_row = i_ref[0, 0, h : h + 1, :]  # (1, L)
        f_row = f_ref[0, 0, h : h + 1, :]
        b, a, logi = _chunk_gates(i_row, f_row)
        gbar = jnp.exp(g_ref[0, 0, 0, h])

        C_prev = c_scr[h * DHQK : (h + 1) * DHQK, :]
        n_prev = n_scr[h : h + 1, :]

        s = jax.lax.dot_general(
            q.astype(dtype), k.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * qk_scale
        D = jnp.where(row >= col, jnp.exp(b.T - b + logi), 0.0)
        sd = s * D

        h_intra = jax.lax.dot_general(
            sd.astype(dtype), v.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        n_intra = jnp.sum(sd, axis=1, keepdims=True)

        qbar = q.astype(f32) * jnp.exp(b.T) * qk_scale
        h_inter = jax.lax.dot_general(
            qbar.astype(dtype), C_prev.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        n_inter = jnp.sum(qbar * n_prev, axis=1, keepdims=True)

        den = jnp.maximum(jnp.abs(n_inter + n_intra), 1.0)
        h_ref[0, h, 0] = ((h_inter + h_intra) / (den + eps)).astype(h_ref.dtype)

        kbar = k.astype(f32) * jnp.exp(a.T)
        dC = jax.lax.dot_general(
            kbar.astype(dtype), v.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        c_scr[h * DHQK : (h + 1) * DHQK, :] = gbar * C_prev + dC
        n_scr[h : h + 1, :] = gbar * n_prev + jnp.sum(kbar, axis=0, keepdims=True)


def mlstm_siging_chunkwise_pallas_v2(
    q, k, v, i, f,
    chunk_size: int = 128,
    head_group: int = 0,  # 0 -> all NH heads per step
    qk_scale: float | None = None,
    eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
):
    """Forward-only v2 (head-grouped grid)."""
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    L = chunk_size
    assert S % L == 0
    NC = S // L
    G = head_group or NH
    BNH = B * NH
    assert BNH % G == 0
    NG = BNH // G
    if qk_scale is None:
        qk_scale = DHQK**-0.5

    qf = q.reshape(NG, G, NC, L, DHQK)
    kf = k.reshape(NG, G, NC, L, DHQK)
    vf = v.reshape(NG, G, NC, L, DHHV)
    ifl = i.reshape(NG, G, NC, L).transpose(0, 2, 1, 3)  # (NG, NC, G, L)
    ffl = f.reshape(NG, G, NC, L).transpose(0, 2, 1, 3)
    scaG = (
        jax.nn.log_sigmoid(f.astype(f32)).reshape(NG, G, NC, L).sum(-1)
        .transpose(0, 2, 1).reshape(NG, NC, 1, G)
    )

    h = pl.pallas_call(
        functools.partial(
            _fw_kernel_v2, G=G, L=L, DHQK=DHQK, DHHV=DHHV, NC=NC,
            qk_scale=qk_scale, eps=eps, dtype=compute_dtype,
        ),
        grid=(NG, NC),
        in_specs=[
            pl.BlockSpec((1, G, 1, L, DHQK), lambda bi, j: (bi, 0, j, 0, 0)),
            pl.BlockSpec((1, G, 1, L, DHQK), lambda bi, j: (bi, 0, j, 0, 0)),
            pl.BlockSpec((1, G, 1, L, DHHV), lambda bi, j: (bi, 0, j, 0, 0)),
            pl.BlockSpec((1, 1, G, L), lambda bi, j: (bi, j, 0, 0)),
            pl.BlockSpec((1, 1, G, L), lambda bi, j: (bi, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, G), lambda bi, j: (bi, j, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 1, L, DHHV), lambda bi, j: (bi, 0, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NG, G, NC, L, DHHV), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G * DHQK, DHHV), f32),
            pltpu.VMEM((G, DHQK), f32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, ifl, ffl, scaG)
    return h.reshape(B, NH, S, DHHV)
