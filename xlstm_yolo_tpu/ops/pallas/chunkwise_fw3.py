"""v3 chunkwise siging mLSTM FORWARD: in-kernel sub-chunking, head-interleaved.

Attacks the r4 negative result (docs/KERNEL_PLATEAU.md): the v2 forward
runs 2-3x above its MXU tile floor, with Mosaic's serial scheduling of
the per-head dependent matmul chains and the (L, L) f32 VMEM transients
as the named suspects.  v3 keeps v2's grid ((B, NH/G, NC), (B, S, H)
blocks, ragged-S masking, identical saved-state contract so the v2
backward drops in) but restructures the kernel body two ways:

1. **In-kernel sub-chunking.**  Each L-row chunk is processed as
   NB = L/Lb sub-chunks of Lb=128 rows, carrying the (DHQK, DHHV)
   C-state recurrence ACROSS sub-chunks inside one grid step.  The
   intra-chunk quadratic work drops from O(L^2) to O(L*Lb) MXU tiles
   (at L=640: the (5x5-tile) s and h_intra matmuls become 5 diagonal
   (1x1-tile) pairs plus 5 tiny state matmuls — ~3x fewer padded
   tiles), and the decay-matrix elementwise work shrinks from one
   (640, 640) to five (128, 128) transients.  Unlike shrinking the
   GRID chunk size (swept flat in r4: the ~28 us/grid-step pipeline
   floor dominates), sub-chunking keeps the grid at L=640.
2. **Head-interleaved software pipelining** (the r4 suggestion,
   VERDICT r4 item 1): the loop order is `for sb: for head:` — between
   a head's dependent sub-chunk chain and its next sub-chunk, G-1
   other heads' independent chains are issued, so Mosaic can overlap
   one head's VPU decay work with another's MXU matmuls.

Numerics: identical recurrence, identical stability envelope — every
exponent remains <= 0 (b_rel is a within-sub-chunk logsig cumsum,
a_rel = (total - b_rel) + logi, both non-positive), unlike operand-
factorized forms which would exponentiate +|b|.

Reference match: ref:mlstm_kernels/triton/chunkwise/xl_chunk_siging/
fw_kernel_parallel.py:14 (the Triton fw splits recurrent/parallel into
two kernels; on TPU the fused sequential grid + sub-chunked body is the
shape that fits Mosaic's pipeline model).
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlstm_yolo_tpu.ops.pallas.chunkwise import _interpret
from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import _cdiv, _exp_d, _row_mask

f32 = jnp.float32

# sub-chunk length (rows per in-kernel recurrence step); lane/sublane
# tile-aligned 128 by default, sweepable on-chip via env
FW3_LB = int(os.environ.get("XY_FW3_LB", "128"))


def _pack_gates_sub(i, f, NC: int, L: int, Lb: int):
    """(B, S, NH) gates -> per-SUB-chunk relative gate rows (XLA-side).

    Returns (b_rel, a_rel, logi) rows, each (B, NC, NH, L) f32, where
    within each Lb-row sub-chunk:

        b_rel[l] = cumsum_{t<=l} logsig(f)        (from sub-chunk start)
        a_rel[l] = (b_rel[Lb-1] - b_rel[l]) + logsig(i)
        gsub     = b_rel[Lb-1]                    (sub-chunk decay, log)

    plus gsub (B, NC, NB, NH) for the in-kernel state recurrence.
    Padding keeps padded steps inert (i -> -1e4, f -> 1e4), exactly as
    chunkwise_v2._pack_gates.
    """
    B, S, NH = i.shape
    NB = L // Lb
    pad = NC * L - S
    if pad:
        i = jnp.pad(i, ((0, 0), (0, pad), (0, 0)), constant_values=-1e4)
        f = jnp.pad(f, ((0, 0), (0, pad), (0, 0)), constant_values=1e4)
    ic = i.reshape(B, NC, NB, Lb, NH).astype(f32)
    fc = f.reshape(B, NC, NB, Lb, NH).astype(f32)
    logf = jax.nn.log_sigmoid(fc)
    logi = jax.nn.log_sigmoid(ic)
    b_rel = jnp.cumsum(logf, axis=3)
    total = b_rel[:, :, :, -1:, :]  # (B, NC, NB, 1, NH)
    a_rel = (total - b_rel) + logi
    rows = lambda x: x.reshape(B, NC, L, NH).transpose(0, 1, 3, 2)  # noqa: E731
    gsub = total.reshape(B, NC, NB, NH)
    return rows(b_rel), rows(a_rel), rows(logi), gsub


def _fw3_body(
    q_ref, k_ref, v_ref, b_ref, a_ref, li_ref, g_ref, c0_ref, n0_ref,
    h_ref, nout_ref, cstates_ref, nstates_ref, clast_ref, nlast_ref,
    c_scr, n_scr,
    *, G: int, L: int, Lb: int, S: int, DHQK: int, DHHV: int, NC: int,
    qk_scale: float, eps: float, use_initial: bool, save_states: bool,
    dtype: Any,
):
    j = pl.program_id(2)
    NB = L // Lb
    ragged = S % L != 0
    mask = _row_mask(j, L, S) if ragged else None  # (L, 1)

    @pl.when(j == 0)
    def _init():
        if use_initial:
            c_scr[...] = c0_ref[...].reshape(G * DHQK, DHHV).astype(f32)
            n_scr[...] = n0_ref[...].reshape(G, DHQK).astype(f32)
        else:
            c_scr[...] = jnp.zeros((G * DHQK, DHHV), f32)
            n_scr[...] = jnp.zeros((G, DHQK), f32)

    row = jax.lax.broadcasted_iota(jnp.int32, (Lb, Lb), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Lb, Lb), 1)
    causal = row >= col  # shared across sub-chunks + heads

    # sub-chunks outer, heads inner: head h's recurrent dependency chain
    # (C/n scratch read-modify-write) has G-1 independent heads' work
    # issued between consecutive links — software pipelining by program
    # order, letting the scheduler overlap VPU decay math with MXU dots.
    for sb in range(NB):
        r0 = sb * Lb
        qall = q_ref[0, r0:r0 + Lb, :]  # (Lb, G*DHQK)
        kall = k_ref[0, r0:r0 + Lb, :]
        vall = v_ref[0, r0:r0 + Lb, :]
        if ragged:
            msub = mask[r0:r0 + Lb]  # (Lb, 1)
            qall = jnp.where(msub, qall, 0)
            kall = jnp.where(msub, kall, 0)
            vall = jnp.where(msub, vall, 0)

        for h in range(G):
            q = qall[:, h * DHQK : (h + 1) * DHQK]
            k = kall[:, h * DHQK : (h + 1) * DHQK]
            v = vall[:, h * DHHV : (h + 1) * DHHV]
            b = b_ref[0, 0, h : h + 1, r0:r0 + Lb]   # (1, Lb) relative rows
            a = a_ref[0, 0, h : h + 1, r0:r0 + Lb]
            logi = li_ref[0, 0, h : h + 1, r0:r0 + Lb]
            gbar = jnp.exp(g_ref[0, 0, sb, h])

            C_prev = c_scr[h * DHQK : (h + 1) * DHQK, :]
            n_prev = n_scr[h : h + 1, :]

            if save_states and sb == 0:
                # chunk-START state: identical contract to the v2 fw, so
                # the v2 fused backward consumes v3 states unchanged
                cstates_ref[0, 0, h] = C_prev
                nstates_ref[0, 0, h : h + 1, :] = n_prev

            s = jax.lax.dot_general(
                q.astype(dtype), k.astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) * qk_scale
            sd = jnp.where(causal, s * _exp_d(b.T - b + logi), 0.0)

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

            den = jnp.maximum(jnp.abs(n_inter + n_intra), 1.0)  # (Lb, 1)
            hval = (h_inter + h_intra) / (den + eps)
            h_ref[0, r0:r0 + Lb, h * DHHV : (h + 1) * DHHV] = hval.astype(
                h_ref.dtype)
            if save_states:
                nout_ref[0, 0, h : h + 1, r0:r0 + Lb] = den.T

            kbar = k.astype(f32) * jnp.exp(a.T)
            dC = jax.lax.dot_general(
                kbar.astype(dtype), v.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            C_new = gbar * C_prev + dC
            n_new = gbar * n_prev + jnp.sum(kbar, axis=0, keepdims=True)
            c_scr[h * DHQK : (h + 1) * DHQK, :] = C_new
            n_scr[h : h + 1, :] = n_new

            if sb == NB - 1:
                @pl.when(j == NC - 1)
                def _final():
                    clast_ref[0, h] = C_new
                    nlast_ref[0, h : h + 1, :] = n_new


def _fw3_kernel_train(q, k, v, b, a, li, g, c0, n0,
                      h, nout, cst, nst, clast, nlast, c_scr, n_scr, **kw):
    _fw3_body(q, k, v, b, a, li, g, c0, n0,
              h, nout, cst, nst, clast, nlast, c_scr, n_scr,
              save_states=True, **kw)


def _fw3_kernel_infer(q, k, v, b, a, li, g, c0, n0,
                      h, clast, nlast, c_scr, n_scr, **kw):
    _fw3_body(q, k, v, b, a, li, g, c0, n0,
              h, None, None, None, clast, nlast, c_scr, n_scr,
              save_states=False, **kw)


def fw3(
    q, k, v, i, f, num_heads: int, c_initial=None, n_initial=None,
    chunk_size: int = 640, head_group: int = 0, sub_chunk: int | None = None,
    qk_scale: float | None = None, eps: float = 1e-6,
    compute_dtype=jnp.bfloat16, save_states: bool = True,
):
    """Drop-in replacement for chunkwise_v2._fw (same outputs/states).

    q/k (B, S, NH*DHQK); v (B, S, NH*DHHV); i/f (B, S, NH).
    Returns (h, n_out, cstates, c_last, n_last) — nstates is internal to
    the pallas_call exactly as in v2.
    """
    B, S, Hqk = q.shape
    NH = num_heads
    DHQK = Hqk // NH
    DHHV = v.shape[-1] // NH
    L = chunk_size
    Lb = sub_chunk or FW3_LB
    if L % Lb:
        Lb = L  # degenerate: one sub-chunk == v2 body
    NC = _cdiv(S, L)
    G = head_group or NH
    assert NH % G == 0, f"NH={NH} % G={G}"
    HG = NH // G
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    use_initial = c_initial is not None

    brow, arow, lirow, gsub = _pack_gates_sub(i, f, NC, L, Lb)
    c0 = (c_initial.astype(f32) if use_initial
          else jnp.zeros((1, NH, DHQK, DHHV), f32))
    n0 = (n_initial.astype(f32) if use_initial
          else jnp.zeros((1, NH, DHQK), f32))

    NB = L // Lb
    qkcols = lambda b_, hg, j: (b_, j, hg)  # noqa: E731
    rowm = lambda b_, hg, j: (b_, j, hg, 0)  # noqa: E731
    smem = lambda b_, hg, j: (b_, j, 0, hg)  # noqa: E731
    st = ((lambda b_, hg, j: (b_, hg, 0, 0)) if use_initial
          else (lambda b_, hg, j: (0, hg, 0, 0)))
    st3 = ((lambda b_, hg, j: (b_, hg, 0)) if use_initial
           else (lambda b_, hg, j: (0, hg, 0)))
    in_specs = [
        pl.BlockSpec((1, L, G * DHQK), qkcols),
        pl.BlockSpec((1, L, G * DHQK), qkcols),
        pl.BlockSpec((1, L, G * DHHV), qkcols),
        pl.BlockSpec((1, 1, G, L), rowm),  # b_rel rows
        pl.BlockSpec((1, 1, G, L), rowm),  # a_rel rows
        pl.BlockSpec((1, 1, G, L), rowm),  # logi rows
        pl.BlockSpec((1, 1, NB, G), smem, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, G, DHQK, DHHV), st),
        pl.BlockSpec((1, G, DHQK), st3),
    ]
    kw = dict(
        G=G, L=L, Lb=Lb, S=S, DHQK=DHQK, DHHV=DHHV, NC=NC,
        qk_scale=qk_scale, eps=eps, use_initial=use_initial,
        dtype=compute_dtype,
    )
    last = lambda b_, hg, j: (b_, hg, 0, 0)  # noqa: E731
    last3 = lambda b_, hg, j: (b_, hg, 0)  # noqa: E731
    st5 = lambda b_, hg, j: (b_, j, hg, 0, 0)  # noqa: E731
    st4 = lambda b_, hg, j: (b_, j, hg, 0)  # noqa: E731
    scratch = [
        pltpu.VMEM((G * DHQK, DHHV), f32),
        pltpu.VMEM((G, DHQK), f32),
    ]
    grid = (B, HG, NC)

    if save_states:
        out = pl.pallas_call(
            functools.partial(_fw3_kernel_train, **kw),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, L, G * DHHV), qkcols),
                pl.BlockSpec((1, 1, G, L), rowm),
                pl.BlockSpec((1, 1, G, DHQK, DHHV), st5),
                pl.BlockSpec((1, 1, G, DHQK), st4),
                pl.BlockSpec((1, G, DHQK, DHHV), last),
                pl.BlockSpec((1, G, DHQK), last3),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, S, NH * DHHV), q.dtype),
                jax.ShapeDtypeStruct((B, NC, NH, L), f32),
                jax.ShapeDtypeStruct((B, NC, NH, DHQK, DHHV), f32),
                jax.ShapeDtypeStruct((B, NC, NH, DHQK), f32),
                jax.ShapeDtypeStruct((B, NH, DHQK, DHHV), f32),
                jax.ShapeDtypeStruct((B, NH, DHQK), f32),
            ],
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(q, k, v, brow, arow, lirow, gsub, c0, n0)
        h, n_out, cs, ns, c_last, n_last = out
        return h, n_out, cs, c_last, n_last

    out = pl.pallas_call(
        functools.partial(_fw3_kernel_infer, **kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, L, G * DHHV), qkcols),
            pl.BlockSpec((1, G, DHQK, DHHV), last),
            pl.BlockSpec((1, G, DHQK), last3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, NH * DHHV), q.dtype),
            jax.ShapeDtypeStruct((B, NH, DHQK, DHHV), f32),
            jax.ShapeDtypeStruct((B, NH, DHQK), f32),
        ],
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(q, k, v, brow, arow, lirow, gsub, c0, n0)
    h, c_last, n_last = out
    return h, None, None, c_last, n_last
