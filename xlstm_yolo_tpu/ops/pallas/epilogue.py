"""Fused ViLLayer epilogue backward: [MultiHeadLayerNorm -> +skip*x -> proj_down].

The mlstm-branch epilogue (per-head out-norm, learnable-skip add, down
projection — ref:ultralytics/nn/modules/vision_lstm/vision_lstm2.py:292-327)
is FLOP-trivial but its XLA backward costs ~2.8 ms per S=6400
layer-direction at the flagship train shape (exp_layer_bwd r4: outnorm
+1.03 ms, skip+proj_down +1.78 ms): the VJP chain materializes several
(B, S, 2*dim) f32 intermediates in HBM.  This module keeps the FORWARD
in plain jnp (numerics identical to the unfused path, golden tests
unaffected) and replaces only the backward with one Pallas kernel that
streams h / x / g once and keeps every intermediate in VMEM.

Per-head group statistics are computed as block-diagonal matmuls (the
codebase's standard trick for sub-128-lane reductions — a DH-wide mean
is a (H, H) block-diag averaging matmul on the MXU, not a 32-lane VPU
reduction Mosaic handles poorly).

Used by nn/layers.ViLLayer via the XY_EPI_FUSE selector (measured
on-chip before defaulting; scripts/exp_epilogue.py).
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


def _group_avg_mat(H: int, DH: int) -> jax.Array:
    """(H, H) block-diagonal averaging matrix: y = x @ M gives each lane
    the mean of its DH-lane group — per-head LN statistics as one MXU
    matmul instead of a 32-lane VPU reduction."""
    r = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0) // DH
    c = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1) // DH
    return jnp.where(r == c, 1.0 / DH, 0.0).astype(f32)


def epilogue_forward(h, x, ln_w, ln_b, skip, wd, bd, *, num_heads: int,
                     eps: float = 1e-6):
    """Reference forward (plain jnp) — numerics identical to
    MultiHeadLayerNorm(BSND) -> h + skip*x -> Dense(proj_down).

    h, x: (B, S, H) compute dtype (bf16 in the train path).
    ln_w/ln_b/skip: (H,) f32 (ln scale parameterizes as 1 + ln_w).
    wd: (H, D) f32 param; bd: (D,) f32.
    """
    B, S, H = h.shape
    DH = H // num_heads
    cd = h.dtype
    hf = h.astype(f32).reshape(B, S, num_heads, DH)
    mean = hf.mean(-1, keepdims=True)
    var = hf.var(-1, keepdims=True)
    y = (hf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, S, H) * (1.0 + ln_w) + ln_b
    z = y.astype(cd) + skip.astype(cd) * x
    out = jax.lax.dot_general(
        z, wd.astype(cd), dimension_numbers=(((2,), (0,)), ((), ())))
    return out + bd.astype(cd)


def _bwd_kernel(h_ref, x_ref, g_ref, lnw_ref, lnb_ref, skip_ref, wd_ref,
                dh_ref, dx_ref, dlnw_ref, dlnb_ref, dskip_ref, dwd_ref,
                dbd_ref, dwd_scr, acc_scr, dbd_scr,
                *, H: int, D: int, DH: int, eps: float):
    """One (BLK, H) row-block of the fused epilogue backward.

    Sequential grid (B, S/BLK); parameter grads accumulate in VMEM
    scratch and flush on the last step.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    first = (i == 0) & (j == 0)
    last = (i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1)

    M = _group_avg_mat(H, DH)  # cheap VPU construction per step
    hf = h_ref[0].astype(f32)  # (BLK, H)
    xf = x_ref[0].astype(f32)
    g = g_ref[0]               # (BLK, D) compute dtype
    lnw = lnw_ref[:].astype(f32)   # (1, H)
    lnb = lnb_ref[:].astype(f32)
    skip = skip_ref[:].astype(f32)

    # recompute per-head LN stats (block-diag matmuls; biased var).
    # Variance MUST be the centered form E[(x-m)^2]: the raw-moment
    # E[x^2]-E[x]^2 cancels catastrophically for large-mean h and goes
    # NEGATIVE in f32 -> rsqrt = NaN (hit by real training, where the
    # mLSTM output means grow — r5 e2e run).
    m = jax.lax.dot_general(hf, M, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    ctr = hf - m
    var = jax.lax.dot_general(ctr * ctr, M, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    rstd = jax.lax.rsqrt(var + eps)
    hhat = ctr * rstd

    # recompute z in compute dtype (the true VJP of the cast chain uses
    # the bf16-rounded z for dWd)
    cd = h_ref.dtype
    y = hhat * (1.0 + lnw) + lnb
    z = y.astype(cd) + (skip.astype(cd) * x_ref[0])

    # proj_down backward
    gf = g.astype(f32)
    dz = jax.lax.dot_general(  # g @ Wd^T: contract D with D
        g, wd_ref[:].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=f32)  # (BLK, H)
    dwd_blk = jax.lax.dot_general(  # z^T @ g: contract rows
        z, g, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)  # (H, D)
    dbd_blk = jnp.sum(gf, axis=0, keepdims=True)  # (1, D)

    # skip-add backward
    dskip_blk = jnp.sum(dz * xf, axis=0, keepdims=True)  # (1, H)
    dx_ref[0] = (dz * skip).astype(dx_ref.dtype)

    # LN backward (per-head group means via the same block-diag matmul)
    dlnw_blk = jnp.sum(dz * hhat, axis=0, keepdims=True)
    dlnb_blk = jnp.sum(dz, axis=0, keepdims=True)
    dhhat = dz * (1.0 + lnw)
    mean_dh = jax.lax.dot_general(dhhat, M, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
    mean_dhh = jax.lax.dot_general(dhhat * hhat, M, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)
    dh_ref[0] = (rstd * (dhhat - mean_dh - hhat * mean_dhh)).astype(dh_ref.dtype)

    # parameter-grad accumulation across the sequential grid
    @pl.when(first)
    def _():
        dwd_scr[:] = jnp.zeros_like(dwd_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        dbd_scr[:] = jnp.zeros_like(dbd_scr)

    dwd_scr[:] += dwd_blk
    acc_scr[0:1] += dlnw_blk
    acc_scr[1:2] += dlnb_blk
    acc_scr[2:3] += dskip_blk
    dbd_scr[:] += dbd_blk

    @pl.when(last)
    def _():
        dwd_ref[:] = dwd_scr[:]
        dlnw_ref[:] = acc_scr[0:1]
        dlnb_ref[:] = acc_scr[1:2]
        dskip_ref[:] = acc_scr[2:3]
        dbd_ref[:] = dbd_scr[:]


def _pick_blk(S: int) -> int:
    """Largest row-block <= 512 that divides S and is a multiple of 8."""
    for blk in range(min(512, S), 7, -1):
        if S % blk == 0 and blk % 8 == 0:
            return blk
    return 0


def _epilogue_bwd_pallas(h, x, g, ln_w, ln_b, skip, wd, *, num_heads: int,
                         eps: float):
    B, S, H = h.shape
    D = wd.shape[1]
    DH = H // num_heads
    BLK = _pick_blk(S)
    assert BLK, f"no row block for S={S}"
    cd = h.dtype

    row = lambda i, j: (i, j, 0)  # noqa: E731
    fixed = lambda i, j: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, D=D, DH=DH, eps=eps),
        grid=(B, S // BLK),
        in_specs=[
            pl.BlockSpec((1, BLK, H), row),       # h
            pl.BlockSpec((1, BLK, H), row),       # x
            pl.BlockSpec((1, BLK, D), row),       # g
            pl.BlockSpec((1, H), fixed),          # ln_w
            pl.BlockSpec((1, H), fixed),          # ln_b
            pl.BlockSpec((1, H), fixed),          # skip
            pl.BlockSpec((H, D), fixed),          # wd
        ],
        out_specs=[
            pl.BlockSpec((1, BLK, H), row),       # dh
            pl.BlockSpec((1, BLK, H), row),       # dx
            pl.BlockSpec((1, H), fixed),          # dln_w
            pl.BlockSpec((1, H), fixed),          # dln_b
            pl.BlockSpec((1, H), fixed),          # dskip
            pl.BlockSpec((H, D), fixed),          # dwd
            pl.BlockSpec((1, D), fixed),          # dbd
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, H), cd),
            jax.ShapeDtypeStruct((B, S, H), cd),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((H, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, D), f32),
            pltpu.VMEM((3, H), f32),
            pltpu.VMEM((1, D), f32),
        ],
        interpret=_interpret(),
    )(h, x, g.astype(cd), ln_w.reshape(1, H), ln_b.reshape(1, H),
      skip.reshape(1, H), wd)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def epilogue_fused(h, x, ln_w, ln_b, skip, wd, bd, num_heads, eps):
    return epilogue_forward(h, x, ln_w, ln_b, skip, wd, bd,
                            num_heads=num_heads, eps=eps)


def _fused_fwd(h, x, ln_w, ln_b, skip, wd, bd, num_heads, eps):
    out = epilogue_forward(h, x, ln_w, ln_b, skip, wd, bd,
                           num_heads=num_heads, eps=eps)
    return out, (h, x, ln_w, ln_b, skip, wd)


def _fused_bwd(num_heads, eps, res, g):
    h, x, ln_w, ln_b, skip, wd = res
    dh, dx, dlnw, dlnb, dskip, dwd, dbd = _epilogue_bwd_pallas(
        h, x, g, ln_w, ln_b, skip, wd, num_heads=num_heads, eps=eps)
    return (dh, dx, dlnw.reshape(ln_w.shape), dlnb.reshape(ln_b.shape),
            dskip.reshape(skip.shape), dwd, dbd.reshape(-1))


epilogue_fused.defvjp(_fused_fwd, _fused_bwd)
