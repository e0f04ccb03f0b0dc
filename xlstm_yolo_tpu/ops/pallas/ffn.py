"""Fused ViLLayer FFN backward: [RMSNorm -> gate/z dense -> silu*z -> down].

Companion to ops/pallas/epilogue.py (same custom-VJP shape): the FFN
branch (ref:ultralytics/nn/modules/vision_lstm/vision_lstm2.py:136-215
FeedForward + the pre-norm at :340) back-propagates through a chain of
silu/split/norm elementwise VJPs whose f32 intermediates XLA
materializes in HBM.  The forward stays plain jnp (numerics identical);
the backward is one Pallas kernel that re-reads x/gz/g once, recomputes
the cheap elementwise forward in VMEM, and runs the four unavoidable
GEMMs (dh, dWd, dxf, dWgz) back-to-back.

Residuals: x (B, S, D) and the fused up-projection gz (B, S, 2U) in
compute dtype — saving gz trades one HBM tensor for recomputing the
full up-GEMM in the backward.
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


def ffn_forward(x, wn, wgz, bgz, wd, bd, *, eps: float = 1e-6):
    """RMSNorm(x)*wn -> gz -> silu(gate)*z -> down.  Returns (out, gz).

    Math identical to RMSNorm(use_weight) + FeedForward(fused weights):
    norm in f32 cast back to x.dtype, denses in compute dtype.
    """
    cd = x.dtype
    xf = x.astype(f32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xn = ((xf * r) * wn).astype(cd)
    gz = jax.lax.dot_general(
        xn, wgz.astype(cd), (((2,), (0,)), ((), ()))) + bgz.astype(cd)
    U = gz.shape[-1] // 2
    gate, z = gz[..., :U], gz[..., U:]
    h = jax.nn.silu(gate) * z
    out = jax.lax.dot_general(
        h, wd.astype(cd), (((2,), (0,)), ((), ()))) + bd.astype(cd)
    return out, gz


def _bwd_kernel(x_ref, gz_ref, g_ref, wn_ref, wgz_ref, wd_ref,
                dx_ref, dwn_ref, dwgz_ref, dbgz_ref, dwd_ref, dbd_ref,
                dwgz_scr, dwd_scr, vec_scr,
                *, D: int, U: int, eps: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    first = (i == 0) & (j == 0)
    last = (i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1)
    cd = x_ref.dtype

    xf = x_ref[0].astype(f32)          # (BLK, D)
    gz = gz_ref[0]                     # (BLK, 2U) cd
    g = g_ref[0]                       # (BLK, D) cd
    wn = wn_ref[:].astype(f32)         # (1, D)

    # recompute norm + silu forward in VMEM
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xhat = xf * r
    xn = (xhat * wn).astype(cd)        # RMSNorm output (bf16-rounded)
    gate = gz[:, :U].astype(f32)
    z = gz[:, U:].astype(f32)
    sig = jax.nn.sigmoid(gate)
    sil = gate * sig
    h = ((sil.astype(cd)) * gz[:, U:])  # silu(gate)*z in compute dtype

    # down-projection backward
    dh = jax.lax.dot_general(g, wd_ref[:].astype(cd), (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)  # (BLK, U)
    dwd_blk = jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)  # (U, D)
    dbd_blk = jnp.sum(g.astype(f32), axis=0, keepdims=True)

    # silu-gate backward
    dz = dh * sil
    dgate = dh * z * (sig + sil * (1.0 - sig))

    # up-projection backward (two lane-halves; no concat — Mosaic
    # rejects concatenate on sliced operands)
    wgz_g = wgz_ref[:, :U].astype(cd)  # (D, U)
    wgz_z = wgz_ref[:, U:].astype(cd)
    dg_cd = dgate.astype(cd)
    dz_cd = dz.astype(cd)
    dxn = (jax.lax.dot_general(dg_cd, wgz_g, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
           + jax.lax.dot_general(dz_cd, wgz_z, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32))  # (BLK, D)
    dwgz_g = jax.lax.dot_general(xn, dg_cd, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)  # (D, U)
    dwgz_z = jax.lax.dot_general(xn, dz_cd, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)

    # RMSNorm backward
    dwn_blk = jnp.sum(dxn * xhat, axis=0, keepdims=True)  # (1, D)
    dxhat = dxn * wn
    dot = jnp.sum(dxhat * xf, axis=-1, keepdims=True)  # (BLK, 1)
    dx = dxhat * r - xf * (dot * (r ** 3) / D)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        dwgz_scr[:] = jnp.zeros_like(dwgz_scr)
        dwd_scr[:] = jnp.zeros_like(dwd_scr)
        vec_scr[:] = jnp.zeros_like(vec_scr)

    dwgz_scr[:, :U] += dwgz_g
    dwgz_scr[:, U:] += dwgz_z
    dwd_scr[:] += dwd_blk
    vec_scr[0:1, :D] += dwn_blk
    vec_scr[1:2, :D] += dbd_blk
    vec_scr[2:3, :U] += jnp.sum(dgate, axis=0, keepdims=True)
    vec_scr[3:4, :U] += jnp.sum(dz, axis=0, keepdims=True)

    @pl.when(last)
    def _():
        dwgz_ref[:] = dwgz_scr[:]
        dwd_ref[:] = dwd_scr[:]
        dwn_ref[:] = vec_scr[0:1, :D]
        dbd_ref[:] = vec_scr[1:2, :D]
        dbgz_ref[0:1, :U] = vec_scr[2:3, :U]
        dbgz_ref[0:1, U:] = vec_scr[3:4, :U]


def _pick_blk(S: int) -> int:
    for blk in range(min(256, S), 7, -1):
        if S % blk == 0 and blk % 8 == 0:
            return blk
    return 0


def _ffn_bwd_pallas(x, gz, g, wn, wgz, wd, *, eps: float):
    B, S, D = x.shape
    U = gz.shape[-1] // 2
    W = max(D, U)
    BLK = _pick_blk(S)
    assert BLK, f"no row block for S={S}"
    cd = x.dtype
    row3 = lambda i, j: (i, j, 0)  # noqa: E731
    fixed = lambda i, j: (0, 0)  # noqa: E731
    rowD = functools.partial  # readability no-op
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, D=D, U=U, eps=eps),
        grid=(B, S // BLK),
        in_specs=[
            pl.BlockSpec((1, BLK, D), row3),     # x
            pl.BlockSpec((1, BLK, 2 * U), row3),  # gz
            pl.BlockSpec((1, BLK, D), row3),     # g
            pl.BlockSpec((1, D), fixed),         # wn
            pl.BlockSpec((D, 2 * U), fixed),     # wgz
            pl.BlockSpec((U, D), fixed),         # wd
        ],
        out_specs=[
            pl.BlockSpec((1, BLK, D), row3),     # dx
            pl.BlockSpec((1, D), fixed),         # dwn
            pl.BlockSpec((D, 2 * U), fixed),     # dwgz
            pl.BlockSpec((1, 2 * U), fixed),     # dbgz
            pl.BlockSpec((U, D), fixed),         # dwd
            pl.BlockSpec((1, D), fixed),         # dbd
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D), cd),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, 2 * U), f32),
            jax.ShapeDtypeStruct((1, 2 * U), f32),
            jax.ShapeDtypeStruct((U, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, 2 * U), f32),
            pltpu.VMEM((U, D), f32),
            pltpu.VMEM((4, W), f32),
        ],
        interpret=_interpret(),
    )(x, gz, g.astype(cd), wn.reshape(1, D), wgz, wd)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ffn_fused(x, wn, wgz, bgz, wd, bd, eps):
    out, _ = ffn_forward(x, wn, wgz, bgz, wd, bd, eps=eps)
    return out


def _fused_fwd(x, wn, wgz, bgz, wd, bd, eps):
    out, gz = ffn_forward(x, wn, wgz, bgz, wd, bd, eps=eps)
    return out, (x, gz, wn, wgz, wd)


def _fused_bwd(eps, res, g):
    x, gz, wn, wgz, wd = res
    dx, dwn, dwgz, dbgz, dwd, dbd = _ffn_bwd_pallas(
        x, gz, g, wn, wgz, wd, eps=eps)
    return (dx, dwn.reshape(wn.shape), dwgz, dbgz.reshape(-1),
            dwd, dbd.reshape(-1))


ffn_fused.defvjp(_fused_fwd, _fused_bwd)
