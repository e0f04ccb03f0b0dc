"""Pallas TPU kernel: fused sLSTM sequence scan.

TPU counterpart of the reference's sLSTM CUDA extension — the fused
pointwise recurrence + batched recurrent GEMM
(ref:ultralytics/nn/modules/vision_lstm/xlstm/blocks/slstm/src/cuda/slstm_forward.cu,
slstm_pointwise.cu, util/blas.cu).  The time step is a sequential TPU
grid dimension: the (h, c, n, m) state lives in VMEM scratch that
persists across grid steps, each step does one (1, D) x (D, D)
block-diagonal recurrent matmul per gate on the MXU plus the exp-gated
pointwise update on the VPU — the same work the CUDA kernel splits
across cuBLAS + a pointwise kernel, here fused so gates/states never
touch HBM.

Mosaic constraints shape the layout (docs/KNOWN_ISSUES.md): no in-kernel
reshapes that split the lane dimension, no dynamic row stores — so heads
stay flattened to D = NH*DH lanes throughout and the per-head (DH, DH)
recurrent weights are embedded in a block-diagonal (D, D) matrix on the
host (the off-block zeros are free at these sizes; head-splitting
layouts fail to compile on real TPU hardware).

Math matches nn.xlstm.sLSTMCell's lax.scan exactly:
    z = tanh(x_z + R_z h);  i~ = x_i + R_i h;  f~ = x_f + R_f h
    o = sigmoid(x_o + R_o h)
    m' = max(f~ + m, i~);  ig = e^{i~-m'};  fg = e^{f~+m-m'}
    c' = fg c + ig z;  n' = fg n + ig;  h' = o c' / max(n', 1e-6)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlstm_yolo_tpu.ops.pallas.chunkwise import _interpret

f32 = jnp.float32


def _kernel(
    wx_ref, r_ref, h0_ref, c0_ref, n0_ref, m0_ref,
    hs_ref, hl_ref, cl_ref, nl_ref, ml_ref,
    h_scr, c_scr, n_scr, m_scr,
    *, S: int,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[...] = h0_ref[0].astype(f32)  # (1, D)
        c_scr[...] = c0_ref[0].astype(f32)
        n_scr[...] = n0_ref[0].astype(f32)
        m_scr[...] = m0_ref[0].astype(f32)

    R = r_ref[...]  # (4, D, D) f32, block-diagonal per head
    h = h_scr[...]  # (1, D)
    xt = wx_ref[0, 0]  # (4, D)

    def rec(g):  # (1, D) x (D, D) on the MXU
        return jax.lax.dot_general(
            h, R[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    z = jnp.tanh(xt[0:1].astype(f32) + rec(0))
    it = xt[1:2].astype(f32) + rec(1)
    ft = xt[2:3].astype(f32) + rec(2)
    o = jax.nn.sigmoid(xt[3:4].astype(f32) + rec(3))
    m = m_scr[...]
    m_new = jnp.maximum(ft + m, it)
    ig = jnp.exp(it - m_new)
    fg = jnp.exp(ft + m - m_new)
    c_new = fg * c_scr[...] + ig * z
    n_new = fg * n_scr[...] + ig
    h_new = o * c_new / jnp.maximum(n_new, 1e-6)
    h_scr[...] = h_new
    c_scr[...] = c_new
    n_scr[...] = n_new
    m_scr[...] = m_new
    hs_ref[0, 0] = h_new.astype(hs_ref.dtype)
    # final-state blocks map to the same (b,) slot every step; the
    # s = S-1 write is the one that lands (sequential grid)
    hl_ref[0] = h_new
    cl_ref[0] = c_new
    nl_ref[0] = n_new
    ml_ref[0] = m_new


def slstm_sequence_pallas(wx, R, state=None):
    """Fused sLSTM scan.

    wx:    (B, S, 4, NH, DH) gate preactivations (the Wx + b part)
    R:     (4, NH, DH, DH) recurrent weights
    state: optional (h, c, n, m), each (B, NH, DH)
    returns (hs (B, S, NH*DH), (h, c, n, m))
    """
    B, S, four, NH, DH = wx.shape
    assert four == 4
    D = NH * DH
    if state is None:
        z = jnp.zeros((B, NH, DH), f32)
        state = (z, z, z, z)

    wxf = wx.reshape(B, S, 4, D).astype(f32)
    # embed the per-head recurrent weights block-diagonally so the kernel
    # works in the flat D-lane layout end to end
    Rf = R.astype(f32)  # (4, NH, DH, DH)
    R_bd = jax.vmap(
        lambda Rg: jax.scipy.linalg.block_diag(*[Rg[hh] for hh in range(NH)])
    )(Rf)  # (4, D, D)
    flat = [s.reshape(B, 1, D).astype(f32) for s in state]

    st2 = lambda b, t: (b, 0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, S=S),
        grid=(B, S),
        in_specs=[
            pl.BlockSpec((1, 1, 4, D), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((4, D, D), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((1, 1, D), st2),
            pl.BlockSpec((1, 1, D), st2),
            pl.BlockSpec((1, 1, D), st2),
            pl.BlockSpec((1, 1, D), st2),
        ],
        out_specs=[
            # 4D-singleton block: Mosaic requires the last-two block dims
            # to divide (8, 128) or equal the array dims — (1, D) over a
            # (B, S, 1, D) array satisfies that where (1, D) over
            # (B, S, D) would not (block row 1 vs array S)
            pl.BlockSpec((1, 1, 1, D), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, D), st2),
            pl.BlockSpec((1, 1, D), st2),
            pl.BlockSpec((1, 1, D), st2),
            pl.BlockSpec((1, 1, D), st2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, 1, D), wx.dtype),
            jax.ShapeDtypeStruct((B, 1, D), f32),
            jax.ShapeDtypeStruct((B, 1, D), f32),
            jax.ShapeDtypeStruct((B, 1, D), f32),
            jax.ShapeDtypeStruct((B, 1, D), f32),
        ],
        scratch_shapes=[pltpu.VMEM((1, D), f32)] * 4,
        interpret=_interpret(),
    )(wxf, R_bd, *flat)
    hs, hl, cl, nl, ml = out
    last = tuple(s.reshape(B, NH, DH) for s in (hl, cl, nl, ml))
    return hs.reshape(B, S, D), last
