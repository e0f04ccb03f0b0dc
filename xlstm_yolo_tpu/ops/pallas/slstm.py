"""Pallas TPU kernel: fused sLSTM sequence scan.

TPU counterpart of the reference's sLSTM CUDA extension — the fused
pointwise recurrence + batched recurrent GEMM
(ref:ultralytics/nn/modules/vision_lstm/xlstm/blocks/slstm/src/cuda/slstm_forward.cu,
slstm_pointwise.cu, util/blas.cu).  One kernel per batch element holds
the (h, c, n, m) state in VMEM and walks the sequence with an in-kernel
fori_loop: per step, 4 x NH per-head (1, DH) x (DH, DH) recurrent
matmuls on the MXU plus the exp-gated pointwise update on the VPU —
the same work the CUDA kernel splits across cuBLAS + a pointwise
kernel, here fused so gates/states never touch HBM.

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
    *, S: int, NH: int, DH: int,
):
    h_scr[...] = h0_ref[0].astype(f32)
    c_scr[...] = c0_ref[0].astype(f32)
    n_scr[...] = n0_ref[0].astype(f32)
    m_scr[...] = m0_ref[0].astype(f32)
    R = r_ref[...]  # (4, NH, DH, DH) f32

    def body(t, _):
        h = h_scr[...]  # (NH, DH)
        xt = wx_ref[0, t]  # (4, NH*DH)
        rh = []
        for g in range(4):
            per_head = []
            for hh in range(NH):
                per_head.append(jax.lax.dot_general(
                    h[hh : hh + 1, :], R[g, hh],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ))  # (1, DH)
            rh.append(jnp.concatenate(per_head, axis=0))  # (NH, DH)
        xg = xt.reshape(4, NH, DH).astype(f32)
        z = jnp.tanh(xg[0] + rh[0])
        it = xg[1] + rh[1]
        ft = xg[2] + rh[2]
        o = jax.nn.sigmoid(xg[3] + rh[3])
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
        hs_ref[0, t] = h_new.reshape(1, NH * DH).astype(hs_ref.dtype)[0]
        return 0

    jax.lax.fori_loop(0, S, body, 0)
    hl_ref[0] = h_scr[...]
    cl_ref[0] = c_scr[...]
    nl_ref[0] = n_scr[...]
    ml_ref[0] = m_scr[...]


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
    h0, c0, n0, m0 = state

    wxf = wx.reshape(B, S, 4, D).astype(f32)
    st = lambda b: (b, 0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, S=S, NH=NH, DH=DH),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, 4, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((4, NH, DH, DH), lambda b: (0, 0, 0, 0)),
            pl.BlockSpec((1, NH, DH), st),
            pl.BlockSpec((1, NH, DH), st),
            pl.BlockSpec((1, NH, DH), st),
            pl.BlockSpec((1, NH, DH), st),
        ],
        out_specs=[
            pl.BlockSpec((1, S, D), st),
            pl.BlockSpec((1, NH, DH), st),
            pl.BlockSpec((1, NH, DH), st),
            pl.BlockSpec((1, NH, DH), st),
            pl.BlockSpec((1, NH, DH), st),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D), wx.dtype),
            jax.ShapeDtypeStruct((B, NH, DH), f32),
            jax.ShapeDtypeStruct((B, NH, DH), f32),
            jax.ShapeDtypeStruct((B, NH, DH), f32),
            jax.ShapeDtypeStruct((B, NH, DH), f32),
        ],
        scratch_shapes=[pltpu.VMEM((NH, DH), f32)] * 4,
        interpret=_interpret(),
    )(wxf, R.astype(f32), h0, c0, n0, m0)
    hs, hl, cl, nl, ml = out
    return hs, (hl, cl, nl, ml)
