"""Pallas v2 chunkwise siging mLSTM: (B, S, H) layout, head groups, fw+bw.

TPU-native counterpart of the six reference Triton kernels
(ref:mlstm_kernels/triton/chunkwise/xl_chunk_siging/*.py); the gate math
derivation lives in `chunkwise.py` (v1).  v2 differs from v1 in the ways
that matter at model scale:

- **(B, S, H) blocks, heads as lane slices.**  v1 (and the first v2
  draft) wanted (B*NH, S, DH) operands, which forces XLA to materialize
  the head-split transpose before every pallas_call (~3x41 MB per call
  at flagship shapes — the scan path fuses those away, so Pallas lost
  in-model while winning standalone).  Here q/k/v/h/dq/dk/dv keep the
  model's native (B, S, H) layout — a free reshape — and each head is a
  static H-column slice inside the kernel.  Bonus: H-wide blocks fill
  the 128-lane VPU/MXU width that DH=32-wide blocks wasted.
- **Head-group batching**: grid (B, NH/G, NC) with a static in-kernel
  loop over G heads per step — 13x fewer sequential grid steps than
  v1's (B*NH, NC) at flagship batch 8.
- **Ragged S in-kernel**: grid NC = cdiv(S, L); the last chunk's
  out-of-bounds rows are masked in-kernel (OOB loads are unspecified,
  so loaded tiles are zero-masked), replacing the zero-pad wrapper's
  HBM round-trips.
- **Lean inference forward**: Pallas outputs are not DCE-able, so the
  custom-VJP primal runs a separate kernel without the backward-only
  chunk-state outputs.
- **Fused single-pass backward**: the reverse dC scan is carried in a
  VMEM scratch accumulator while dQ/dK/dV are emitted per chunk — one
  grid pass instead of two, and the (B, NC, NH, DHQK, DHHV) dc_states
  HBM round-trip disappears.  Measured on v5e at the flagship train
  shape (B8 S6400 NH12 DH32 cs640): fwd+bwd 17.2 -> 12.1 ms (1.42x).
  A transposed-output variant (env XY_V2_BW=col: (DH, L) grads, full
  MXU lane width, one XLA transpose outside) measured equal within
  noise (mean 12.4 vs 12.2 over 4 interleaved runs) but with 3x the
  run-to-run variance; "row" stays the default.

Per-head rows (gates, normalizers) are laid out (B, NC, NH, L); the
tiny gate tensors are padded host-side with inert values.
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

f32 = jnp.float32

# backward output orientation: "row" = (L, DH) chunk outputs (original),
# "col" = transposed (DH, L) outputs keeping the MXU lane dim L-wide
# (see _bw_fused_kernel_t).  A/B-able per process via env XY_V2_BW.
BW_VARIANT = os.environ.get("XY_V2_BW", "row")

# Backward launch configuration.  The bw grid (B, NH/G, NC) runs ~28 us
# of fixed pipeline overhead per grid step (KNOWN_ISSUES calibration),
# and at the flagship train shape (B8 NH12 DH32 S6400 cs640) the default
# G=4 grid is 240 steps — the floor alone (~6.7 ms) dominates the ~7.6 ms
# kernel.  Two knobs cut the step count; both are read at TRACE time
# (mutate between jit builds, or set the envs before import):
#   g       head-group per step (0 = auto-fit VMEM budget)
#   cc      chunks per grid step (0/1 = one; needs S % L == 0, NC % cc == 0)
#   vmem_mb Mosaic scoped-VMEM limit override (0 = default 16 MB); v5e has
#           128 MB physical, so wider G / larger cc can buy step-count
#           reduction with an explicit raise.
#   fuse_gates  also emit the gate-grad row reductions sum_dh(q*dq) and
#           sum_dh(k*dk) from the kernel (they feed di/df), replacing the
#           XLA epilogue's full re-read of q/k/dq/dv from HBM with two
#           (B, NC, NH, L) rows.
BW_CFG = {
    "g": int(os.environ.get("XY_V2_BW_G", "0")),
    "cc": int(os.environ.get("XY_V2_BW_CC", "0")),
    "vmem_mb": int(os.environ.get("XY_V2_BW_VMEM", "0")),
    "fuse_gates": int(os.environ.get("XY_V2_BW_FUSEG", "0")),
}

# D-matrix transcendental mode (fw + bw kernels).  The decay matrix
# D = exp(b^T - b + logi) evaluates an (L, L) exp per head-chunk —
# ~400M VPU transcendentals per flagship S6400 call, a candidate for
# the dominant kernel cost (launch-config sweeps measure FLAT, which
# rules out the MXU/pipeline knobs).  Modes:
#   exp    jnp.exp (default, reference math)
#   exp2   jnp.exp2 of log2(e)-scaled exponent (the Triton kernels'
#          fast path on GPU; A/B whether Mosaic's exp2 is cheaper)
#   probe  REPLACES exp with a multiply — numerically WRONG, timing
#          probe only (quantifies the transcendental share)
D_MODE = os.environ.get("XY_V2_DMODE", "exp")
_LOG2E = 1.4426950408889634

if D_MODE == "probe":  # loud guard: a stale env var would corrupt training
    import warnings

    warnings.warn(
        "XY_V2_DMODE=probe replaces exp with a multiply — the mLSTM "
        "decay math is WRONG in this mode.  Timing probes only; unset "
        "the env var before any training or parity run.",
        stacklevel=2,
    )


def _exp_d(arg):
    """exp(arg) under the selected D_MODE (see above)."""
    if D_MODE == "exp2":
        return jnp.exp2(arg * _LOG2E)
    if D_MODE == "probe":
        return 1.0 + arg * 1e-9  # keeps the operand chain alive, no exp
    return jnp.exp(arg)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _row_mask(j, L: int, S: int):
    """(L, 1) bool: global row j*L+l < S.  j may be traced (program id)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    return (j * L + rows) < S


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fw_body(
    q_ref, k_ref, v_ref, b_ref, a_ref, li_ref, g_ref, c0_ref, n0_ref,
    h_ref, nout_ref, cstates_ref, nstates_ref, clast_ref, nlast_ref,
    c_scr, n_scr,
    *, G: int, L: int, S: int, DHQK: int, DHHV: int, NC: int,
    qk_scale: float, eps: float, use_initial: bool, save_states: bool,
    dtype: Any, BP: int = 1, lnw_ref=None, lnb_ref=None, ln_eps: float = 1e-6,
):
    j = pl.program_id(2)
    ragged = S % L != 0
    mask = _row_mask(j, L, S) if ragged else None  # (L, 1)

    @pl.when(j == 0)
    def _init():
        if use_initial:
            c_scr[...] = c0_ref[...].reshape(BP * G * DHQK, DHHV).astype(f32)
            n_scr[...] = n0_ref[...].reshape(BP * G, DHQK).astype(f32)
        else:
            c_scr[...] = jnp.zeros((BP * G * DHQK, DHHV), f32)
            n_scr[...] = jnp.zeros((BP * G, DHQK), f32)

    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    causal = row >= col  # hoisted: shared across heads + batch items

    # BP batch items per grid step: the per-step pipeline overhead (~28 us
    # fixed floor measured on v5e, independent of block size) amortizes over
    # BP * G head-chunks instead of G.  Scratch state is (bi, h)-sliced.
    for bi in range(BP):
        qall = q_ref[bi]  # (L, G*DHQK)
        kall = k_ref[bi]
        vall = v_ref[bi]
        if ragged:
            # OOB loads are unspecified (can be NaN/Inf) — zero-mask before use
            qall = jnp.where(mask, qall, 0)
            kall = jnp.where(mask, kall, 0)
            vall = jnp.where(mask, vall, 0)

        for h in range(G):  # static unroll; heads are H-column slices
            hh = bi * G + h  # scratch row group
            q = qall[:, h * DHQK : (h + 1) * DHQK]
            k = kall[:, h * DHQK : (h + 1) * DHQK]
            v = vall[:, h * DHHV : (h + 1) * DHHV]
            b = b_ref[bi, 0, h : h + 1, :]  # (1, L) rows, XLA-precomputed
            a = a_ref[bi, 0, h : h + 1, :]
            logi = li_ref[bi, 0, h : h + 1, :]
            gbar = jnp.exp(g_ref[bi, 0, 0, h])

            C_prev = c_scr[hh * DHQK : (hh + 1) * DHQK, :]
            n_prev = n_scr[hh : hh + 1, :]

            if save_states:
                cstates_ref[bi, 0, h] = C_prev
                nstates_ref[bi, 0, h : h + 1, :] = n_prev

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

            den = jnp.maximum(jnp.abs(n_inter + n_intra), 1.0)  # (L, 1)
            hval = (h_inter + h_intra) / (den + eps)  # (L, DHHV) f32
            if lnw_ref is not None:
                # fused MultiHeadLayerNorm epilogue (inference path): per-token
                # per-head stats over DHHV, scale = (1 + w) pre-applied by the
                # caller; saves the separate f32 norm pass over (B, S, H)
                mu = jnp.mean(hval, axis=1, keepdims=True)
                var = jnp.mean((hval - mu) ** 2, axis=1, keepdims=True)
                hval = (hval - mu) * jax.lax.rsqrt(var + ln_eps)
                hval = hval * lnw_ref[0, h : h + 1, :] + lnb_ref[0, h : h + 1, :]
            h_ref[bi, :, h * DHHV : (h + 1) * DHHV] = hval.astype(h_ref.dtype)
            if save_states:
                nout_ref[bi, 0, h : h + 1, :] = den.T

            kbar = k.astype(f32) * jnp.exp(a.T)
            dC = jax.lax.dot_general(
                kbar.astype(dtype), v.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            C_new = gbar * C_prev + dC
            n_new = gbar * n_prev + jnp.sum(kbar, axis=0, keepdims=True)
            c_scr[hh * DHQK : (hh + 1) * DHQK, :] = C_new
            n_scr[hh : hh + 1, :] = n_new

            @pl.when(j == NC - 1)
            def _final():
                clast_ref[bi, h] = C_new
                nlast_ref[bi, h : h + 1, :] = n_new


def _fw_kernel_train(q, k, v, b, a, li, g, c0, n0,
                     h, nout, cst, nst, clast, nlast, c_scr, n_scr, **kw):
    _fw_body(q, k, v, b, a, li, g, c0, n0,
             h, nout, cst, nst, clast, nlast, c_scr, n_scr,
             save_states=True, **kw)


def _fw_kernel_infer(q, k, v, b, a, li, g, c0, n0,
                     h, clast, nlast, c_scr, n_scr, **kw):
    _fw_body(q, k, v, b, a, li, g, c0, n0,
             h, None, None, None, clast, nlast, c_scr, n_scr,
             save_states=False, **kw)


def _fw_kernel_infer_ln(q, k, v, b, a, li, g, c0, n0, lnw, lnb,
                        h, clast, nlast, c_scr, n_scr, **kw):
    _fw_body(q, k, v, b, a, li, g, c0, n0,
             h, None, None, None, clast, nlast, c_scr, n_scr,
             save_states=False, lnw_ref=lnw, lnb_ref=lnb, **kw)


def _pack_gates(i, f, NC: int, L: int):
    """(B, S, NH) gates -> per-chunk gate ROWS, precomputed in XLA.

    Returns (b, a, logi) rows, each (B, NC, NH, L) f32, plus the chunk
    decay total scaG (B, NC, 1, NH):

        b[l]  = cumsum_{t<=l} logsig(f)      (within the chunk)
        a[l]  = sum_{t>l} logsig(f) + logsig(i)
        scaG  = b[L-1]  (full-chunk decay)

    v1 computed these *inside* the kernel via (1, L) x (L, L) triangular
    matmuls (`_chunk_gates`) because Mosaic has no cumsum primitive —
    but an M=1 matmul pads to a full ceil(L/128)^2 MXU tile grid, and the
    two cumsums cost ~50 tile-ops per head-chunk (~45% of the fw
    kernel's tile budget, ~26% of the bw's).  The rows are tiny
    (B*NC*NH*L f32 = one 2.5 MB tensor each at the flagship shape), so
    hoisting them to XLA trades negligible HBM for the kernels' single
    biggest tile-count reduction.

    Pad values keep padded steps inert: i -> -1e4 (logi ~ -1e4 kills the
    D column and the C/n write), f -> 1e4 (logsig 0: decays pass
    through).
    """
    B, S, NH = i.shape
    pad = NC * L - S
    if pad:
        i = jnp.pad(i, ((0, 0), (0, pad), (0, 0)), constant_values=-1e4)
        f = jnp.pad(f, ((0, 0), (0, pad), (0, 0)), constant_values=1e4)
    ic = i.reshape(B, NC, L, NH).astype(f32)
    fc = f.reshape(B, NC, L, NH).astype(f32)
    logf = jax.nn.log_sigmoid(fc)
    logi = jax.nn.log_sigmoid(ic)
    b = jnp.cumsum(logf, axis=2)  # inclusive within-chunk cumsum
    total = b[:, :, -1:, :]  # (B, NC, 1, NH)
    a = (total - b) + logi  # strict reverse cumsum (t > l) + logsig(i)
    tr = lambda x: x.transpose(0, 1, 3, 2)  # -> (B, NC, NH, L)
    scaG = total.reshape(B, NC, 1, NH)
    return tr(b), tr(a), tr(logi), scaG


def _fw_specs(G, HG, L, DHQK, DHHV, use_initial, BP=1):
    qkcols = lambda b, hg, j: (b, j, hg)
    rowm = lambda b, hg, j: (b, j, hg, 0)
    smem = lambda b, hg, j: (b, j, 0, hg)
    st = (lambda b, hg, j: (b, hg, 0, 0)) if use_initial else (lambda b, hg, j: (0, hg, 0, 0))
    st3 = (lambda b, hg, j: (b, hg, 0)) if use_initial else (lambda b, hg, j: (0, hg, 0))
    BPI = BP if use_initial else 1  # zero-init path never reads c0/n0
    in_specs = [
        pl.BlockSpec((BP, L, G * DHQK), qkcols),
        pl.BlockSpec((BP, L, G * DHQK), qkcols),
        pl.BlockSpec((BP, L, G * DHHV), qkcols),
        pl.BlockSpec((BP, 1, G, L), rowm),  # b rows
        pl.BlockSpec((BP, 1, G, L), rowm),  # a rows
        pl.BlockSpec((BP, 1, G, L), rowm),  # logi rows
        pl.BlockSpec((BP, 1, 1, G), smem, memory_space=pltpu.SMEM),
        pl.BlockSpec((BPI, G, DHQK, DHHV), st),
        pl.BlockSpec((BPI, G, DHQK), st3),
    ]
    return in_specs, qkcols, rowm


def _fw_auto_bp(B: int, L: int, G: int, DHQK: int, DHHV: int) -> int:
    """Batch items per grid step.  Measured verdict (v5e, B8 S6400 NH12
    DH32): packing LOSES — the kernel body is serial over (bi, h), so the
    packed work adds latency instead of amortizing the ~28 us/grid-step
    pipeline floor (bp=2 @ cs640: 5.55 ms vs bp=1: 4.50 ms; bp=8 @ cs200:
    14.9 ms; larger packs fail VMEM).  Auto therefore always picks 1; the
    `batch_pack` argument stays as an explicit experimental override."""
    return 1


def _fw(
    q, k, v, i, f, num_heads: int, c_initial=None, n_initial=None,
    chunk_size: int = 128, head_group: int = 0,
    qk_scale: float | None = None, eps: float = 1e-6,
    compute_dtype=jnp.bfloat16, save_states: bool = True,
    ln_weight=None, ln_bias=None, batch_pack: int | None = None,
):
    """q/k (B, S, NH*DHQK); v (B, S, NH*DHHV); i/f (B, S, NH)."""
    B, S, Hqk = q.shape
    NH = num_heads
    DHQK = Hqk // NH
    DHHV = v.shape[-1] // NH
    L = chunk_size
    NC = _cdiv(S, L)
    G = head_group or NH
    assert NH % G == 0, f"NH={NH} % G={G}"
    HG = NH // G
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    use_initial = c_initial is not None
    BP = batch_pack if batch_pack else _fw_auto_bp(B, L, G, DHQK, DHHV)
    assert B % BP == 0, f"B={B} % batch_pack={BP}"

    brow, arow, lirow, scaG = _pack_gates(i, f, NC, L)
    c0 = (
        c_initial.astype(f32)
        if use_initial
        else jnp.zeros((1, NH, DHQK, DHHV), f32)
    )
    n0 = (
        n_initial.astype(f32)
        if use_initial
        else jnp.zeros((1, NH, DHQK), f32)
    )

    in_specs, qkcols, rowm = _fw_specs(G, HG, L, DHQK, DHHV, use_initial, BP=BP)
    kw = dict(
        G=G, L=L, S=S, DHQK=DHQK, DHHV=DHHV, NC=NC, qk_scale=qk_scale,
        eps=eps, use_initial=use_initial, dtype=compute_dtype, BP=BP,
    )
    last = lambda b, hg, j: (b, hg, 0, 0)
    last3 = lambda b, hg, j: (b, hg, 0)
    st5 = lambda b, hg, j: (b, j, hg, 0, 0)
    st4 = lambda b, hg, j: (b, j, hg, 0)
    scratch = [
        pltpu.VMEM((BP * G * DHQK, DHHV), f32),
        pltpu.VMEM((BP * G, DHQK), f32),
    ]
    grid = (B // BP, HG, NC)

    if save_states:
        out = pl.pallas_call(
            functools.partial(_fw_kernel_train, **kw),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((BP, L, G * DHHV), qkcols),
                pl.BlockSpec((BP, 1, G, L), rowm),
                pl.BlockSpec((BP, 1, G, DHQK, DHHV), st5),
                pl.BlockSpec((BP, 1, G, DHQK), st4),
                pl.BlockSpec((BP, G, DHQK, DHHV), last),
                pl.BlockSpec((BP, G, DHQK), last3),
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
        )(q, k, v, brow, arow, lirow, scaG, c0, n0)
        h, n_out, cs, ns, c_last, n_last = out
    else:
        fuse_ln = ln_weight is not None
        infer_specs = list(in_specs)
        args = [q, k, v, brow, arow, lirow, scaG, c0, n0]
        kernel = _fw_kernel_infer
        if fuse_ln:
            lnw = ln_weight.astype(f32).reshape(HG, G, DHHV)
            lnb = (jnp.zeros_like(ln_weight) if ln_bias is None
                   else ln_bias).astype(f32).reshape(HG, G, DHHV)
            lnspec = pl.BlockSpec((1, G, DHHV), lambda b, hg, j: (hg, 0, 0))
            infer_specs += [lnspec, lnspec]
            args += [lnw, lnb]
            kernel = _fw_kernel_infer_ln
        out = pl.pallas_call(
            functools.partial(kernel, **kw),
            grid=grid,
            in_specs=infer_specs,
            out_specs=[
                pl.BlockSpec((BP, L, G * DHHV), qkcols),
                pl.BlockSpec((BP, G, DHQK, DHHV), last),
                pl.BlockSpec((BP, G, DHQK), last3),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, S, NH * DHHV), q.dtype),
                jax.ShapeDtypeStruct((B, NH, DHQK, DHHV), f32),
                jax.ShapeDtypeStruct((B, NH, DHQK), f32),
            ],
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(*args)
        h, c_last, n_last = out
        n_out = cs = None

    return h, n_out, cs, c_last, n_last


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bw_fused_kernel(
    q_ref, k_ref, v_ref, b_ref, a_ref, li_ref, g_ref,
    cstates_ref, nout_ref, dh_ref, dclast_ref,
    dq_ref, dk_ref, dv_ref, dc0_ref, *rest,
    G: int, L: int, S: int, DHQK: int, DHHV: int, NC: int,
    qk_scale: float, eps: float, use_dclast: bool, dtype: Any, CC: int = 1,
    fuse_gates: bool = False,
):
    """Fused backward: reverse dC scan + per-chunk dQ/dK/dV in ONE pass.

    Grid step j visits chunk block NB-1-j of CC chunks (NB = NC // CC),
    processing its chunks in reverse inside the kernel.  TPU grid steps
    execute sequentially on the core anyway, so carrying the dC
    recurrence in scratch while emitting dQ/dK/dV per chunk costs no
    parallelism and removes an entire NC-step grid pass (plus the
    dc_states HBM round-trip) vs the two-kernel form; CC > 1 further
    amortizes the ~28 us fixed per-grid-step pipeline overhead over CC
    chunks (the (L, L) transient VMEM footprint does not grow with CC).
    Emits dc0 = grad w.r.t. c_initial (the state *before* chunk 0) at
    the last step."""
    if fuse_gates:
        dqq_ref, dkk_ref, dc_scr = rest
    else:
        (dc_scr,) = rest
    j = pl.program_id(2)
    NB = NC // CC
    block_base = (NB - 1 - j) * CC  # first global chunk index in block
    ragged = S % L != 0
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    causal = row >= col  # hoisted: shared across chunks + heads

    @pl.when(j == 0)
    def _init():
        if use_dclast:
            dc_scr[...] = dclast_ref[0].reshape(G * DHQK, DHHV).astype(f32)
        else:
            dc_scr[...] = jnp.zeros((G * DHQK, DHHV), f32)

    for t in range(CC):  # chunks within the block, newest first
        local = CC - 1 - t
        mask = _row_mask(block_base + local, L, S) if ragged else None
        qall = q_ref[0, local * L : (local + 1) * L, :]
        kall = k_ref[0, local * L : (local + 1) * L, :]
        vall = v_ref[0, local * L : (local + 1) * L, :]
        dhall = dh_ref[0, local * L : (local + 1) * L, :]
        if ragged:
            qall = jnp.where(mask, qall, 0)
            kall = jnp.where(mask, kall, 0)
            vall = jnp.where(mask, vall, 0)
            dhall = jnp.where(mask, dhall, 0)

        for h in range(G):
            q = qall[:, h * DHQK : (h + 1) * DHQK]
            k = kall[:, h * DHQK : (h + 1) * DHQK]
            v = vall[:, h * DHHV : (h + 1) * DHHV]
            dh = dhall[:, h * DHHV : (h + 1) * DHHV]
            b = b_ref[0, local, 0, h : h + 1, :]  # XLA-precomputed rows
            a = a_ref[0, local, 0, h : h + 1, :]
            logi = li_ref[0, local, 0, h : h + 1, :]
            gbar = jnp.exp(g_ref[0, local, 0, 0, h])
            C_prev = cstates_ref[0, local, h]
            dC_after = dc_scr[h * DHQK : (h + 1) * DHQK, :]
            n_row = nout_ref[0, local, 0, h : h + 1, :]  # pad slots are 1.0
            dhn = dh.astype(f32) / (n_row.T + eps)  # (L, DHHV)

            D = jnp.where(causal, _exp_d(b.T - b + logi), 0.0)

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
            dq_ref[0, local * L : (local + 1) * L, h * DHQK : (h + 1) * DHQK] = (
                dq.astype(dq_ref.dtype))

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
            dk_ref[0, local * L : (local + 1) * L, h * DHQK : (h + 1) * DHQK] = (
                dk.astype(dk_ref.dtype))

            if fuse_gates:
                # gate-grad row reductions while q/k/dq/dk sit in VMEM
                # (the XLA epilogue otherwise re-reads all four from HBM)
                dqq_ref[0, local, 0, h : h + 1, :] = jnp.sum(
                    q.astype(f32) * dq, axis=1, keepdims=True).T
                dkk_ref[0, local, 0, h : h + 1, :] = jnp.sum(
                    k.astype(f32) * dk, axis=1, keepdims=True).T

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
            dv_ref[0, local * L : (local + 1) * L, h * DHHV : (h + 1) * DHHV] = (
                dv.astype(dv_ref.dtype))

            # reverse dC recurrence: dC_{jj-1} = e^g dC_jj + Qbar^T (dH / n)
            qbar = q.astype(f32) * expb * qk_scale
            dC_prev = gbar * dC_after + jax.lax.dot_general(
                qbar.astype(dtype), dhn.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            dc_scr[h * DHQK : (h + 1) * DHQK, :] = dC_prev

            if local == 0:  # chunk 0 of the whole sequence lives in block 0

                @pl.when(j == NB - 1)
                def _final(dC_prev=dC_prev, h=h):
                    dc0_ref[0, h] = dC_prev


def _bw_fused_kernel_t(
    q_ref, k_ref, v_ref, b_ref, a_ref, li_ref, g_ref,
    cstates_ref, nout_ref, dh_ref, dclast_ref,
    dqt_ref, dkt_ref, dvt_ref, dc0_ref, dc_scr,
    *, G: int, L: int, S: int, DHQK: int, DHHV: int, NC: int,
    qk_scale: float, eps: float, use_dclast: bool, dtype: Any,
):
    """Transposed-output fused backward: emits dQ^T/dK^T/dV^T as (DH, L).

    The row-form kernel's output matmuls — P K, P^T Q, (S∘D)^T dhn — all
    have N = DH = 32 lanes, so the MXU executes them 128-lane padded at
    25% utilization.  Orienting the results (DH, L) makes DH the
    *sublane* dim (8-granular, no padding) and L the lane dim: the same
    products run as (DH, L) = (operand^T)(L, L) at full width.  The
    (B, H, S) outputs are transposed back to (B, S, H) by one XLA pass
    each outside the kernel (~0.1 ms vs multi-ms of MXU padding waste).
    Selected via XY_V2_BW=col; parity-tested against the row form."""
    j = pl.program_id(2)
    jj = NC - 1 - j
    ragged = S % L != 0
    mask = _row_mask(jj, L, S) if ragged else None
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)

    @pl.when(j == 0)
    def _init():
        if use_dclast:
            dc_scr[...] = dclast_ref[0].reshape(G * DHQK, DHHV).astype(f32)
        else:
            dc_scr[...] = jnp.zeros((G * DHQK, DHHV), f32)

    qall = q_ref[0]
    kall = k_ref[0]
    vall = v_ref[0]
    dhall = dh_ref[0]
    if ragged:
        qall = jnp.where(mask, qall, 0)
        kall = jnp.where(mask, kall, 0)
        vall = jnp.where(mask, vall, 0)
        dhall = jnp.where(mask, dhall, 0)

    for h in range(G):
        q = qall[:, h * DHQK : (h + 1) * DHQK]
        k = kall[:, h * DHQK : (h + 1) * DHQK]
        v = vall[:, h * DHHV : (h + 1) * DHHV]
        dh = dhall[:, h * DHHV : (h + 1) * DHHV]
        b = b_ref[0, 0, 0, h : h + 1, :]  # XLA-precomputed rows
        a = a_ref[0, 0, 0, h : h + 1, :]
        logi = li_ref[0, 0, 0, h : h + 1, :]
        gbar = jnp.exp(g_ref[0, 0, 0, 0, h])
        C_prev = cstates_ref[0, 0, h]
        dC_after = dc_scr[h * DHQK : (h + 1) * DHQK, :]
        n_row = nout_ref[0, 0, 0, h : h + 1, :]  # pad slots are 1.0
        dhn = dh.astype(f32) / (n_row.T + eps)  # (L, DHHV)

        D = jnp.where(row >= col, jnp.exp(b.T - b + logi), 0.0)

        P = jax.lax.dot_general(  # (L, L); K = DH unavoidable
            dhn.astype(dtype), v.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * D
        s = jax.lax.dot_general(  # (L, L); K = DH unavoidable
            q.astype(dtype), k.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * qk_scale
        sd = s * D

        expb_row = jnp.exp(b)  # (1, L)
        expa_row = jnp.exp(a)

        # dQ^T = scale [ (P K)^T + (dhn C_prev^T ∘ e^b)^T ]
        #      = scale [ K^T-contract(P rows) + C_prev dhn^T ∘ e^b-row ]
        dqt = jax.lax.dot_general(  # (DHQK, L): k[m,d] P[l,m] -> (d, l)
            k.astype(dtype), P.astype(dtype),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * qk_scale
        dqt += jax.lax.dot_general(  # C_prev[d,v] dhn[l,v] -> (d, l)
            C_prev.astype(dtype), dhn.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * (expb_row * qk_scale)
        dqt_ref[0, h * DHQK : (h + 1) * DHQK, :] = dqt.astype(dqt_ref.dtype)

        # dK^T = scale (P^T Q)^T + (V dC_after^T ∘ e^a)^T
        dkt = jax.lax.dot_general(  # q[m,d] P[m,l] -> (d, l)
            q.astype(dtype), P.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) * qk_scale
        dkt += jax.lax.dot_general(  # dC[d,v] v[l,v] -> (d, l)
            dC_after.astype(dtype), v.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * expa_row
        dkt_ref[0, h * DHQK : (h + 1) * DHQK, :] = dkt.astype(dkt_ref.dtype)

        # dV^T = ((S ∘ D)^T dhn)^T + ((e^a k) dC_after)^T
        dvt = jax.lax.dot_general(  # dhn[m,v] sd[m,l] -> (v, l)
            dhn.astype(dtype), sd.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dvt += jax.lax.dot_general(  # dC[d,v] k[l,d] -> (v, l)
            dC_after.astype(dtype), k.astype(dtype),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * expa_row
        dvt_ref[0, h * DHHV : (h + 1) * DHHV, :] = dvt.astype(dvt_ref.dtype)

        # reverse dC recurrence: dC_{jj-1} = e^g dC_jj + Qbar^T (dH / n)
        qbar = q.astype(f32) * (expb_row.T * qk_scale)
        dC_prev = gbar * dC_after + jax.lax.dot_general(
            qbar.astype(dtype), dhn.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dc_scr[h * DHQK : (h + 1) * DHQK, :] = dC_prev

        @pl.when(j == NC - 1)
        def _final():
            dc0_ref[0, h] = dC_prev


def _bw_head_group(NH: int, L: int, DHQK: int, DHHV: int,
                   budget_mb: float = 12.0) -> int:
    """Largest head-group whose dQKV kernel fits scoped VMEM.

    Empirically the dQKV kernel needs ~2.5 MB/head at L=512 (measured
    30 MB at 12 heads vs the 16 MB limit); budget 12 MB (or 3/4 of an
    explicitly raised limit) and scale by the (L, L) transients.  Mosaic
    additionally requires the q/k/v block minor dim (G*DH) to divide 128
    or equal the full H — so candidate groups are filtered to lane-legal
    ones.
    """
    per_head_mb = 2.5 * (L / 512) ** 2

    def legal(g):
        return g == NH or ((g * DHQK) % 128 == 0 and (g * DHHV) % 128 == 0)

    cands = sorted((g for g in range(1, NH + 1) if NH % g == 0 and legal(g)), reverse=True)
    for g in cands:
        if g * per_head_mb <= budget_mb:
            return g
    return cands[-1]


def _bw(
    q, k, v, i, f, num_heads: int, n_out, c_states, dh, dc_last=None,
    chunk_size: int = 128,
    qk_scale: float | None = None, eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
):
    """n_out/c_states arrive in the (B, NC, NH, ...) layout from the fw;
    head-group re-partitioning is free (a BlockSpec choice, no reshape)."""
    B, S, Hqk = q.shape
    NH = num_heads
    DHQK = Hqk // NH
    DHHV = v.shape[-1] // NH
    L = chunk_size
    NC = _cdiv(S, L)
    vmem_mb = BW_CFG["vmem_mb"]
    budget_mb = 0.75 * vmem_mb if vmem_mb else 12.0
    G = BW_CFG["g"] or _bw_head_group(NH, L, DHQK, DHHV, budget_mb)
    HG = NH // G
    CC = BW_CFG["cc"] or 1
    if CC > 1 and (S % L or NC % CC or BW_VARIANT == "col"):
        CC = 1  # multi-chunk blocks need exact chunking; col variant is CC=1
    NB = NC // CC
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    use_dclast = dc_last is not None

    brow, arow, lirow, scaG = _pack_gates(i, f, NC, L)
    # Mosaic requires block dims -2/-1 to divide (8, 128) or equal the
    # array dims; a (…, G, L) block with G < NH violates that on the 4-D
    # (B, NC, NH, L) rows, so give the bw a 5-D (B, NC, HG, G, L) view.
    g5 = lambda x: x.reshape(B, NC, HG, G, L)
    brow, arow, lirow = g5(brow), g5(arow), g5(lirow)
    scaG = scaG.reshape(B, NC, HG, 1, G)
    n_out = g5(n_out)
    dcl = (
        dc_last.astype(f32)
        if use_dclast
        else jnp.zeros((1, NH, DHQK, DHHV), f32)
    )

    qk_rev = lambda b, hg, j: (b, NB - 1 - j, hg)
    row_rev = lambda b, hg, j: (b, NB - 1 - j, hg, 0, 0)
    smem_rev = lambda b, hg, j: (b, NB - 1 - j, hg, 0, 0)
    st5_rev = lambda b, hg, j: (b, NB - 1 - j, hg, 0, 0)
    grid = (B, HG, NB)

    transposed = BW_VARIANT == "col"
    kernel = _bw_fused_kernel_t if transposed else _bw_fused_kernel
    if transposed:
        # (B, H, S) outputs: DH rides the sublane dim inside the kernel
        # (full MXU width), one XLA transpose each back to (B, S, H)
        grad_specs = [
            pl.BlockSpec((1, G * DHQK, L), lambda b, hg, j: (b, hg, NC - 1 - j)),
            pl.BlockSpec((1, G * DHQK, L), lambda b, hg, j: (b, hg, NC - 1 - j)),
            pl.BlockSpec((1, G * DHHV, L), lambda b, hg, j: (b, hg, NC - 1 - j)),
        ]
        grad_shapes = [
            jax.ShapeDtypeStruct((B, NH * DHQK, S), q.dtype),
            jax.ShapeDtypeStruct((B, NH * DHQK, S), k.dtype),
            jax.ShapeDtypeStruct((B, NH * DHHV, S), v.dtype),
        ]
    else:
        grad_specs = [
            pl.BlockSpec((1, CC * L, G * DHQK), qk_rev),
            pl.BlockSpec((1, CC * L, G * DHQK), qk_rev),
            pl.BlockSpec((1, CC * L, G * DHHV), qk_rev),
        ]
        grad_shapes = [
            jax.ShapeDtypeStruct((B, S, NH * DHQK), q.dtype),
            jax.ShapeDtypeStruct((B, S, NH * DHQK), k.dtype),
            jax.ShapeDtypeStruct((B, S, NH * DHHV), v.dtype),
        ]

    fuse_gates = bool(BW_CFG["fuse_gates"]) and not transposed
    kern_kw = dict(
        G=G, L=L, S=S, DHQK=DHQK, DHHV=DHHV, NC=NC,
        qk_scale=qk_scale, eps=eps, use_dclast=use_dclast,
        dtype=compute_dtype,
    )
    if not transposed:
        kern_kw["CC"] = CC
        kern_kw["fuse_gates"] = fuse_gates
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
        if vmem_mb else None
    )
    extra_specs, extra_shapes = [], []
    if fuse_gates:
        extra_specs = [pl.BlockSpec((1, CC, 1, G, L), row_rev)] * 2
        extra_shapes = [jax.ShapeDtypeStruct((B, NC, HG, G, L), f32)] * 2

    # single reverse pass: dC recurrence carried in scratch, dQ/dK/dV
    # emitted per chunk (grid steps are sequential on the core anyway)
    dq, dk, dv, dc0_arr, *extra = pl.pallas_call(
        functools.partial(kernel, **kern_kw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CC * L, G * DHQK), qk_rev),
            pl.BlockSpec((1, CC * L, G * DHQK), qk_rev),
            pl.BlockSpec((1, CC * L, G * DHHV), qk_rev),
            pl.BlockSpec((1, CC, 1, G, L), row_rev),
            pl.BlockSpec((1, CC, 1, G, L), row_rev),
            pl.BlockSpec((1, CC, 1, G, L), row_rev),
            pl.BlockSpec((1, CC, 1, 1, G), smem_rev, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, G, DHQK, DHHV), st5_rev),
            pl.BlockSpec((1, CC, 1, G, L), row_rev),
            pl.BlockSpec((1, CC * L, G * DHHV), qk_rev),
            pl.BlockSpec(
                (1, G, DHQK, DHHV),
                (lambda b, hg, j: (b, hg, 0, 0)) if use_dclast else (lambda b, hg, j: (0, hg, 0, 0)),
            ),
        ],
        out_specs=grad_specs + [
            pl.BlockSpec((1, G, DHQK, DHHV), lambda b, hg, j: (b, hg, 0, 0)),
        ] + extra_specs,
        out_shape=grad_shapes + [
            jax.ShapeDtypeStruct((B, NH, DHQK, DHHV), f32),
        ] + extra_shapes,
        scratch_shapes=[pltpu.VMEM((G * DHQK, DHHV), f32)],
        compiler_params=params,
        interpret=_interpret(),
    )(q, k, v, brow, arow, lirow, scaG, c_states, n_out, dh, dcl)
    if transposed:
        dq = jnp.swapaxes(dq, 1, 2)
        dk = jnp.swapaxes(dk, 1, 2)
        dv = jnp.swapaxes(dv, 1, 2)

    # 3) gate grads (elementwise + cumsums over S; XLA fuses these fine)
    #    parity: ref:.../chunkwise_gates.py:75-100
    if fuse_gates:
        # (B, NC, HG, G, L) rows from the kernel -> (B, S, NH)
        def _rows_to_sn(x):
            x = x.reshape(B, NC, NH, L).transpose(0, 1, 3, 2)
            return x.reshape(B, NC * L, NH)[:, :S]

        qdq = _rows_to_sn(extra[0])
        kdk = _rows_to_sn(extra[1])
        dfbar = qdq - kdk  # (B, S, NH)
    else:
        qg = q.astype(f32).reshape(B, S, NH, DHQK)
        kg = k.astype(f32).reshape(B, S, NH, DHQK)
        dqg = dq.astype(f32).reshape(B, S, NH, DHQK)
        dkg = dk.astype(f32).reshape(B, S, NH, DHQK)
        kdk = (kg * dkg).sum(-1)
        dfbar = (qg * dqg).sum(-1) - kdk  # (B, S, NH)
    dfrev = jnp.cumsum(dfbar[:, ::-1], axis=1)[:, ::-1]
    df = dfrev * jax.nn.sigmoid(-f.astype(f32))
    di = kdk * jax.nn.sigmoid(-i.astype(f32))

    dc0 = dc0_arr  # (B, NH, DHQK, DHHV): grad w.r.t. c_initial
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), di, df, dc0


# ---------------------------------------------------------------------------
# public API with custom VJP — native (B, S, H) calling convention
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _chunkwise_core_v2(q, k, v, i, f, c_initial, n_initial,
                       num_heads, chunk_size, qk_scale, eps, compute_dtype,
                       return_last_states, batch_pack=None):
    # primal (not differentiated): lean forward without backward outputs
    h, _, _, c_last, n_last = _fw(
        q, k, v, i, f, num_heads, c_initial, n_initial,
        chunk_size=chunk_size, qk_scale=qk_scale,
        eps=eps, compute_dtype=compute_dtype, save_states=False,
        batch_pack=batch_pack,
    )
    return (h, (c_last, n_last)) if return_last_states else h


def _core_fwd(q, k, v, i, f, c_initial, n_initial,
              num_heads, chunk_size, qk_scale, eps, compute_dtype,
              return_last_states, batch_pack=None):
    h, n_out, cs, c_last, n_last = _fw(
        q, k, v, i, f, num_heads, c_initial, n_initial,
        chunk_size=chunk_size, qk_scale=qk_scale,
        eps=eps, compute_dtype=compute_dtype, save_states=True,
        batch_pack=batch_pack,
    )
    res = (q, k, v, i, f, n_out, cs, c_initial is not None)
    out = (h, (c_last, n_last)) if return_last_states else h
    return out, res


def _core_bwd(num_heads, chunk_size, qk_scale, eps, compute_dtype,
              return_last_states, batch_pack, res, g):
    q, k, v, i, f, n_out, cs, had_init = res
    if return_last_states:
        dh, (dc_last, _dn_last) = g
    else:
        dh, dc_last = g, None
    dq, dk, dv, di, df, dc0 = _bw(
        q, k, v, i, f, num_heads, n_out, cs, dh, dc_last=dc_last,
        chunk_size=chunk_size, qk_scale=qk_scale,
        eps=eps, compute_dtype=compute_dtype,
    )
    dci = dc0 if had_init else None
    dni = jnp.zeros_like(dc0[..., 0]) if had_init else None
    return dq, dk, dv, di, df, dci, dni


_chunkwise_core_v2.defvjp(_core_fwd, _core_bwd)


def mlstm_siging_chunkwise_pallas_v2_bsh(
    q, k, v, i, f,
    num_heads: int,
    chunk_size: int = 128,
    c_initial=None,
    n_initial=None,
    qk_scale: float | None = None,
    normalize: bool = True,
    return_last_states: bool = False,
    eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
    ln_weight=None,
    ln_bias=None,
    batch_pack: int | None = None,
):
    """Native entry: q/k/v (B, S, H), i/f (B, S, NH) — zero transposes.

    This is the model path (MatrixLSTMCell feeds (B, S, H) streams
    directly); states stay (B, NH, DHQK, DHHV) for wrapper parity.

    ``ln_weight``/``ln_bias`` ((H,), scale already in (1 + w) form) fuse
    the MultiHeadLayerNorm epilogue into the kernel — INFERENCE ONLY:
    this path bypasses the custom VJP (differentiating it raises, it
    does not silently drop the norm gradient).
    """
    assert normalize, "unnormalized variant not implemented in the Pallas path"
    if qk_scale is None:
        qk_scale = (q.shape[-1] // num_heads) ** -0.5
    S = q.shape[1]
    # chunk-size policy (measured on v5e): a single chunk for short
    # sequences (S=400: 0.25 ms vs 1.81 ms ragged-256), else the largest
    # divisor of S within [target/2, target] (S=1600: L=400 0.78 ms vs
    # L=512-ragged 1.19 ms); ragged masking only when no divisor exists.
    if S <= 512:
        chunk_size = S
    elif S % chunk_size:
        # candidate divisors stay 8-aligned (Mosaic sublane constraint on
        # the (L, H) blocks when the block doesn't span the whole S dim)
        for c in range(chunk_size - chunk_size % 8, chunk_size // 2 - 1, -8):
            if S % c == 0:
                chunk_size = c
                break
    if ln_weight is not None:
        h, _, _, c_last, n_last = _fw(
            q, k, v, i, f, num_heads, c_initial, n_initial,
            chunk_size=chunk_size, qk_scale=qk_scale, eps=eps,
            compute_dtype=compute_dtype, save_states=False,
            ln_weight=ln_weight, ln_bias=ln_bias, batch_pack=batch_pack,
        )
        return (h, (c_last, n_last)) if return_last_states else h
    return _chunkwise_core_v2(
        q, k, v, i, f, c_initial, n_initial,
        num_heads, chunk_size, qk_scale, eps, compute_dtype,
        return_last_states, batch_pack,
    )


mlstm_siging_chunkwise_pallas_v2_bsh.handles_ragged = True


def mlstm_siging_chunkwise_pallas_v2(
    q, k, v, i, f,
    chunk_size: int = 128,
    c_initial=None,
    n_initial=None,
    qk_scale: float | None = None,
    normalize: bool = True,
    return_last_states: bool = False,
    eps: float = 1e-6,
    compute_dtype=jnp.bfloat16,
    head_group: int = 0,  # kept for API compat; grouping is automatic
):
    """Registry-convention entry: (B, NH, S, DH) operands like every other
    chunkwise kernel.  Transposes to the native (B, S, H) layout — prefer
    the _bsh entry in model code where the streams already are (B, S, H)."""
    B, NH, S, DHQK = q.shape
    to_bsh = lambda x: jnp.swapaxes(x, 1, 2).reshape(B, S, -1)
    out = mlstm_siging_chunkwise_pallas_v2_bsh(
        to_bsh(q), to_bsh(k), to_bsh(v),
        jnp.swapaxes(i, 1, 2), jnp.swapaxes(f, 1, 2),
        num_heads=NH, chunk_size=chunk_size,
        c_initial=c_initial, n_initial=n_initial, qk_scale=qk_scale,
        normalize=normalize, return_last_states=return_last_states,
        eps=eps, compute_dtype=compute_dtype,
    )
    if return_last_states:
        h, state = out
    else:
        h, state = out, None
    h = jnp.swapaxes(h.reshape(B, S, NH, -1), 1, 2)
    return (h, state) if state is not None else h


mlstm_siging_chunkwise_pallas_v2.handles_ragged = True
