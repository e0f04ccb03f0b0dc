"""Vision-LSTM core modules in flax.linen (TPU-native layouts).

Functional re-design of ref:ultralytics/nn/modules/vision_lstm/vision_lstm2.py
and vision_lstm_util.py.  Conventions that differ from the torch reference
on purpose (TPU-first):

- images are NHWC (XLA's native TPU conv layout), sequences are (B, S, D);
- ``training`` is a module *attribute*, not a call argument, so graphs are
  pure functions of inputs (params are structurally identical either way);
- mLSTM head compute runs through the kernel registry
  (:mod:`xlstm_yolo_tpu.ops`) — chunkwise scan / Pallas on TPU;
- initializers numerically match the reference (small_init / wang_init /
  gate-bias schedules) so converted torch weights drop in.
"""

from __future__ import annotations

import math
import os as _os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlstm_yolo_tpu.ops import backend as ops_backend


def resolve_seqlens(S: int, seqlens) -> tuple[int, int]:
    """Actual (h, w) token grid for a length-S sequence given the block's
    declared base grid.

    Multi-scale training feeds the same model bucketed input sizes
    (ref:models/yolo/detect/train.py:60 multi_scale); the declared YAML
    seqlens describe the base resolution and rescale proportionally.
    S and seqlens are trace-time ints, so this is free under jit and
    each bucket compiles its own fixed-shape program.
    """
    h0, w0 = seqlens
    if h0 * w0 == S:
        return int(h0), int(w0)
    r = math.sqrt(S / (h0 * w0))
    h, w = int(round(h0 * r)), int(round(w0 * r))
    assert h * w == S, (
        f"sequence length {S} incompatible with base grid {h0}x{w0} "
        f"(multi-scale buckets must rescale the grid integrally)"
    )
    return h, w

f32 = jnp.float32

FORWARD = "rowwise_from_top_left"
BACKWARD = "rowwise_from_bot_right"


# ---------------------------------------------------------------------------
# initializers (parity: vision_lstm2.py:20-49)
# ---------------------------------------------------------------------------

def small_init(dim: int) -> Callable:
    """Normal(0, sqrt(2/(5*dim))) — 'Transformers without Tears' init."""
    return nn.initializers.normal(stddev=math.sqrt(2.0 / (5.0 * dim)))


def wang_init(dim: int, num_blocks: int) -> Callable:
    return nn.initializers.normal(stddev=2.0 / max(num_blocks, 1) / math.sqrt(dim))


def bias_linspace_init(start: float, end: float) -> Callable:
    def init(key, shape, dtype=f32):
        assert len(shape) == 1
        return jnp.linspace(start, end, shape[0], dtype=dtype)

    return init


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------


class ResidualLayerNorm(nn.Module):
    """LayerNorm whose scale parameterizes as (1 + w), w init 0.

    Parity: the reference's custom LayerNorm (vision_lstm2.py:881-925,
    residual_weight=True).  ``bias`` toggles the beta term.
    """

    dim: int
    eps: float = 1e-5
    use_weight: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        xf = x.astype(f32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_weight:
            w = self.param("weight", nn.initializers.zeros, (self.dim,), f32)
            y = y * (1.0 + w)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.dim,), f32)
            y = y + b
        return y.astype(x.dtype)


class MultiHeadLayerNorm(nn.Module):
    """Per-head group normalization over (B, NH, S, DH).

    Parity: vision_lstm2.py:928-944 — group_norm with num_groups=NH over
    the flattened (NH*DH) features, scale=(1+w) residual weight.
    Normalization statistics are computed per (b, s, head) over DH.
    """

    num_heads: int
    head_dim: int
    eps: float = 1e-6
    use_weight: bool = True
    use_bias: bool = True
    data_format: str = "BNSD"  # or "BSND"; params identical either way

    @nn.compact
    def __call__(self, x):  # (B, NH, S, DH) or (B, S, NH, DH)
        NH, DH = self.num_heads, self.head_dim
        xf = x.astype(f32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        shape = (1, NH, 1, DH) if self.data_format == "BNSD" else (1, 1, NH, DH)
        if self.use_weight:
            w = self.param("weight", nn.initializers.zeros, (NH * DH,), f32)
            y = y * (1.0 + w).reshape(shape)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (NH * DH,), f32)
            y = y + b.reshape(shape)
        return y.astype(x.dtype)


class RMSNorm(nn.Module):
    """Standard RMSNorm (torch.nn.RMSNorm parity, weight init ones)."""

    dim: int
    eps: float = 1e-6
    use_weight: bool = True

    @nn.compact
    def __call__(self, x):
        xf = x.astype(f32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        if self.use_weight:
            w = self.param("weight", nn.initializers.ones, (self.dim,), f32)
            y = y * w
        return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# drop path (stochastic depth)
# ---------------------------------------------------------------------------


class DropPath(nn.Module):
    """Per-sample stochastic depth: x + mask * branch(x) / keep_prob.

    Parity: vision_lstm_util.py:285 (mask formulation — the reference's
    batch-subset gather variant is a GPU memory trick; fixed-shape
    masking is the TPU-correct equivalent).
    """

    drop_prob: float = 0.0
    training: bool = False
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, x, branch_out):
        if self.drop_prob == 0.0 or not self.training:
            return x + branch_out
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        if self.scale_by_keep:
            mask = mask / keep
        return x + branch_out * mask


# ---------------------------------------------------------------------------
# sequence convs / patch + pos embed
# ---------------------------------------------------------------------------


class SequenceConv2d(nn.Module):
    """(B, S, D) -> depthwise 2d conv on the (H, W) grid -> (B, S, D).

    Parity: vision_lstm_util.py:96-113.  NHWC throughout.
    """

    dim: int
    out_dim: int | None = None
    kernel_size: int = 3
    seqlens: Sequence[int] | None = None
    use_bias: bool = True
    groups: int | None = None  # default: depthwise
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        if self.seqlens is None:
            h = int(round(math.sqrt(S)))
            assert h * h == S, f"S={S} is not square; pass seqlens"
            w = h
        else:
            h, w = resolve_seqlens(S, self.seqlens)
        out_dim = self.out_dim or self.dim
        groups = self.groups if self.groups is not None else self.dim
        xi = x.reshape(B, h, w, D)
        if self.kernel_size == 3 and groups == D == out_dim:
            # depthwise 3x3: route through the measured impl selector
            # (nn/blocks.py DW_IMPL — shift9 is param-compatible)
            from xlstm_yolo_tpu.nn import blocks as _blocks

            if _blocks._dw_impl() == "shift9":
                y = _blocks.DWConv3x3Shift9(
                    out_dim, use_bias=self.use_bias, dtype=self.dtype,
                    name="conv")(xi)
                return y.reshape(B, h * w, out_dim)
        y = nn.Conv(
            out_dim,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            feature_group_count=groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(xi)
        return y.reshape(B, h * w, out_dim)


class VitPatchEmbed(nn.Module):
    """Non-overlapping conv patch embedding, xavier-uniform init.

    Parity: vision_lstm_util.py:139-198.  Input NHWC (B, H, W, C),
    output grid (B, H', W', dim).
    """

    dim: int
    patch_size: Sequence[int] = (8, 8)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ph, pw = self.patch_size
        B, H, W, C = x.shape
        assert H % ph == 0 and W % pw == 0, (
            f"input {x.shape} not divisible by patch {self.patch_size}"
        )
        # A stride-p conv over 3 input channels runs at ~1% MXU utilization
        # (3-lane contraction); the identical math as space-to-depth + one
        # dense matmul is ~8x faster (measured 3.9 -> 0.5 ms at 640px/b8).
        # Params keep the conv layout (ph, pw, C, dim) under 'proj' so
        # checkpoints/torch conversion are unchanged.
        xp = x.reshape(B, H // ph, ph, W // pw, pw, C)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // ph, W // pw, ph * pw * C)
        return _PatchProj(
            dim=self.dim, patch_size=(ph, pw), in_ch=C, dtype=self.dtype, name="proj"
        )(xp)


class _PatchProj(nn.Module):
    """Conv-shaped params applied as a flattened-patch matmul."""

    dim: int
    patch_size: tuple
    in_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, xp):
        ph, pw = self.patch_size
        kernel = self.param(
            "kernel", _xavier_uniform_flat, (ph, pw, self.in_ch, self.dim), f32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), f32)
        cd = self.dtype or xp.dtype
        w = kernel.reshape(ph * pw * self.in_ch, self.dim)
        y = jax.lax.dot_general(
            xp.astype(cd), w.astype(cd),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        return (y + bias).astype(cd)


def _xavier_uniform_flat(key, shape, dtype=f32):
    """Xavier-uniform computed on the flattened (out, in*kh*kw) view.

    The reference flattens the conv weight to 2D before xavier init
    (vision_lstm_util.py:186-188), which changes the fan computation
    vs. per-kernel xavier.
    """
    kh, kw, cin, cout = shape
    fan_in = cin * kh * kw
    fan_out = cout
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class VitPosEmbed2d(nn.Module):
    """Learnable 2d positional embedding with bicubic resize.

    Parity: vision_lstm_util.py:210-263 (learnable branch, trunc-normal
    0.02 init, bicubic interpolation for resolution changes).
    Input/output: (B, H, W, D).
    """

    seqlens: Sequence[int]
    dim: int

    @nn.compact
    def __call__(self, x):
        embed = self.param(
            "embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, *self.seqlens, self.dim),
            f32,
        )
        if x.shape[1:3] != embed.shape[1:3]:
            embed = jax.image.resize(
                embed, (1, x.shape[1], x.shape[2], self.dim), method="bicubic"
            )
        return x + embed.astype(x.dtype)


# ---------------------------------------------------------------------------
# FeedForward (SiLU-gated, fused weights)
# ---------------------------------------------------------------------------


class FeedForward(nn.Module):
    """Fused SwiGLU-style FFN: silu(gate) * z -> down.

    Parity: vision_lstm2.py:136-215 (weight_mode="fused"): up dim is
    round_up(dim * 8/3, 64); gate is the first half of the fused up
    projection.
    """

    dim: int
    proj_factor: float = 2.6667
    round_up_to: int = 64
    use_bias: bool = True
    num_blocks: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # float floor-div round-up, matching the reference expression
        # (vision_lstm2.py:47-49) bit-for-bit: for dim=192, factor=2.6667
        # this yields 512 (not the true ceil 576) because the float
        # product 512.0064 floors through (x + 63) // 64.
        up = int(
            ((self.dim * self.proj_factor + self.round_up_to - 1) // self.round_up_to)
            * self.round_up_to
        )
        gz = nn.Dense(
            2 * up,
            use_bias=self.use_bias,
            kernel_init=small_init(self.dim),
            dtype=self.dtype,
            name="proj_up_gate_z",
        )(x)
        gate, z = jnp.split(gz, [up], axis=-1)
        h = nn.silu(gate) * z
        return nn.Dense(
            self.dim,
            use_bias=self.use_bias,
            kernel_init=wang_init(self.dim, self.num_blocks),
            dtype=self.dtype,
            name="proj_down",
        )(h)


# ---------------------------------------------------------------------------
# MatrixLSTMCell
# ---------------------------------------------------------------------------


def soft_cap(x, cap: float):
    """cap * tanh(x / cap) — bounds gate preactivations (vision_lstm2.py:755)."""
    return cap * jnp.tanh(x / cap)


class MatrixLSTMCell(nn.Module):
    """Gate projection + chunkwise mLSTM + per-head out-norm.

    Parity: vision_lstm2.py:623-769.  The fused ifgate Dense maps the
    concatenated (q, k, v) to 2*NH gate preactivations (soft-capped at
    15), the kernel registry runs the sigmoid-input-gate chunkwise
    recurrence, and a MultiHeadLayerNorm(+bias) normalizes the output.
    Gate bias init: i = -10, f = linspace(3, 6) across heads.
    """

    dim: int
    num_heads: int
    chunk_size: int = 64
    mode: str = "train_with_padding"  # train | train_with_padding | inference
    chunkwise_kernel: str = "chunkwise--native_autograd"
    sequence_kernel: str = "sequence--native"
    step_kernel: str = "step--native"
    gate_soft_cap: float = 15.0
    norm_bias: bool = True
    eps: float = 5e-5
    compute_dtype: Any = None  # cast q/k/v for the kernel (e.g. bf16)
    fuse_outnorm: bool = False  # fuse LN into the v2 kernel (see _call_v2_bsh)
    defer_outnorm: bool = False  # return (h_raw, (ln_w, ln_b)) on the v2
    # path so the CALLER can fuse [outnorm -> skip -> proj_down] into one
    # custom-VJP epilogue (ops/pallas/epilogue.py); params still declared
    # here under 'outnorm' so checkpoints are identical either way

    @nn.compact
    def __call__(self, q, k, v, state=None):
        B, S, H = q.shape
        NH = self.num_heads
        DH = H // NH

        if IFGATE_IMPL == "split":
            # concat-free gate projection: same params/math as the Dense
            # over concat([q,k,v]), but three sliced (H, 2NH) matmuls read
            # q/k/v directly — no (B, S, 3H) f32 concat buffer in fwd or
            # its (B, S, 3H) cotangent in bwd (XY_IFGATE selects; flip on
            # measurement only — scripts/exp_layer_bwd.py)
            w, b = _IfGateParams(num_heads=NH, in_features=3 * H,
                                 name="ifgate")()
            wq, wk, wv = jnp.split(w, 3, axis=0)
            if_preact = (q.astype(f32) @ wq + k.astype(f32) @ wk
                         + v.astype(f32) @ wv + b)
        else:
            gate_in = jnp.concatenate([q, k, v], axis=-1)
            if_preact = nn.Dense(
                2 * NH,
                kernel_init=nn.initializers.zeros,
                bias_init=_ifgate_bias_init(NH),
                name="ifgate",
                dtype=f32,
            )(gate_in.astype(f32))
        if_preact = soft_cap(if_preact, self.gate_soft_cap)
        i_pre, f_pre = jnp.split(if_preact, 2, axis=-1)  # (B, S, NH)
        cd = self.compute_dtype or q.dtype

        # v2 takes the (B, S, H) streams directly — no head transposes
        # (Pallas would materialize them; XLA fuses them for the scan).
        # Below ~1k tokens the XLA scan beats the kernel (measured 0.27 vs
        # 1.81 ms at S=400: launch overhead + ragged masking dominate), so
        # short sequences stay on the native path.
        if self.chunkwise_kernel.endswith("pallas_xl_chunk_siging_v2") and S >= 1024:
            return self._call_v2_bsh(q, k, v, i_pre, f_pre, state, cd, B, S, H, NH, DH)

        i_pre = jnp.swapaxes(i_pre, -1, -2)  # (B, NH, S)
        f_pre = jnp.swapaxes(f_pre, -1, -2)

        def heads(x):
            return jnp.swapaxes(x.reshape(B, S, NH, DH), 1, 2)  # (B, NH, S, DH)

        qh, kh, vh = heads(q).astype(cd), heads(k).astype(cd), heads(v).astype(cd)

        ck = self.chunkwise_kernel
        if ck.endswith("pallas_xl_chunk_siging_v2"):
            ck = "chunkwise--native_autograd"  # short-sequence fallback
        is_pallas = "pallas" in ck
        cfg = ops_backend.mLSTMBackendConfig(
            chunkwise_kernel=ck,
            sequence_kernel=self.sequence_kernel,
            step_kernel=self.step_kernel,
            mode=self.mode,
            chunk_size=self.chunk_size,
            eps=self.eps,
            return_last_states=state is not None,
            # Pallas tiles lanes in 128s: zero-padding S to the configured chunk
            # (+4% at S=6400/L=512) beats a 400-wide divisor chunk (+28%
            # lane padding); the jnp path prefers exact divisor chunks.
            auto_divisor_chunking=not is_pallas,
        )
        fn = ops_backend.make_backend(cfg)
        if self.mode == "inference" and state is not None:
            h, new_state = fn(qh, kh, vh, i_pre, f_pre, c_initial=state[0], n_initial=state[1])
        else:
            out = fn(qh, kh, vh, i_pre, f_pre)
            h, new_state = (out if isinstance(out, tuple) else (out, None))

        h = MultiHeadLayerNorm(
            num_heads=NH, head_dim=DH, use_bias=self.norm_bias, eps=1e-6, name="outnorm"
        )(h.astype(q.dtype))
        h = jnp.swapaxes(h, 1, 2).reshape(B, S, H)
        if state is not None:
            return h, new_state
        return h

    def _call_v2_bsh(self, q, k, v, i_pre, f_pre, state, cd, B, S, H, NH, DH):
        """Transpose-free v2 Pallas path: (B, S, H) in and out."""
        from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import (
            mlstm_siging_chunkwise_pallas_v2_bsh as kern,
        )

        qb, kb, vb = q.astype(cd), k.astype(cd), v.astype(cd)
        want_state = state is not None
        # measured on-chip (B8, NH12, S6400, bp=1, hoisted-causal body):
        # cs=640 4.53 ms < 800 4.72 < 1024 5.03 < 512 5.44 — the (L, L)
        # decay/P transients grow quadratically past L~640 and start
        # spilling, while smaller L pays more sequential grid steps.
        # Chunk size is numerics-neutral for the exact recurrence, so
        # upgrade long sequences: 640 when it divides S (no pad waste),
        # else 1024 (ragged-S pads to the chunk; measured note in
        # ops/wrappers.py).  L=1600 overflows the remote compiler VMEM.
        if S >= 4096 and self.chunk_size < 640:
            cs = 640 if S % 640 == 0 else 1024
        else:
            cs = self.chunk_size
        if self.mode == "inference" and self.fuse_outnorm:
            # fuse the outnorm epilogue into the kernel. Measured SLOWER
            # on v5e at the flagship shapes (200 vs 211 img/s e2e): the
            # per-head mean/var over DHHV=32 is a 32-lane reduction the
            # VPU handles worse than XLA's fused norm over the full
            # (B, S, NH, DH) — so this is opt-in, kept for shapes with
            # DH >= 128 where the tradeoff may flip.
            w, b = _MHLNParams(NH * DH, use_bias=self.norm_bias,
                               name="outnorm")()
            out = kern(
                qb, kb, vb, i_pre, f_pre, num_heads=NH,
                chunk_size=cs, eps=self.eps, compute_dtype=cd,
                c_initial=state[0] if want_state else None,
                n_initial=state[1] if want_state else None,
                return_last_states=want_state,
                ln_weight=1.0 + w, ln_bias=b,
            )
            h, new_state = out if want_state else (out, None)
            h = h.astype(q.dtype)
            if state is not None:
                return h, new_state
            return h
        out = kern(
            qb, kb, vb, i_pre, f_pre, num_heads=NH,
            chunk_size=cs, eps=self.eps, compute_dtype=cd,
            c_initial=state[0] if want_state else None,
            n_initial=state[1] if want_state else None,
            return_last_states=want_state,
        )
        h, new_state = out if want_state else (out, None)
        if self.defer_outnorm and not want_state:
            # hand the raw (B, S, H) kernel output + the outnorm params to
            # the caller's fused [norm -> skip -> proj_down] epilogue
            w, b = _MHLNParams(NH * DH, use_bias=self.norm_bias,
                               name="outnorm")()
            return h.astype(q.dtype), (w, b)
        h = MultiHeadLayerNorm(
            num_heads=NH, head_dim=DH, use_bias=self.norm_bias, eps=1e-6,
            data_format="BSND", name="outnorm",
        )(h.astype(q.dtype).reshape(B, S, NH, DH)).reshape(B, S, H)
        if state is not None:
            return h, new_state
        return h


class _MHLNParams(nn.Module):
    """Declares MultiHeadLayerNorm's params (same names/shapes/order)
    without running it — used when the norm is fused into the Pallas
    kernel epilogue; sharing ``name="outnorm"`` keeps checkpoints
    identical across fused/unfused paths."""

    n: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.zeros, (self.n,), f32)
        b = (self.param("bias", nn.initializers.zeros, (self.n,), f32)
             if self.use_bias else None)
        return w, b


# ifgate projection implementation: "concat" (Dense over concat([q,k,v]))
# or "split" (three sliced matmuls, no concat buffer) — param-compatible
# (same {"ifgate": {"kernel", "bias"}} tree); selected by env like DW_IMPL
IFGATE_IMPL = _os.environ.get("XY_IFGATE", "concat")

# fused [outnorm -> skip -> proj_down] training epilogue (custom VJP with
# a Pallas backward, ops/pallas/epilogue.py) — param-compatible.  Default
# ON: measured 164.67 -> 159.66 ms/step (+3.1%) on the flagship b8 train
# step, 4 interleaved rounds (scripts/exp_epilogue.py, r5).  XY_EPI_FUSE=0
# reverts to the plain XLA VJP path.
EPI_FUSE = _os.environ.get("XY_EPI_FUSE", "1") == "1"


# fused [ffn_norm -> FFN] training branch (custom VJP with a Pallas
# backward, ops/pallas/ffn.py) — param-compatible.  Default ON: measured
# 159.79 -> 158.79 ms/step median (fused faster in 4/4 interleaved
# rounds, scripts/exp_ffn_fuse.py r5, on top of the epilogue fusion).
# XY_FFN_FUSE=0 reverts to the plain XLA VJP path.
FFN_FUSE = _os.environ.get("XY_FFN_FUSE", "1") == "1"


class _RMSNormParams(nn.Module):
    """Declares RMSNorm's 'weight' (same name/shape/init) without
    running it — used when the norm folds into a fused branch."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("weight", nn.initializers.ones, (self.dim,), f32)


class _FFNParams(nn.Module):
    """Declares FeedForward's params (same scope/names/inits) without
    running it — shares name='ffn' so checkpoints are identical."""

    dim: int
    up: int
    use_bias: bool = True
    num_blocks: int = 1

    @nn.compact
    def __call__(self):
        wgz, bgz = _DenseParams(
            in_features=self.dim, features=2 * self.up,
            use_bias=self.use_bias, kernel_init=small_init(self.dim),
            name="proj_up_gate_z")()
        wd, bd = _DenseParams(
            in_features=self.up, features=self.dim, use_bias=self.use_bias,
            kernel_init=wang_init(self.dim, self.num_blocks),
            name="proj_down")()
        return wgz, bgz, wd, bd


class _DenseParams(nn.Module):
    """Declares an nn.Dense's params (same names/shapes/init) without
    running it — used when the dense is folded into a fused epilogue;
    sharing the name keeps checkpoints identical across paths."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        w = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features), f32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,), f32)
             if self.use_bias else None)
        return w, b


class _IfGateParams(nn.Module):
    """Declares the ifgate Dense's params (same names/shapes/init)."""

    num_heads: int
    in_features: int

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.zeros,
                       (self.in_features, 2 * self.num_heads), f32)
        b = self.param("bias", _ifgate_bias_init(self.num_heads),
                       (2 * self.num_heads,), f32)
        return w, b


def _ifgate_bias_init(num_heads: int) -> Callable:
    def init(key, shape, dtype=f32):
        assert shape == (2 * num_heads,)
        i_bias = jnp.full((num_heads,), -10.0, dtype)
        f_bias = jnp.linspace(3.0, 6.0, num_heads, dtype=dtype)
        return jnp.concatenate([i_bias, f_bias])

    return init


# ---------------------------------------------------------------------------
# ViLLayer / ViLBlock / ViLBlockPair
# ---------------------------------------------------------------------------


class ViLLayer(nn.Module):
    """One xLSTM vision layer (pre-norm mLSTM branch + pre-norm FFN branch).

    Parity: vision_lstm2.py:218-350 ("grok refactor no gated Z"):
      norm -> proj_up (dim -> 2*inner) -> split qk/v streams
      qk: depthwise SequenceConv2d + SiLU -> qk_proj -> split q, k
      v:  v_proj
      mlstm cell -> + learnable_skip * conv_act -> proj_down -> +residual
      ffn_norm -> FeedForward -> +residual
    Direction ``rowwise_from_bot_right`` flips the sequence before the
    branch and flips the branch output back.
    """

    dim: int
    direction: str = FORWARD
    expansion: int = 2
    qkv_block_size: int = 4
    proj_bias: bool = True
    norm_bias: bool = True
    conv_bias: bool = True
    conv_kernel_size: int = 3
    conv_kind: str = "2d"
    seqlens: Sequence[int] | None = None
    num_blocks: int = 1
    gate_soft_cap: float = 15.0
    ffn_proj_factor: float = 2.6667
    ffn_round_up_to: int = 64
    chunk_size: int = 64
    drop_path: float = 0.0
    training: bool = False
    mode: str | None = None  # override cell mode; default from training
    chunkwise_kernel: str = "chunkwise--native_autograd"
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dim = self.dim
        inner = self.expansion * dim
        nh = inner // self.qkv_block_size

        def mlstm_branch(xn):
            if self.direction == BACKWARD:
                xn = jnp.flip(xn, axis=1)
            x_inner = nn.Dense(
                2 * inner, use_bias=self.proj_bias, kernel_init=small_init(dim),
                dtype=self.compute_dtype, name="proj_up",
            )(xn)
            x_qk, x_v = jnp.split(x_inner, 2, axis=-1)
            if self.conv_kind == "2d":
                conv_out = SequenceConv2d(
                    dim=inner, kernel_size=self.conv_kernel_size,
                    seqlens=self.seqlens, use_bias=self.conv_bias,
                    dtype=self.compute_dtype, name="conv",
                )(x_qk)
            else:
                conv_out = x_qk
            x_qk_act = nn.silu(conv_out)
            qk = nn.Dense(
                2 * inner, use_bias=self.proj_bias, kernel_init=small_init(dim),
                dtype=self.compute_dtype, name="qk_proj",
            )(x_qk_act)
            q, k = jnp.split(qk, 2, axis=-1)
            v = nn.Dense(
                inner, use_bias=self.proj_bias, kernel_init=small_init(dim),
                dtype=self.compute_dtype, name="v_proj",
            )(x_v)

            # parity note: the reference cell routes BOTH train and eval
            # through its train_with_padding backend (vision_lstm2.py:708
            # picks self.cpu_backend/gpu_backend in every branch — the
            # *_infer backends are dead code).  We would match that, but
            # the batch-8 padded-eval program triggers a program-shape-
            # dependent fault in the current remote TPU runtime
            # (docs/KNOWN_ISSUES.md), while the segment-split inference
            # wrapper compiles a known-good program — so eval keeps the
            # wrapper for now.  Both pass the CPU goldens vs the torch
            # reference (numerics are chunking-invariant).
            mode = self.mode or ("train_with_padding" if self.training else "inference")
            # fused [outnorm -> skip -> proj_down] epilogue: forward math
            # identical (ops/pallas/epilogue.epilogue_forward), backward is
            # one Pallas kernel instead of ~2.8 ms/direction of XLA
            # elementwise VJPs at S=6400 (exp_layer_bwd r4). Train-only and
            # v2-kernel-only; eval programs are unchanged.
            S_tokens = xn.shape[1]
            fuse_epi = (
                EPI_FUSE and self.training
                and self.chunkwise_kernel.endswith("pallas_xl_chunk_siging_v2")
                and S_tokens >= 1024
            )
            cell_out = MatrixLSTMCell(
                dim=inner, num_heads=nh, chunk_size=self.chunk_size, mode=mode,
                gate_soft_cap=self.gate_soft_cap, norm_bias=self.norm_bias,
                chunkwise_kernel=self.chunkwise_kernel,
                compute_dtype=self.compute_dtype, defer_outnorm=fuse_epi,
                name="mlstm_cell",
            )(q, k, v)
            skip = self.param("learnable_skip", nn.initializers.ones, (inner,), f32)
            if fuse_epi and isinstance(cell_out, tuple):
                from xlstm_yolo_tpu.ops.pallas.epilogue import epilogue_fused

                h_raw, (ln_w, ln_b) = cell_out
                wd, bd = _DenseParams(
                    in_features=inner, features=dim, use_bias=self.proj_bias,
                    kernel_init=wang_init(dim, self.num_blocks),
                    name="proj_down")()
                if ln_b is None:
                    ln_b = jnp.zeros_like(ln_w)
                if bd is None:
                    bd = jnp.zeros((dim,), f32)
                out = epilogue_fused(h_raw, x_qk_act, ln_w, ln_b, skip,
                                     wd, bd, nh, 1e-6)
            else:
                h = cell_out
                h = h + skip.astype(h.dtype) * x_qk_act
                out = nn.Dense(
                    dim, use_bias=self.proj_bias, dtype=self.compute_dtype,
                    kernel_init=wang_init(dim, self.num_blocks), name="proj_down",
                )(h)
            if self.direction == BACKWARD:
                out = jnp.flip(out, axis=1)
            return out

        dp = DropPath(drop_prob=self.drop_path, training=self.training)
        xn = RMSNorm(dim, eps=1e-6, use_weight=self.norm_bias, name="norm")(x)
        x = dp(x, mlstm_branch(xn))
        fuse_ffn = (FFN_FUSE and self.training and self.norm_bias
                    and x.shape[1] >= 1024)
        if fuse_ffn:
            # fused [ffn_norm -> gate/z -> silu*z -> down] custom VJP
            # (ops/pallas/ffn.py) — forward math identical, backward is
            # one Pallas kernel; param tree unchanged
            from xlstm_yolo_tpu.ops.pallas.ffn import ffn_fused

            wn = _RMSNormParams(dim, name="ffn_norm")()
            up = int(((dim * self.ffn_proj_factor + self.ffn_round_up_to - 1)
                      // self.ffn_round_up_to) * self.ffn_round_up_to)
            wgz, bgz, wd2, bd2 = _FFNParams(
                dim=dim, up=up, use_bias=self.proj_bias,
                num_blocks=self.num_blocks, name="ffn")()
            if bgz is None:
                bgz = jnp.zeros((2 * up,), f32)
            if bd2 is None:
                bd2 = jnp.zeros((dim,), f32)
            ffn_out = ffn_fused(x, wn, wgz, bgz, wd2, bd2, 1e-6)
        else:
            xf = RMSNorm(dim, eps=1e-6, use_weight=self.norm_bias,
                         name="ffn_norm")(x)
            ffn_out = FeedForward(
                dim=dim, proj_factor=self.ffn_proj_factor,
                round_up_to=self.ffn_round_up_to, use_bias=self.proj_bias,
                num_blocks=self.num_blocks, dtype=self.compute_dtype,
                name="ffn",
            )(xf)
        dp2 = DropPath(drop_prob=self.drop_path, training=self.training)
        return dp2(x, ffn_out)


class ViLBlock(nn.Module):
    """Thin wrapper (parity: vision_lstm2.py:517-558)."""

    dim: int
    direction: str
    drop_path: float = 0.0
    conv_kind: str = "2d"
    conv_kernel_size: int = 3
    proj_bias: bool = True
    norm_bias: bool = True
    seqlens: Sequence[int] | None = None
    num_blocks: int = 1
    chunk_size: int = 256
    qkv_block_size: int = 4
    training: bool = False
    chunkwise_kernel: str = "chunkwise--native_autograd"
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return ViLLayer(
            dim=self.dim, direction=self.direction, drop_path=self.drop_path,
            conv_kind=self.conv_kind, conv_kernel_size=self.conv_kernel_size,
            proj_bias=self.proj_bias, norm_bias=self.norm_bias,
            seqlens=self.seqlens, num_blocks=self.num_blocks,
            chunk_size=self.chunk_size, qkv_block_size=self.qkv_block_size,
            training=self.training, chunkwise_kernel=self.chunkwise_kernel,
            compute_dtype=self.compute_dtype, name="layer",
        )(x)


class ViLBlockPair(nn.Module):
    """Forward traversal block + flipped traversal block.

    Parity: vision_lstm2.py:1014-1079, including activation checkpointing
    (jax.checkpoint / nn.remat) for long sequences (S >= 80*80) during
    training — the TPU analog of torch.utils.checkpoint at the same
    threshold.
    """

    dim: int
    drop_path: float = 0.0
    conv_kind: str = "2d"
    conv_kernel_size: int = 3
    proj_bias: bool = True
    norm_bias: bool = True
    seqlens: Sequence[int] | None = None
    num_blocks: int = 1
    chunk_size: int = 256
    qkv_block_size: int = 4
    training: bool = False
    ckpt_thresh: int = 80 * 80
    chunkwise_kernel: str = "chunkwise--native_autograd"
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        S = x.shape[1]
        kw = dict(
            dim=self.dim, drop_path=self.drop_path, conv_kind=self.conv_kind,
            conv_kernel_size=self.conv_kernel_size, proj_bias=self.proj_bias,
            norm_bias=self.norm_bias, seqlens=self.seqlens,
            num_blocks=self.num_blocks, chunk_size=self.chunk_size,
            qkv_block_size=self.qkv_block_size, training=self.training,
            chunkwise_kernel=self.chunkwise_kernel, compute_dtype=self.compute_dtype,
        )
        block_cls = ViLBlock
        # XY_CKPT_THRESH trades HBM for backward time: remat recomputes the
        # block in the VJP, so raising the threshold (when activations fit)
        # removes a full extra forward of the longest stage from the
        # backward pass. Measurement knob (scripts/exp_remat.py).
        thresh = int(_os.environ.get("XY_CKPT_THRESH", self.ckpt_thresh))
        if self.training and S >= thresh:
            block_cls = nn.remat(ViLBlock)
        x = block_cls(direction=FORWARD, name="rowwise_from_top_left", **kw)(x)
        x = block_cls(direction=BACKWARD, name="rowwise_from_bot_right", **kw)(x)
        return x
