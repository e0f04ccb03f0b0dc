"""ViL component long tail: headwise layers, 3d conv, fusion MLP zoo,
hierarchical ViL.

TPU re-designs of the reference's experimental/auxiliary ViL modules:
- LinearHeadwiseExpand (ref:vision_lstm2.py:790-833) — block-diagonal
  per-head projection, expressed as one einsum so XLA batches the small
  matmuls.
- SequenceConv3d (ref:vision_lstm_util.py:117-136) — (B, S, D) sequence
  viewed as a (d, h, w) voxel grid, depthwise 3-D conv, flattened back.
- fusion MLP zoo (ref:fusion_vil.py:11-110): MLPBaseline, GEGLU, SwiGLU,
  ConvMLP, LoRAMLP, MLPMixer — the RGBlock/LSBlock members live in
  nn/blocks.py where the shipped configs use them.
- hierarchical ViL (ref:vision_lstm_hierarchical.py:44-320): PatchMerge,
  MultiScaleFusion, HierarchicalVisionLSTM.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlstm_yolo_tpu.nn.layers import ViLBlockPair, VitPatchEmbed, VitPosEmbed2d

f32 = jnp.float32


class LinearHeadwiseExpand(nn.Module):
    """Per-head structured projection (block-diagonal weight).

    Parity: ref:vision_lstm2.py:790-833 — weight (NH, d_out, d_in) with
    N(0, sqrt(2/5/d_in)) init, optional bias.
    """

    dim: int
    num_heads: int
    expand_factor: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):  # (..., dim)
        NH = self.num_heads
        d_in = self.dim // NH
        d_out = d_in * self.expand_factor
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=math.sqrt(2 / 5 / d_in)),
            (NH, d_out, d_in), f32,
        )
        xh = x.reshape(*x.shape[:-1], NH, d_in)
        y = jnp.einsum("...nd,nod->...no", xh.astype(f32), w)
        y = y.reshape(*x.shape[:-1], NH * d_out)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (NH * d_out,), f32)
            y = y + b
        return y.astype(x.dtype)


class SequenceConv3d(nn.Module):
    """(B, S, D) -> voxel grid (d, h, w) -> depthwise conv3d -> flatten."""

    dim: int
    kernel_size: int = 3
    seqlens: Sequence[int] | None = None  # (d, h, w)

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        if self.seqlens is None:
            d = round(S ** (1 / 3))
            assert d ** 3 == S, "sequence length must be a perfect cube"
            dims = (d, d, d)
        else:
            dims = tuple(self.seqlens)
        g = x.reshape(B, *dims, D)
        k = self.kernel_size
        g = nn.Conv(
            D, (k, k, k), padding="SAME", feature_group_count=D, name="conv"
        )(g)
        return g.reshape(B, S, D)


# ---------------------------------------------------------------------------
# fusion MLP zoo (ref:fusion_vil.py)
# ---------------------------------------------------------------------------


class MLPBaseline(nn.Module):
    dim: int
    hidden_dim: int | None = None

    @nn.compact
    def __call__(self, x):
        h = self.hidden_dim or self.dim * 4
        y = nn.Dense(h, name="fc1")(x)
        return nn.Dense(self.dim, name="fc2")(nn.gelu(y))


class GEGLU(nn.Module):
    dim: int
    hidden_dim: int | None = None

    @nn.compact
    def __call__(self, x):
        h = self.hidden_dim or self.dim * 4
        a, b = jnp.split(nn.Dense(2 * h, name="fc")(x), 2, axis=-1)
        return nn.Dense(self.dim, name="proj")(nn.gelu(a) * b)


class SwiGLU(nn.Module):
    dim: int
    hidden_dim: int | None = None

    @nn.compact
    def __call__(self, x):
        h = self.hidden_dim or self.dim * 4
        a, b = jnp.split(nn.Dense(2 * h, name="fc")(x), 2, axis=-1)
        return nn.Dense(self.dim, name="proj")(nn.silu(a) * b)


class ConvMLP(nn.Module):
    """1x1 -> depthwise 3x3 -> 1x1 conv MLP on NHWC maps."""

    dim: int
    hidden_dim: int | None = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        h = self.hidden_dim or self.dim * 4
        y = nn.gelu(nn.Conv(h, (1, 1), name="fc1")(x))
        y = nn.gelu(nn.Conv(h, (3, 3), padding="SAME", feature_group_count=h,
                            name="dwconv")(y))
        return nn.Conv(self.dim, (1, 1), name="fc2")(y)


class LoRAMLP(nn.Module):
    dim: int
    rank: int = 16

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Dense(self.rank, name="down")(x))
        return nn.Dense(self.dim, name="up")(y)


class MLPMixer(nn.Module):
    """Token-mix + channel-mix (ref:fusion_vil.py:80-110)."""

    dim: int
    num_tokens: int
    hidden_dim: int | None = None

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        h = self.hidden_dim or self.dim * 4
        t = jnp.swapaxes(x, 1, 2)  # (B, D, N)
        t = nn.Dense(self.num_tokens, name="token_fc2")(
            nn.gelu(nn.Dense(self.num_tokens * 2, name="token_fc1")(t))
        )
        x = x + jnp.swapaxes(t, 1, 2)
        y = nn.Dense(self.dim, name="chan_fc2")(
            nn.gelu(nn.Dense(h, name="chan_fc1")(x))
        )
        return x + y


# ---------------------------------------------------------------------------
# hierarchical ViL (ref:vision_lstm_hierarchical.py)
# ---------------------------------------------------------------------------


class PatchMerge(nn.Module):
    """Merge ``merge_factor``^2 neighbouring tokens -> linear proj + LN
    (parity: ref:vision_lstm_hierarchical.py:44-67)."""

    input_seqlens: Sequence[int]
    merge_factor: int = 2
    out_dim: int | None = None

    @nn.compact
    def __call__(self, x):  # (B, H*W, C)
        B, N, C = x.shape
        H, W = self.input_seqlens
        m = self.merge_factor
        out = self.out_dim or C * m * m
        g = x.reshape(B, H // m, m, W // m, m, C)
        g = g.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // m) * (W // m), m * m * C)
        g = nn.Dense(out, name="proj")(g)
        return nn.LayerNorm(name="norm")(g)


class MultiScaleFusion(nn.Module):
    """Pool the high-res branch, broadcast over low-res tokens, concat,
    project (parity: ref:vision_lstm_hierarchical.py:70-110)."""

    fused_dim: int

    @nn.compact
    def __call__(self, high_res, low_res):
        B, N_low, _ = low_res.shape
        pooled = high_res.mean(axis=1, keepdims=True)  # (B, 1, D1)
        expanded = jnp.broadcast_to(pooled, (B, N_low, pooled.shape[-1]))
        return nn.Dense(self.fused_dim, name="fusion_proj")(
            jnp.concatenate([expanded, low_res], axis=-1)
        )


class HierarchicalVisionLSTM(nn.Module):
    """Patch embed -> groups of (local ViL pairs -> PatchMerge -> proj)
    with multi-scale fusion; classifier or feature mode.

    Parity: ref:vision_lstm_hierarchical.py:224-320 (structure; the
    reference module is experimental and unused by the shipped configs).
    """

    resolution: Sequence[int] = (224, 224)
    patch_size: int = 16
    base_dim: int = 192
    num_groups: int = 3
    local_depth: int = 2
    merge_factor: int = 2
    num_classes: int | None = 1000
    training: bool = False
    chunkwise_kernel: str = "chunkwise--native_autograd"

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        D = self.base_dim
        y = VitPatchEmbed(dim=D, patch_size=(self.patch_size,) * 2, name="patch_embed")(x)
        y = VitPosEmbed2d(seqlens=y.shape[1:3], dim=D, name="pos_embed")(y)
        B = y.shape[0]
        seq = (y.shape[1], y.shape[2])
        y = y.reshape(B, -1, D)
        feats = []
        for gi in range(self.num_groups):
            for li in range(self.local_depth):
                y = ViLBlockPair(
                    dim=D, seqlens=seq, chunk_size=min(64, y.shape[1]),
                    qkv_block_size=min(32, D), training=self.training,
                    chunkwise_kernel=self.chunkwise_kernel,
                    name=f"group{gi}_pair{li}",
                )(y)
            feats.append(y)
            if gi < self.num_groups - 1 and min(seq) > self.merge_factor:
                y = PatchMerge(input_seqlens=seq, merge_factor=self.merge_factor,
                               out_dim=D, name=f"merge{gi}")(y)
                seq = (seq[0] // self.merge_factor, seq[1] // self.merge_factor)
        fused = MultiScaleFusion(fused_dim=D, name="fusion")(feats[0], y)
        if self.num_classes is None:
            return fused
        pooled = fused.mean(axis=1)
        return nn.Dense(self.num_classes, name="head")(pooled)


class MLSTMLayerVision(nn.Module):
    """Vision mLSTM layer of the dormant ``mlstm_large`` family.

    Parity: ref:nn/modules/vision_lstm/mlstm_large.py:135-345
    (mLSTMLayerVision, weight_mode="single"): a FULL (non-depthwise)
    SequenceConv2d feeds silu-activated q/k projections, v/o-gate
    project from x directly, i/f gates are soft-capped per head, the
    cell runs the exp-input-gate chunkwise backend, per-head layernorm,
    sigmoid output gate, and the out projection. Not instantiated by
    any shipped config (vision_lstm2 imports it but ViLBlock uses
    ViLLayer) — implemented for component completeness.
    """

    dim: int
    num_heads: int
    qk_dim_factor: float = 0.5
    v_dim_factor: float = 1.0
    gate_soft_cap: float = 15.0
    use_bias: bool = False
    chunk_size: int = 64
    seqlens: Sequence[int] | None = None
    training: bool = False
    chunkwise_kernel: str = "chunkwise--native_stablef"  # exp gate, m-state

    @nn.compact
    def __call__(self, x):
        from xlstm_yolo_tpu.nn.layers import (
            MultiHeadLayerNorm, SequenceConv2d, soft_cap,
        )
        from xlstm_yolo_tpu.ops import backend as ops_backend

        B, S, D = x.shape
        NH = self.num_heads
        v_dim = int(D * self.v_dim_factor)
        qk_dim = int(D * self.qk_dim_factor)

        conv_out = SequenceConv2d(
            dim=D, out_dim=v_dim, kernel_size=3, seqlens=self.seqlens,
            use_bias=True, groups=1, name="conv",
        )(x)
        act_conv = nn.silu(conv_out)
        q = nn.Dense(qk_dim, use_bias=self.use_bias, name="q")(act_conv)
        k = nn.Dense(qk_dim, use_bias=self.use_bias, name="k")(act_conv)
        v = nn.Dense(v_dim, use_bias=self.use_bias, name="v")(x)
        o_preact = nn.Dense(v_dim, use_bias=self.use_bias, name="ogate_preact")(x)
        i_preact = soft_cap(
            nn.Dense(NH, use_bias=True, name="igate_preact")(x), self.gate_soft_cap)
        f_preact = soft_cap(
            nn.Dense(NH, use_bias=True, name="fgate_preact")(x), self.gate_soft_cap)

        def heads(t):  # (B, S, NH*dh) -> (B, NH, S, dh)
            return t.reshape(B, S, NH, -1).transpose(0, 2, 1, 3)

        backend = ops_backend.make_backend(ops_backend.mLSTMBackendConfig(
            chunkwise_kernel=self.chunkwise_kernel,
            mode="train" if self.training else "train_with_padding",
            chunk_size=self.chunk_size,
        ))
        h = backend(heads(q), heads(k), heads(v),
                    i_preact.transpose(0, 2, 1), f_preact.transpose(0, 2, 1))
        h = MultiHeadLayerNorm(
            num_heads=NH, head_dim=v_dim // NH, use_weight=True,
            use_bias=self.use_bias, name="multihead_norm",
        )(h)
        h = h.transpose(0, 2, 1, 3).reshape(B, S, v_dim)
        h = h * nn.sigmoid(o_preact)
        return nn.Dense(D, use_bias=self.use_bias, name="out_proj")(h)


class VilLayerUpdated(nn.Module):
    """Directional pre-norm block around MLSTMLayerVision + FFN.

    Parity: ref:nn/modules/vision_lstm/mlstm_large.py:366-485
    (mLSTMBlock wiring + the VilLayerUpdated traversal flip).
    """

    dim: int
    num_heads: int
    direction: str = "rowwise_from_top_left"  # or rowwise_from_bot_right
    ffn_proj_factor: float = 2.6667
    ffn_round_up_to: int = 64
    seqlens: Sequence[int] | None = None
    training: bool = False

    @nn.compact
    def __call__(self, x):
        from xlstm_yolo_tpu.nn.layers import FeedForward, RMSNorm

        flip = self.direction == "rowwise_from_bot_right"
        if flip:
            x = x[:, ::-1]
        y = x + MLSTMLayerVision(
            dim=self.dim, num_heads=self.num_heads, seqlens=self.seqlens,
            training=self.training, name="mlstm_layer",
        )(RMSNorm(self.dim, name="norm_mlstm")(x))
        y = y + FeedForward(
            dim=self.dim, proj_factor=self.ffn_proj_factor,
            round_up_to=self.ffn_round_up_to, name="ffn",
        )(RMSNorm(self.dim, name="norm_ffn")(y))
        if flip:
            y = y[:, ::-1]
        return y
