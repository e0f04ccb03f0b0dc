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
