"""YAML-facing building blocks (conv zoo + ViL wrapper blocks), NHWC.

Functional re-design of the blocks the shipped ``640-base*.yaml`` graphs
use (ref:ultralytics/nn/modules/block.py:1649-2466, conv.py:37-130) plus
the standard conv zoo needed by generic YOLO yamls.  All image tensors
are NHWC; ``Concat`` therefore concatenates on axis=-1 where the torch
reference uses dim=1.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlstm_yolo_tpu.nn.layers import (
    resolve_seqlens,
    RMSNorm,
    SequenceConv2d,
    ViLBlockPair,
    VitPatchEmbed,
    VitPosEmbed2d,
    f32,
)


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same'-style padding for odd kernels (parity: conv.py:29-34)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


# Depthwise-3x3 implementation selector. XLA lowers depthwise convs
# (feature_group_count == C) to grouped convolution, which runs on the
# VPU; the shift9 formulation (9 shifted FMAs over padded slices) is a
# numerically identical alternative XLA can fuse into one elementwise
# pass. "auto" currently resolves to grouped everywhere; flip per
# measurement (scripts/exp_dwconv.py) once the TPU comparison lands.
import os as _os

DW_IMPL = _os.environ.get("XY_DW_IMPL", "auto")


def _dw_impl() -> str:
    if DW_IMPL != "auto":
        return DW_IMPL
    return "grouped"


class DWConv3x3Shift9(nn.Module):
    """Stride-1 depthwise 3x3 conv as 9 shifted FMAs.

    Param-compatible with ``nn.Conv(features=C, kernel_size=(3, 3),
    feature_group_count=C)``: one ``kernel`` of shape (3, 3, 1, C)
    (lecun-normal, flax default) and optional ``bias`` (C,), so
    checkpoints and the torch converter see the identical tree.
    Accumulates in f32 and casts to ``dtype`` on the way out.
    """

    features: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        C = self.features
        assert x.shape[-1] == C, f"depthwise needs C_in == C_out ({x.shape[-1]} vs {C})"
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, 1, C))
        cd = self.dtype or x.dtype
        xp = jnp.pad(x.astype(cd), ((0, 0), (1, 1), (1, 1), (0, 0)))
        kd = kernel.astype(cd)
        B, H, W, _ = x.shape
        out = jnp.zeros((B, H, W, C), f32)
        for dy in range(3):
            for dx in range(3):
                out = out + xp[:, dy : dy + H, dx : dx + W, :].astype(f32) * kd[dy, dx, 0].astype(f32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (C,))
            out = out + bias.astype(f32)
        return out.astype(cd)


class ConvBNAct(nn.Module):
    """Conv2d + BatchNorm + activation — the ultralytics ``Conv`` block.

    Parity: conv.py:37-56.  BN hyperparams follow the ultralytics
    initialize_weights override (eps=1e-3, torch momentum 0.03 ->
    flax momentum 0.97).  NHWC.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: str | None = "silu"  # silu | gelu | relu | None
    training: bool = False
    dtype: Any = None
    fused: bool = False  # conv carries folded-BN bias; BN op skipped (eval only)

    @nn.compact
    def __call__(self, x):
        assert not (self.fused and self.training), "fused conv is eval-only"
        pad = autopad(self.k, self.p, self.d)
        if (self.k == 3 and self.s == 1 and self.d == 1
                and self.g == x.shape[-1] == self.c2
                and _dw_impl() == "shift9"):
            y = DWConv3x3Shift9(
                self.c2, use_bias=self.fused, dtype=self.dtype, name="conv")(x)
        else:
            y = nn.Conv(
                self.c2,
                (self.k, self.k),
                strides=(self.s, self.s),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=self.g,
                kernel_dilation=(self.d, self.d),
                use_bias=self.fused,
                dtype=self.dtype,
                name="conv",
            )(x)
        if not self.fused:
            y = nn.BatchNorm(
                use_running_average=not self.training,
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
                name="bn",
            )(y)
        return _act(y, self.act)


def _act(y, act: str | None):
    if act == "silu":
        return nn.silu(y)
    if act == "gelu":
        return nn.gelu(y)
    if act == "relu":
        return nn.relu(y)
    return y


class DWConvBlock(ConvBNAct):
    """Depthwise conv block (parity: conv.py:102-108)."""

    @nn.compact
    def __call__(self, x):
        assert not (self.fused and self.training), "fused conv is eval-only"
        g = math.gcd(x.shape[-1], self.c2)
        pad = autopad(self.k, self.p, self.d)
        y = nn.Conv(
            self.c2, (self.k, self.k), strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)], feature_group_count=g,
            kernel_dilation=(self.d, self.d), use_bias=self.fused, dtype=self.dtype,
            name="conv",
        )(x)
        if not self.fused:
            y = nn.BatchNorm(
                use_running_average=not self.training, momentum=0.97, epsilon=1e-3,
                dtype=self.dtype, name="bn",
            )(y)
        return _act(y, self.act)


def upsample_nearest(x, scale: int = 2):
    """NHWC nearest-neighbour upsample (torch nn.Upsample parity)."""
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)


def concat_channels(xs: Sequence[jax.Array]) -> jax.Array:
    """Concat on channels; torch dim=1 (NCHW) == NHWC axis -1."""
    return jnp.concatenate(xs, axis=-1)


# ---------------------------------------------------------------------------
# ViL wrapper blocks used by the shipped configs
# ---------------------------------------------------------------------------


class VitPatchEmbedBlock(nn.Module):
    """YAML wrapper for VitPatchEmbed (parity: block.py:1713-1766).

    Input NHWC image, output flattened sequence (B, S, dim) — the
    reference keeps the (B, H', W', dim) grid and lets the next block
    flatten; we flatten here and let VitPosEmbedBlock reshape, which is
    layout-equivalent.
    """

    dim: int
    resolution: Sequence[int]
    patch_size: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = VitPatchEmbed(dim=self.dim, patch_size=tuple(self.patch_size), dtype=self.dtype, name="module")(x)
        B, H, W, D = y.shape
        return y  # keep grid; pos-embed block consumes grid


class VitPosEmbedBlock(nn.Module):
    """YAML wrapper for VitPosEmbed2d (parity: block.py:1772-1816)."""

    dim: int
    seqlens: Sequence[int]

    @nn.compact
    def __call__(self, x):
        y = VitPosEmbed2d(seqlens=tuple(self.seqlens), dim=self.dim, name="module")(x)
        B = y.shape[0]
        return y.reshape(B, -1, self.dim)  # flatten to (B, S, D) for ViL blocks


class ViLBlockPairBlock(nn.Module):
    """YAML wrapper for ViLBlockPair (parity: block.py:1884-1971)."""

    dim: int
    seqlens: Sequence[int]
    chunk_size: int = 256
    qkv_block_size: int = 16
    conv_kind: str = "2d"
    conv_kernel_size: int = 3
    proj_bias: bool = True
    norm_bias: bool = True
    drop_path: float = 0.0
    num_blocks: int = 1
    training: bool = False
    chunkwise_kernel: str = "chunkwise--native_autograd"
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:  # grid input -> flatten
            B, H, W, D = x.shape
            x = x.reshape(B, H * W, D)
        return ViLBlockPair(
            dim=self.dim, drop_path=self.drop_path, conv_kind=self.conv_kind,
            conv_kernel_size=self.conv_kernel_size, proj_bias=self.proj_bias,
            norm_bias=self.norm_bias, seqlens=tuple(self.seqlens),
            num_blocks=self.num_blocks, chunk_size=self.chunk_size,
            qkv_block_size=self.qkv_block_size, training=self.training,
            chunkwise_kernel=self.chunkwise_kernel,
            compute_dtype=self.compute_dtype, name="module",
        )(x)


class SequenceToImage(nn.Module):
    """(B, S, D) -> (B, H, W, D) NHWC image (parity: block.py:1974-2021;
    the reference emits NCHW — NHWC is the TPU-native equivalent and all
    downstream blocks here consume NHWC)."""

    seqlens: Sequence[int]

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        h, w = resolve_seqlens(S, self.seqlens)
        return x.reshape(B, h, w, D)


class PatchMerger(nn.Module):
    """Learned-query cross-attention token pooling.

    Parity: the *active* PatchMerger definition (block.py:2450-2461):
    LayerNorm -> sim = queries @ x^T * dim^-0.5 -> softmax over tokens ->
    out = attn @ x.  Queries init ~ N(0, 1) like torch.randn.
    """

    dim: int
    num_tokens_out: int
    # base input token count (set by the parser): with multi-scale
    # inputs (N != base) the learned query set is treated as its
    # sqrt(M) x sqrt(M) grid and bicubic-resized so the pooling ratio —
    # and hence every downstream FPN grid — scales with the input
    # (the pos-embed interpolation idea applied to the queries)
    base_tokens_in: int | None = None

    @nn.compact
    def __call__(self, x):  # (B, N, D) -> (B, M, D)
        # operands in the input dtype (bf16 in-model), f32 accumulation —
        # the LayerNorm otherwise promotes the whole block to f32 dots
        xn = nn.LayerNorm(name="norm")(x).astype(x.dtype)
        queries = self.param(
            "queries", nn.initializers.normal(stddev=1.0),
            (self.num_tokens_out, self.dim), f32,
        )
        N = x.shape[1]
        if self.base_tokens_in and N != self.base_tokens_in:
            r2 = N / self.base_tokens_in
            m_new = int(round(self.num_tokens_out * r2))
            g0 = int(round(math.sqrt(self.num_tokens_out)))
            g1 = int(round(math.sqrt(m_new)))
            assert g0 * g0 == self.num_tokens_out and g1 * g1 == m_new, (
                f"PatchMerger multi-scale needs square query grids: "
                f"M={self.num_tokens_out}, scaled M'={m_new}"
            )
            queries = jax.image.resize(
                queries.reshape(g0, g0, self.dim), (g1, g1, self.dim), "bicubic"
            ).reshape(m_new, self.dim)
        sim = jnp.einsum(
            "md,bnd->bmn", queries.astype(xn.dtype), xn, preferred_element_type=f32
        ) * (self.dim**-0.5)
        attn = jax.nn.softmax(sim, axis=-1)
        return jnp.einsum(
            "bmn,bnd->bmd", attn.astype(xn.dtype), xn, preferred_element_type=f32
        ).astype(x.dtype)


class LSBlock(nn.Module):
    """Local spatial block: dw3x3 + BN -> 1x1 + GELU -> 1x1, residual.

    Parity: block.py:2172-2193.  NHWC.
    """

    dim: int
    training: bool = False
    dtype: Any = None
    fused: bool = False  # fc1 carries the folded-BN bias; norm skipped

    @nn.compact
    def __call__(self, x):
        assert not (self.fused and self.training), "fused conv is eval-only"
        y = nn.Conv(
            self.dim, (3, 3), padding="SAME", feature_group_count=self.dim,
            dtype=self.dtype, name="fc1",
        )(x)
        if not self.fused:
            y = nn.BatchNorm(
                use_running_average=not self.training, momentum=0.97, epsilon=1e-3,
                dtype=self.dtype, name="norm",
            )(y)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(y)
        y = nn.gelu(y)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc3")(y)
        return x + y


class RGBlock(nn.Module):
    """Gated conv MLP: 1x1 -> split (x, v); gelu(dw3x3(x) + x) * v -> 1x1.

    Parity: block.py:2149-2170.  hidden = 2 * (dim * mlp_ratio) / 3.
    """

    dim: int
    hidden_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        local = int(2 * self.hidden_dim / 3)
        y = nn.Conv(local * 2, (1, 1), dtype=self.dtype, name="fc1")(x)
        a, v = jnp.split(y, 2, axis=-1)
        a = nn.gelu(
            nn.Conv(local, (3, 3), padding="SAME", feature_group_count=local,
                    dtype=self.dtype, name="dwconv")(a)
            + a
        )
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(a * v)


class ViLFusionBlock(nn.Module):
    """FPN fusion block: 1x1 in_proj + LSBlock + RMSNorm + ViLBlockPair + RGBlock.

    Parity: block.py:2367-2447.  NHWC in/out.
    """

    c1: int
    dim: int
    seqlens: Sequence[int]
    chunk_size: int = 256
    qkv_block_size: int = 16
    mlp_ratio: float = 4.0
    n: int = 1
    drop_path: float = 0.0
    conv_kind: str = "2d"
    training: bool = False
    chunkwise_kernel: str = "chunkwise--native_autograd"
    compute_dtype: Any = None
    fused: bool = False  # in_proj/LSBlock convs carry folded-BN biases

    @nn.compact
    def __call__(self, x):
        assert not (self.fused and self.training), "fused conv is eval-only"
        if self.c1 != self.dim:
            x = nn.Conv(self.dim, (1, 1), use_bias=self.fused, dtype=self.compute_dtype,
                        name="in_proj_conv")(x)
            if not self.fused:
                x = nn.BatchNorm(
                    use_running_average=not self.training, momentum=0.97, epsilon=1e-3,
                    dtype=self.compute_dtype, name="in_proj_bn",
                )(x)
            x = nn.silu(x)

        x_local = LSBlock(dim=self.dim, training=self.training, fused=self.fused,
                          dtype=self.compute_dtype, name="lsblock")(x)

        B, H, W, C = x_local.shape
        seq = x_local.reshape(B, H * W, C)
        seq_norm = RMSNorm(self.dim, eps=1e-3, name="norm")(seq)
        y = seq_norm
        for idx in range(self.n):
            y = ViLBlockPairBlock(
                dim=self.dim, seqlens=self.seqlens, chunk_size=self.chunk_size,
                qkv_block_size=self.qkv_block_size, conv_kind=self.conv_kind,
                drop_path=self.drop_path, training=self.training,
                chunkwise_kernel=self.chunkwise_kernel,
                compute_dtype=self.compute_dtype, name=f"vil_{idx}",
            )(y)
        seq = seq + y  # drop_path is identity at the shipped drop_prob=0
        x_global = seq.reshape(B, H, W, C)
        x = x + x_global

        # MLP branch (RGBlock) on the fused map
        if self.mlp_ratio > 0:
            xn = RMSNorm(self.dim, eps=1e-6, name="norm2")(x.reshape(B, H * W, C))
            xm = RGBlock(
                dim=self.dim, hidden_dim=int(self.dim * self.mlp_ratio),
                dtype=self.compute_dtype, name="mlp"
            )(xn.reshape(B, H, W, C))
            x = x + xm
        return x


class SimpleStem(nn.Module):
    """Two stride-2 convs stem (parity: block.py:2211-2229). NHWC out."""

    embed_dim: int
    ks: int = 3
    training: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = self.embed_dim // 2
        y = ConvBNAct(hidden, self.ks, 2, act="gelu", training=self.training, name="conv1")(x)
        y = ConvBNAct(self.embed_dim, self.ks, 2, act="silu", training=self.training, name="conv2")(y)
        return y


class VisionClueMerge(nn.Module):
    """Space-to-depth merge then 1x1 conv (used by XSS-style configs).

    Parity: block.py:2080-2100 — stacks the four pixel-phase subgrids
    channel-wise then projects to c2 with Conv+BN+SiLU.
    """

    c2: int
    training: bool = False

    @nn.compact
    def __call__(self, x):
        y = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return ConvBNAct(self.c2, 1, 1, training=self.training, name="pw")(y)


# ---------------------------------------------------------------------------
# standard YOLO conv zoo (subset used by common yamls)
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    """Standard bottleneck (parity: block.py Bottleneck)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5
    training: bool = False

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(c_, self.k[0], 1, training=self.training, name="cv1")(x)
        y = ConvBNAct(self.c2, self.k[1], 1, g=self.g, training=self.training, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C2f(nn.Module):
    """Cross-stage partial with 2 convs (parity: block.py C2f)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    training: bool = False

    @nn.compact
    def __call__(self, x):
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, training=self.training, name="cv1")(x)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            parts.append(
                Bottleneck(
                    c, self.shortcut, self.g, k=(3, 3), e=1.0,
                    training=self.training, name=f"m_{i}",
                )(parts[-1])
            )
        return ConvBNAct(self.c2, 1, 1, training=self.training, name="cv2")(
            jnp.concatenate(parts, axis=-1)
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast) (parity: block.py SPPF)."""

    c2: int
    k: int = 5
    training: bool = False

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        y = ConvBNAct(c_, 1, 1, training=self.training, name="cv1")(x)
        pad = self.k // 2
        pool = lambda t: nn.max_pool(
            t, (self.k, self.k), strides=(1, 1), padding=[(pad, pad), (pad, pad)]
        )
        y1 = pool(y)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBNAct(self.c2, 1, 1, training=self.training, name="cv2")(
            jnp.concatenate([y, y1, y2, y3], axis=-1)
        )


class C3(nn.Module):
    """CSP bottleneck with 3 convs (parity: block.py C3)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    training: bool = False

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, training=self.training, name="cv1")(x)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0,
                           training=self.training, name=f"m_{i}")(a)
        b = ConvBNAct(c_, 1, 1, training=self.training, name="cv2")(x)
        return ConvBNAct(self.c2, 1, 1, training=self.training, name="cv3")(
            jnp.concatenate([a, b], axis=-1)
        )


class C3k(C3):
    """C3 with configurable bottleneck kernel (parity: block.py C3k)."""

    k: int = 3

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, training=self.training, name="cv1")(x)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(self.k, self.k), e=1.0,
                           training=self.training, name=f"m_{i}")(a)
        b = ConvBNAct(c_, 1, 1, training=self.training, name="cv2")(x)
        return ConvBNAct(self.c2, 1, 1, training=self.training, name="cv3")(
            jnp.concatenate([a, b], axis=-1)
        )


class C3k2(nn.Module):
    """Faster CSP with optional C3k inner blocks (parity: block.py C3k2)."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    training: bool = False

    @nn.compact
    def __call__(self, x):
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, training=self.training, name="cv1")(x)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            if self.c3k:
                parts.append(C3k(c2=c, n=2, shortcut=self.shortcut, g=self.g,
                                 training=self.training, name=f"m_{i}")(parts[-1]))
            else:
                parts.append(Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5,
                                        training=self.training, name=f"m_{i}")(parts[-1]))
        return ConvBNAct(self.c2, 1, 1, training=self.training, name="cv2")(
            jnp.concatenate(parts, axis=-1)
        )


# ---------------------------------------------------------------------------
# conv zoo long tail (parity: ref:nn/modules/conv.py + block.py)
# ---------------------------------------------------------------------------


class Focus(nn.Module):
    """Space-to-depth stem: 2x2 pixel de-interleave -> conv
    (parity: conv.py:139-156).  NHWC."""

    c2: int
    k: int = 1
    s: int = 1
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return ConvBNAct(self.c2, self.k, self.s, training=self.training,
                         dtype=self.dtype, name="conv")(y)


class GhostConv(nn.Module):
    """Primary conv + cheap depthwise 5x5 expansion (parity: conv.py:158-172)."""

    c2: int
    k: int = 1
    s: int = 1
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_ = self.c2 // 2
        y = ConvBNAct(c_, self.k, self.s, training=self.training,
                      dtype=self.dtype, name="cv1")(x)
        y2 = ConvBNAct(c_, 5, 1, g=c_, training=self.training,
                       dtype=self.dtype, name="cv2")(y)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck with optional stride-2 depthwise
    (parity: block.py:447-470)."""

    c2: int
    k: int = 3
    s: int = 1
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, training=self.training, dtype=self.dtype, name="gc1")(x)
        if self.s == 2:
            y = DWConvBlock(c_, self.k, self.s, act=None, training=self.training,
                            dtype=self.dtype, name="dw")(y)
        y = GhostConv(self.c2, 1, 1, training=self.training, dtype=self.dtype, name="gc2")(y)
        if self.s == 2:
            sc = DWConvBlock(x.shape[-1], self.k, self.s, act=None,
                             training=self.training, dtype=self.dtype, name="sc_dw")(x)
            sc = ConvBNAct(self.c2, 1, 1, act=None, training=self.training,
                           dtype=self.dtype, name="sc_pw")(sc)
        else:
            sc = x if x.shape[-1] == self.c2 else ConvBNAct(
                self.c2, 1, 1, act=None, training=self.training,
                dtype=self.dtype, name="sc_pw")(x)
        return y + sc


class RepConv(nn.Module):
    """Rep-style 3x3 + 1x1 (+identity BN) block (parity: conv.py:174-260).

    Training runs the three branches; ``deploy`` runs the single fused
    conv whose params come from :func:`repconv_fuse` at export time.
    """

    c2: int
    s: int = 1
    g: int = 1
    use_id_bn: bool = False
    training: bool = False
    deploy: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.deploy:
            y = nn.Conv(self.c2, (3, 3), strides=(self.s, self.s),
                        padding=[(1, 1), (1, 1)], feature_group_count=self.g,
                        use_bias=True, dtype=self.dtype, name="conv")(x)
            return nn.silu(y)
        y = ConvBNAct(self.c2, 3, self.s, g=self.g, act=None,
                      training=self.training, dtype=self.dtype, name="conv1")(x)
        y = y + ConvBNAct(self.c2, 1, self.s, g=self.g, act=None,
                          training=self.training, dtype=self.dtype, name="conv2")(x)
        if self.use_id_bn and x.shape[-1] == self.c2 and self.s == 1:
            y = y + nn.BatchNorm(use_running_average=not self.training,
                                 momentum=0.97, epsilon=1e-3, dtype=self.dtype,
                                 name="bn")(x)
        return nn.silu(y)


def repconv_fuse(params: dict, stats: dict, groups: int = 1):
    """Fold the RepConv branches into one 3x3 conv (kernel HWIO, bias).

    Parity: ref:conv.py get_equivalent_kernel_bias — 3x3 + padded 1x1 +
    identity, each BN-folded first.
    """
    import numpy as np

    def fold(branch, st):
        k = np.asarray(branch["conv"]["kernel"])
        g, b = np.asarray(branch["bn"]["scale"]), np.asarray(branch["bn"]["bias"])
        m, v = np.asarray(st["bn"]["mean"]), np.asarray(st["bn"]["var"])
        s = g / np.sqrt(v + 1e-3)
        return k * s, b - m * s

    k3, b3 = fold(params["conv1"], stats["conv1"])
    k1, b1 = fold(params["conv2"], stats["conv2"])
    k1p = np.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    k, b = k3 + k1p, b3 + b1
    if "bn" in params:  # identity branch
        g_, b_ = np.asarray(params["bn"]["scale"]), np.asarray(params["bn"]["bias"])
        m_, v_ = np.asarray(stats["bn"]["mean"]), np.asarray(stats["bn"]["var"])
        s_ = g_ / np.sqrt(v_ + 1e-3)
        cin = k.shape[2] * groups
        kid = np.zeros_like(k3)
        for i in range(k3.shape[3]):
            kid[1, 1, i % k.shape[2], i] = 1.0
        k = k + kid * s_
        b = b + (b_ - m_ * s_)
    return {"conv": {"kernel": k, "bias": b}}


class SCDown(nn.Module):
    """Separable downsample: 1x1 pointwise -> depthwise stride conv
    (parity: block.py:1211-1248)."""

    c2: int
    k: int = 3
    s: int = 2
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ConvBNAct(self.c2, 1, 1, training=self.training, dtype=self.dtype,
                      name="cv1")(x)
        return ConvBNAct(self.c2, self.k, self.s, g=self.c2, act=None,
                         training=self.training, dtype=self.dtype, name="cv2")(y)


class PSAAttention(nn.Module):
    """Conv-QKV multi-head self-attention with depthwise positional conv
    (parity: block.py:1001-1060 Attention).  NHWC."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        N = H * W
        hd = self.dim // self.num_heads
        kd = int(hd * self.attn_ratio)
        h_all = self.dim + kd * self.num_heads * 2
        qkv = ConvBNAct(h_all, 1, act=None, training=self.training,
                        dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, self.num_heads, kd * 2 + hd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q.astype(f32), k.astype(f32)) * (kd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v.astype(f32)).reshape(B, H, W, C)
        pe = ConvBNAct(self.dim, 3, g=self.dim, act=None, training=self.training,
                       dtype=self.dtype, name="pe")(v.reshape(B, H, W, C))
        y = (y + pe).astype(x.dtype)
        return ConvBNAct(self.dim, 1, act=None, training=self.training,
                         dtype=self.dtype, name="proj")(y)


class PSABlock(nn.Module):
    """Attention + conv-FFN with residuals (parity: block.py:1060-1092)."""

    dim: int
    num_heads: int = 4
    shortcut: bool = True
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        a = PSAAttention(dim=self.dim, num_heads=self.num_heads,
                         training=self.training, dtype=self.dtype, name="attn")(x)
        x = x + a if self.shortcut else a
        f = ConvBNAct(self.dim * 2, 1, training=self.training, dtype=self.dtype,
                      name="ffn_0")(x)
        f = ConvBNAct(self.dim, 1, act=None, training=self.training,
                      dtype=self.dtype, name="ffn_1")(f)
        return x + f if self.shortcut else f


class PSA(nn.Module):
    """Position-sensitive attention block (parity: block.py:1094-1177)."""

    c2: int
    e: float = 0.5
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, training=self.training, dtype=self.dtype, name="cv1")(x)
        a, b = jnp.split(y, [c], axis=-1)
        b = PSABlock(dim=c, num_heads=max(c // 64, 1), training=self.training,
                     dtype=self.dtype, name="psa")(b)
        return ConvBNAct(self.c2, 1, training=self.training, dtype=self.dtype,
                         name="cv2")(jnp.concatenate([a, b], axis=-1))


# ---------------------------------------------------------------------------
# rare wrapper blocks (experimental-yaml surface parity)
# ---------------------------------------------------------------------------


class FeatureSplitIndex(nn.Module):
    """Select one tensor from a multi-output layer (parity: block.py:1405-1415).

    Pairs with ``VisionLSTM``-style blocks that emit a list of feature
    maps; the YAML routes the list here and this block picks ``index``.
    """

    index: int

    @nn.compact
    def __call__(self, xs):
        if not isinstance(xs, (list, tuple)):
            raise ValueError("FeatureSplitIndex input must be a list/tuple")
        if self.index >= len(xs):
            raise ValueError(f"index {self.index} out of range ({len(xs)} outputs)")
        return xs[self.index]


class PermuteBlock(nn.Module):
    """(B, S, D) -> (B, H, W, D) grid (parity: block.py:1864-1878).

    The torch block emits the channels-last grid via einops; under NHWC
    this is the same reshape ``SequenceToImage`` performs.
    """

    seqlens: Sequence[int]

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        h, w = resolve_seqlens(S, self.seqlens)
        return x.reshape(B, h, w, D)


class FlattenPosEmbedBlock(nn.Module):
    """Pos-embed a flattened (B, S, D) sequence (parity: block.py:1818-1862).

    Reshapes to the (H, W) grid, adds the learned 2d positional
    embedding, and flattens back — for graphs that stay in sequence
    layout between ViL stages.
    """

    dim: int
    seqlens: Sequence[int]

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        assert len(self.seqlens) == 2
        h, w = resolve_seqlens(S, self.seqlens)
        y = VitPosEmbed2d(seqlens=(h, w), dim=self.dim, name="module")(
            x.reshape(B, h, w, D)
        )
        return y.reshape(B, S, D)


class SequenceConv2dBlock(nn.Module):
    """Strided full conv on a flattened sequence (parity: block.py:1621-1647).

    The reference wraps ``SequenceConv2d(in, out, k, stride)`` with
    padding k//2 when stride>1 (downsampling) and 0 otherwise; output is
    re-flattened at the reduced grid size.
    """

    c2: int
    k: int = 3
    s: int = 1
    seqlens: Sequence[int] | None = None
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
        pad = self.k // 2 if self.s > 1 else 0
        y = nn.Conv(
            self.c2, (self.k, self.k), strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)], use_bias=True, dtype=self.dtype,
            name="conv",
        )(x.reshape(B, h, w, D))
        return y.reshape(B, y.shape[1] * y.shape[2], self.c2)


class ConvTransposeBlock(nn.Module):
    """Transposed conv + BN + SiLU (parity: conv.py:118-137 ConvTranspose)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    act: str | None = "silu"
    training: bool = False
    dtype: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        assert not (self.fused and self.training), "fused conv is eval-only"
        # torch ConvTranspose2d(k, s, p) -> flax explicit pad (k-1-p):
        # out = (i-1)*s - 2p + k on both frameworks under this mapping
        fp = self.k - 1 - self.p
        y = nn.ConvTranspose(
            self.c2, (self.k, self.k), strides=(self.s, self.s),
            padding=[(fp, fp), (fp, fp)], use_bias=self.fused,
            dtype=self.dtype, name="conv",
        )(x)
        if not self.fused:
            y = nn.BatchNorm(
                use_running_average=not self.training, momentum=0.97,
                epsilon=1e-3, dtype=self.dtype, name="bn",
            )(y)
        return _act(y, self.act)


class VisionLSTMBlock(nn.Module):
    """Whole-backbone ViL monolith with multi-scale taps (parity:
    block.py:2024-2077 ``VisionLSTM``).

    patch-embed -> pos-embed -> ``depth`` ViLBlockPairs; after each index
    in ``output_indices`` the (shared) final LayerNorm + optional
    seq->image reshape is applied and the tap appended; returns the list
    of taps with the final output last — consumed by FeatureSplitIndex.
    """

    dim: int
    depth: int = 12
    resolution: Sequence[int] = (224, 224)
    patch_size: int = 16
    output_indices: Sequence[int] = ()
    pooling: str = "to_image"
    drop_path: float = 0.0
    chunk_size: int = 256
    qkv_block_size: int = 16
    training: bool = False
    chunkwise_kernel: str = "chunkwise--native_autograd"
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        assert self.depth > (max(self.output_indices) if self.output_indices else 0)
        ps = (self.patch_size, self.patch_size)
        y = VitPatchEmbed(dim=self.dim, patch_size=ps, dtype=self.compute_dtype,
                          name="patch_embed")(x)
        B, h, w, D = y.shape
        y = VitPosEmbed2d(seqlens=(h, w), dim=self.dim, name="pos_embed")(y)
        y = y.reshape(B, h * w, D)
        norm = nn.LayerNorm(name="norm")  # shared across taps, like the reference

        def tap(seq):
            o = norm(seq)
            return o.reshape(B, h, w, D) if self.pooling == "to_image" else o

        outs = []
        for i in range(self.depth):
            y = ViLBlockPair(
                dim=self.dim, drop_path=self.drop_path, seqlens=(h, w),
                chunk_size=self.chunk_size, qkv_block_size=self.qkv_block_size,
                training=self.training, chunkwise_kernel=self.chunkwise_kernel,
                compute_dtype=self.compute_dtype, name=f"blocks_{i}",
            )(y)
            if i in tuple(self.output_indices):
                outs.append(tap(y))
        outs.append(tap(y))
        return outs


# ---------------------------------------------------------------------------
# RT-DETR backbone/neck blocks (HGNetV2 + RepC3)
# ---------------------------------------------------------------------------


class LightConv(nn.Module):
    """1x1 conv (no act) -> depthwise kxk conv (ReLU) (parity: conv.py:78-99)."""

    c2: int
    k: int = 3
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ConvBNAct(self.c2, 1, act=None, training=self.training,
                      dtype=self.dtype, name="conv1")(x)
        return DWConvBlock(self.c2, self.k, act="relu", training=self.training,
                           dtype=self.dtype, name="conv2")(y)


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 convs + stride-1 maxpool (parity: block.py:231-259).

    The torch version pads right/bottom by 1 before stem2a and the pool
    (asymmetric); reproduced with explicit NHWC padding.
    """

    cm: int
    c2: int
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kw = dict(training=self.training, dtype=self.dtype)
        x = ConvBNAct(self.cm, 3, 2, act="relu", name="stem1", **kw)(x)
        xp = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
        x2 = ConvBNAct(self.cm // 2, 2, 1, p=0, act="relu", name="stem2a", **kw)(xp)
        x2 = jnp.pad(x2, [(0, 0), (0, 1), (0, 1), (0, 0)])
        x2 = ConvBNAct(self.cm, 2, 1, p=0, act="relu", name="stem2b", **kw)(x2)
        x1 = nn.max_pool(xp, (2, 2), strides=(1, 1), padding="VALID")
        y = jnp.concatenate([x1, x2], axis=-1)
        y = ConvBNAct(self.cm, 3, 2, act="relu", name="stem3", **kw)(y)
        return ConvBNAct(self.c2, 1, 1, act="relu", name="stem4", **kw)(y)


class HGBlock(nn.Module):
    """PPHGNetV2 HG block (parity: block.py:262-283)."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kw = dict(training=self.training, dtype=self.dtype)
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                ys.append(LightConv(self.cm, self.k, name=f"m_{i}", **kw)(ys[-1]))
            else:
                ys.append(ConvBNAct(self.cm, self.k, act="relu", name=f"m_{i}",
                                    **kw)(ys[-1]))
        y = jnp.concatenate(ys, axis=-1)
        y = ConvBNAct(self.c2 // 2, 1, act="relu", name="sc", **kw)(y)
        y = ConvBNAct(self.c2, 1, act="relu", name="ec", **kw)(y)
        return y + x if (self.shortcut and x.shape[-1] == self.c2) else y


class RepC3(nn.Module):
    """RT-DETR neck CSP block over RepConvs (parity: block.py:410-424)."""

    c2: int
    n: int = 3
    e: float = 1.0
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        kw = dict(training=self.training, dtype=self.dtype)
        a = ConvBNAct(c_, 1, name="cv1", **kw)(x)
        b = ConvBNAct(c_, 1, name="cv2", **kw)(x)
        for i in range(self.n):
            a = RepConv(c_, name=f"m_{i}", **kw)(a)
        y = a + b
        if c_ != self.c2:
            y = ConvBNAct(self.c2, 1, name="cv3", **kw)(y)
        return y
