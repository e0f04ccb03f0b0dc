"""VisionLSTM v1 — the legacy ViL architecture, TPU-native.

Parity target: ref:ultralytics/nn/modules/vision_lstm/vision_lstm.py
(the package's exported ``VisionLSTM``).  The v1 design differs from v2
(nn/layers.py) in load-bearing ways:

- the mLSTM cell uses SEPARATE igate/fgate projections (no soft-cap)
  and the exp-input-gate quadratic ``parallel_stabilized_simple``
  (ref::137) instead of the sigmoid-input-gate chunkwise family;
- q, k AND v all come from one fused ``qkv_proj`` applied to the
  conv+SiLU stream, and the branch output is gated by ``silu(z)``
  (v2 splits qk/v streams and has no z-gate);
- heads: ``MatrixLSTMCell(dim=inner, num_heads=qkv_block_size)``
  (ref::782) — v1 builds qkv_block_size heads of width inner/qkv_block_size,
  where v2 builds inner/qkv_block_size heads of width qkv_block_size;
- pre-norm, FFN and residuals live INSIDE ``ViLLayer`` (ref::805-840),
  while ``ViLBlock`` wraps the layer in DropPath(x, layer) — which adds
  x again on top of the layer's internal residual (ref::868-875 +
  vision_lstm_util.py:328-335).  We mirror that double-residual
  faithfully: behavior, not intent, is the parity target;
- classifier pooling is ``bilateral_avg`` (mean of first and last
  token) + LayerNorm (ref::1037-1042).

Known reference defects mirrored/handled (the file is dormant upstream):
``SequenceConv2d`` is used but never imported (ref::773 — construction
raises NameError upstream; the golden test injects it), and the block's
``norm`` is constructed but never applied (ref::861-880) — we declare
the same dormant parameter so checkpoints map 1:1.

On TPU the quadratic form is one fused (S, S) flash-style block per
head — fine at v1's classification sequence lengths (S <= ~1k); the
parallel Pallas kernel (ops/pallas/parallel.py) handles bigger S.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from xlstm_yolo_tpu.nn.layers import (
    BACKWARD,
    FORWARD,
    DropPath,
    FeedForward,
    MultiHeadLayerNorm,
    RMSNorm,
    ResidualLayerNorm,
    SequenceConv2d,
    VitPatchEmbed,
    VitPosEmbed2d,
    bias_linspace_init,
    small_init,
    wang_init,
)
from xlstm_yolo_tpu.nn.xlstm import CausalConv1d
from xlstm_yolo_tpu.ops.mlstm_parallel import mlstm_parallel_stabilized

f32 = jnp.float32

__all__ = ["MatrixLSTMCellV1", "ViLLayerV1", "ViLBlockV1", "VisionLSTMV1"]


class MatrixLSTMCellV1(nn.Module):
    """v1 mLSTM cell: separate i/f gate Linears + exp-gate quadratic form.

    Parity: ref:ultralytics/nn/modules/vision_lstm/vision_lstm.py:397-459.
    Gates are Dense(3*dim -> NH) over concat(q, k, v), weight zeros,
    igate bias ~N(0, 0.1), fgate bias linspace(3, 6).  No gate soft-cap.
    Out-norm is the headwise group norm with residual weight and NO bias
    (ref::405, LayerNorm default eps 1e-5).
    """

    dim: int
    num_heads: int
    eps: float = 1e-6  # parallel_stabilized_simple default (ref::145)

    @nn.compact
    def __call__(self, q, k, v):
        B, S, H = q.shape
        NH = self.num_heads
        DH = H // NH

        gate_in = jnp.concatenate([q, k, v], axis=-1).astype(f32)
        i_pre = nn.Dense(
            NH, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.normal(0.1), dtype=f32, name="igate",
        )(gate_in)
        f_pre = nn.Dense(
            NH, kernel_init=nn.initializers.zeros,
            bias_init=bias_linspace_init(3.0, 6.0), dtype=f32, name="fgate",
        )(gate_in)

        def heads(x):  # (B, S, H) -> (B, NH, S, DH)
            return jnp.swapaxes(x.reshape(B, S, NH, DH), 1, 2)

        h = mlstm_parallel_stabilized(
            heads(q), heads(k), heads(v),
            jnp.swapaxes(i_pre, -1, -2), jnp.swapaxes(f_pre, -1, -2),
            eps=self.eps,
        )  # (B, NH, S, DH)
        h = MultiHeadLayerNorm(
            num_heads=NH, head_dim=DH, eps=1e-5, use_bias=False, name="outnorm"
        )(h)
        return jnp.swapaxes(h, 1, 2).reshape(B, S, H)


class ViLLayerV1(nn.Module):
    """v1 ViL layer: pre-norm mLSTM branch with z-gate + pre-norm FFN.

    Parity: ref:ultralytics/nn/modules/vision_lstm/vision_lstm.py:732-860.
    proj_up (dim -> 2*inner) splits into the mLSTM stream and the gate z;
    the conv+SiLU output feeds one fused qkv_proj (inner -> 3*inner);
    h = (cell(q,k,v) + skip*conv_act) * silu(z) -> proj_down; both the
    mLSTM branch and the FFN add their residual inside this module.
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
    num_blocks: int | None = None
    ffn_proj_factor: float = 2.6667
    ffn_round_up_to: int = 64
    drop_rate: float = 0.0  # dropout inside FFN is absent in v1; kept 0
    training: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dim = self.dim
        inner = self.expansion * dim
        residual = x
        xn = RMSNorm(dim, eps=1e-6, use_weight=self.norm_bias, name="norm")(x)
        if self.direction == BACKWARD:
            xn = jnp.flip(xn, axis=1)

        x_inner = nn.Dense(
            2 * inner, use_bias=self.proj_bias, kernel_init=small_init(dim),
            dtype=self.compute_dtype, name="proj_up",
        )(xn)
        x_mlstm, z = jnp.split(x_inner, 2, axis=-1)

        if self.conv_kind == "2d":
            conv_out = SequenceConv2d(
                dim=inner, kernel_size=self.conv_kernel_size,
                seqlens=self.seqlens, use_bias=self.conv_bias,
                dtype=self.compute_dtype, name="conv",
            )(x_mlstm)
        elif self.conv_kind == "causal1d":
            conv_out = CausalConv1d(
                dim=inner, kernel_size=self.conv_kernel_size,
                use_bias=self.conv_bias, name="conv",
            )(x_mlstm)
        else:
            raise NotImplementedError(f"conv_kind {self.conv_kind!r}")
        conv_act = nn.silu(conv_out)

        qkv = nn.Dense(
            3 * inner, use_bias=self.proj_bias, kernel_init=small_init(dim),
            dtype=self.compute_dtype, name="qkv_proj",
        )(conv_act)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        h = MatrixLSTMCellV1(
            dim=inner, num_heads=self.qkv_block_size, name="mlstm_cell"
        )(q, k, v)
        skip = self.param("learnable_skip", nn.initializers.ones, (inner,), f32)
        h = (h + skip.astype(h.dtype) * conv_act) * nn.silu(z)

        out = nn.Dense(
            dim, use_bias=self.proj_bias,
            kernel_init=wang_init(dim, self.num_blocks or 1),
            dtype=self.compute_dtype, name="proj_down",
        )(h)
        if self.direction == BACKWARD:
            out = jnp.flip(out, axis=1)
        x = residual + out

        ffn_res = x
        xf = RMSNorm(dim, eps=1e-6, use_weight=self.norm_bias, name="ffn_norm")(x)
        x = ffn_res + FeedForward(
            dim=dim, proj_factor=self.ffn_proj_factor,
            round_up_to=self.ffn_round_up_to, use_bias=self.proj_bias,
            num_blocks=self.num_blocks or 1, dtype=self.compute_dtype,
            name="ffn",
        )(xf)
        return x


class _DormantNorm(nn.Module):
    """Declares the v1 block's never-applied LayerNorm params (ref::872,
    forward at ref::877 has the norm commented out) so torch checkpoints
    convert without unused keys."""

    dim: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        self.param("weight", nn.initializers.zeros, (self.dim,), f32)
        if self.use_bias:
            self.param("bias", nn.initializers.zeros, (self.dim,), f32)


class ViLBlockV1(nn.Module):
    """v1 block: DropPath around the (already-residual) layer.

    Parity: ref:ultralytics/nn/modules/vision_lstm/vision_lstm.py:861-880.
    DropPath computes x + path(x) (vision_lstm_util.py:328-335), and the
    v1 layer adds its residual internally, so the block output is
    2x + branches — mirrored as-is.
    """

    dim: int
    direction: str = FORWARD
    drop_path: float = 0.0
    norm_bias: bool = False
    training: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        _DormantNorm(self.dim, use_bias=self.norm_bias, name="norm")()
        layer = ViLLayerV1(
            dim=self.dim, direction=self.direction, training=self.training,
            compute_dtype=self.compute_dtype, name="layer",
        )
        dp = DropPath(drop_prob=self.drop_path, training=self.training)
        return dp(x, layer(x))


class VisionLSTMV1(nn.Module):
    """v1 VisionLSTM: patch embed + alternating ViL blocks + bilateral_avg.

    Parity: ref:ultralytics/nn/modules/vision_lstm/vision_lstm.py:918-1058.
    ``mode='classifier'`` pools (first + last token)/2, LayerNorm(eps 1e-6),
    Linear head; ``mode=None`` returns normed tokens (feature extractor).
    Input is NHWC (B, H, W, C).
    """

    dim: int = 192
    depth: int = 24
    patch_size: int = 16
    input_resolution: Sequence[int] = (224, 224)
    in_channels: int = 3
    num_classes: int | None = 1000
    mode: str | None = "classifier"  # 'classifier' | None
    pooling: str | None = "bilateral_avg"
    drop_path_rate: float = 0.0
    drop_path_decay: bool = False
    legacy_norm: bool = False
    training: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ph = pw = self.patch_size
        seqlens = (self.input_resolution[0] // ph, self.input_resolution[1] // pw)
        x = VitPatchEmbed(
            dim=self.dim, patch_size=(ph, pw), dtype=self.compute_dtype,
            name="patch_embed",
        )(x)
        x = VitPosEmbed2d(seqlens=seqlens, dim=self.dim, name="pos_embed")(x)
        B, H, W, D = x.shape
        x = x.reshape(B, H * W, D)

        if self.drop_path_decay and self.drop_path_rate > 0:
            dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
                   for i in range(self.depth)]
        else:
            dpr = [self.drop_path_rate] * self.depth

        for i in range(self.depth):
            direction = FORWARD if i % 2 == 0 else BACKWARD
            x = ViLBlockV1(
                dim=self.dim, direction=direction, drop_path=dpr[i],
                training=self.training, compute_dtype=self.compute_dtype,
                name=f"blocks_{i}",
            )(x)
        if self.legacy_norm:
            x = ResidualLayerNorm(self.dim, use_bias=False, name="legacy_norm")(x)

        if self.mode is None:
            return nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        if self.pooling == "bilateral_avg":
            x = (x[:, 0] + x[:, -1]) / 2
        else:
            raise NotImplementedError(f"pooling {self.pooling!r}")
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        if self.num_classes is not None:
            x = nn.Dense(
                self.num_classes,
                kernel_init=nn.initializers.truncated_normal(2e-5),
                name="head",
            )(x)
        return x
