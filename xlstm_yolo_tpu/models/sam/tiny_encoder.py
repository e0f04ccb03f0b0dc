"""TinyViT image encoder (MobileSAM) in flax, NHWC.

TPU-native re-derivation of ref:ultralytics/models/sam/modules/
tiny_encoder.py (TinyViT-5M as used by MobileSAM: conv stem, one MBConv
stage, three window-attention stages with learned per-offset attention
biases, SAM 256-channel neck).  Differences from the torch original are
layout only: NHWC feature maps, HWIO conv kernels, windows partitioned
with static reshapes (fixed shapes under jit).  Plugs into the same
PromptEncoder/MaskDecoder as the ViT-B/L/H family (modules.py) —
``build_sam("mobile_sam")``.

Weight conversion from the released mobile_sam.pt lives in
``convert.convert_tiny_vit_state_dict``; golden-tested against the
reference torch module on CPU (tests/test_sam_tiny.py).
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xlstm_yolo_tpu.models.sam.modules import LayerNorm2d

f32 = jnp.float32


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm pair (ref Conv2d_BN), NHWC."""

    out: int
    ks: int = 1
    stride: int = 1
    groups: int = 1
    training: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.ks // 2
        x = nn.Conv(self.out, (self.ks, self.ks), strides=self.stride,
                    padding=pad, feature_group_count=self.groups,
                    use_bias=False, name="c")(x)
        return nn.BatchNorm(use_running_average=not self.training,
                            momentum=0.9, epsilon=1e-5, name="bn")(x)


class TinyPatchEmbed(nn.Module):
    """3x3 s2 conv -> GELU -> 3x3 s2 conv: image to H/4 x W/4 tokens."""

    dim: int
    training: bool = False

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.dim // 2, 3, 2, training=self.training, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        return ConvBN(self.dim, 3, 2, training=self.training, name="conv2")(x)


class MBConv(nn.Module):
    """Inverted bottleneck (1x1 up, 3x3 depthwise, 1x1 down), residual."""

    dim: int
    expand: float = 4.0
    training: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expand)
        s = x
        x = nn.gelu(ConvBN(hidden, 1, training=self.training, name="conv1")(x),
                    approximate=False)
        x = nn.gelu(ConvBN(hidden, 3, groups=hidden, training=self.training,
                           name="conv2")(x), approximate=False)
        x = ConvBN(self.dim, 1, training=self.training, name="conv3")(x)
        return nn.gelu(x + s, approximate=False)


class PatchMerging(nn.Module):
    """1x1 up -> 3x3 depthwise (stride 2, or 1 at dims {320,448,576}) ->
    1x1: merge patches + project (NHWC in, NHWC out)."""

    out_dim: int
    training: bool = False

    @nn.compact
    def __call__(self, x):
        stride = 1 if self.out_dim in {320, 448, 576} else 2
        x = nn.gelu(ConvBN(self.out_dim, 1, training=self.training,
                           name="conv1")(x), approximate=False)
        x = nn.gelu(ConvBN(self.out_dim, 3, stride, groups=self.out_dim,
                           training=self.training, name="conv2")(x),
                    approximate=False)
        return ConvBN(self.out_dim, 1, training=self.training, name="conv3")(x)


class BiasedAttention(nn.Module):
    """MHA over window tokens with learned per-offset biases
    (ref tiny_encoder.Attention, attn_ratio=1)."""

    dim: int
    key_dim: int
    num_heads: int
    resolution: tuple

    @nn.compact
    def __call__(self, x):  # (B*, N, C)
        Bs, N, C = x.shape
        NH, KD = self.num_heads, self.key_dim
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(3 * NH * KD, name="qkv")(x)
        qkv = qkv.reshape(Bs, N, NH, 3 * KD)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (Bs, N, NH, KD) each
        # per-offset bias table: index map precomputed from the window grid
        pts = list(itertools.product(range(self.resolution[0]),
                                     range(self.resolution[1])))
        offsets, idxs = {}, []
        for p1 in pts:
            for p2 in pts:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                offsets.setdefault(off, len(offsets))
                idxs.append(offsets[off])
        bias_tab = self.param("attention_biases", nn.initializers.zeros,
                              (NH, len(offsets)))
        idx = jnp.asarray(np.asarray(idxs, np.int32).reshape(len(pts), len(pts)))
        bias = bias_tab[:, idx]  # (NH, N, N)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (KD ** -0.5) + bias[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bs, N, NH * KD)
        return nn.Dense(self.dim, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Windowed biased attention + depthwise local conv + MLP."""

    dim: int
    resolution: tuple
    num_heads: int
    window: int = 7
    mlp_ratio: float = 4.0
    training: bool = False

    @nn.compact
    def __call__(self, x):  # (B, H*W, C)
        H, W = self.resolution
        B, HW, C = x.shape
        ws = self.window
        res = x
        if (H, W) == (ws, ws):
            x = BiasedAttention(self.dim, C // self.num_heads, self.num_heads,
                                (ws, ws), name="attn")(x)
        else:
            x = x.reshape(B, H, W, C)
            pb, pr = (ws - H % ws) % ws, (ws - W % ws) % ws
            if pb or pr:
                x = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)))
            pH, pW = H + pb, W + pr
            nH, nW = pH // ws, pW // ws
            x = (x.reshape(B, nH, ws, nW, ws, C).transpose(0, 1, 3, 2, 4, 5)
                 .reshape(B * nH * nW, ws * ws, C))
            x = BiasedAttention(self.dim, C // self.num_heads, self.num_heads,
                                (ws, ws), name="attn")(x)
            x = (x.reshape(B, nH, nW, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
                 .reshape(B, pH, pW, C))
            if pb or pr:
                x = x[:, :H, :W]
            x = x.reshape(B, HW, C)
        x = res + x
        # local depthwise conv between attention and MLP
        xi = x.reshape(B, H, W, C)
        xi = ConvBN(C, 3, groups=C, training=self.training,
                    name="local_conv")(xi)
        x = xi.reshape(B, HW, C)
        # MLP (pre-norm lives inside, per the reference Mlp)
        y = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(x)
        y = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, name="mlp_fc2")(y)
        return x + y


class TinyViT(nn.Module):
    """MobileSAM image encoder: (B, S, S, 3) -> (B, S/16, S/16, 256).

    Default hyperparameters are the MobileSAM TinyViT-5M
    (ref:models/sam/build.py:56).
    """

    img_size: int = 1024
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    neck_dim: int = 256
    training: bool = False

    @nn.compact
    def __call__(self, x):
        R = self.img_size // 4
        x = TinyPatchEmbed(self.embed_dims[0], self.training,
                           name="patch_embed")(x)  # (B, R, R, C0)
        # stage 0: MBConv stack (NHWC throughout)
        for j in range(self.depths[0]):
            x = MBConv(self.embed_dims[0], 4.0, self.training,
                       name=f"layer0_block{j}")(x)
        x = PatchMerging(self.embed_dims[1], self.training,
                         name="layer0_downsample")(x)  # R/2
        B = x.shape[0]
        # stages 1-3: window attention over token sequences
        for i in (1, 2, 3):
            r = R // (2 ** (2 if i == 3 else i))
            C = self.embed_dims[i]
            x = x.reshape(B, r * r, C)
            for j in range(self.depths[i]):
                x = TinyViTBlock(C, (r, r), self.num_heads[i],
                                 self.window_sizes[i], self.mlp_ratio,
                                 self.training, name=f"layer{i}_block{j}")(x)
            x = x.reshape(B, r, r, C)
            if i < 3:
                x = PatchMerging(self.embed_dims[i + 1], self.training,
                                 name=f"layer{i}_downsample")(x)
        # SAM neck -> 256-channel embedding (shared with ImageEncoderViT)
        x = nn.Conv(self.neck_dim, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(self.neck_dim, name="neck_ln1")(x)
        x = nn.Conv(self.neck_dim, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(x)
        return LayerNorm2d(self.neck_dim, name="neck_ln2")(x)
