"""SAM2 image encoder (Hiera trunk + FPN neck) in flax, NHWC.

TPU-native re-derivation of the SAM2 image-feature path:
ref:ultralytics/models/sam/modules/encoders.py:446-804 (ImageEncoder /
FpnNeck / Hiera) and blocks.py:488-698 (do_pool / MultiScaleAttention /
MultiScaleBlock / PositionEmbeddingSine).  Covers the static-image
feature pyramid all SAM2 variants (t/s/b+/l) share; the video memory
path (memory_attention.py / MemoryEncoder) is intentionally out of
scope — see COMPONENTS.md.

Everything is NHWC with fixed shapes under jit; window partitioning
reuses modules.window_partition (static pads).  Weight conversion:
``convert.convert_sam2_image_encoder``; golden-tested against the
reference torch ImageEncoder (tests/test_sam2_encoder.py).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xlstm_yolo_tpu.models.sam.modules import window_partition, window_unpartition

f32 = jnp.float32


def _do_pool(x):
    """2x2 max pool on NHWC (ref:blocks.py:488 do_pool, q_stride (2, 2))."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _torch_bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix matching F.interpolate's
    bicubic (align_corners=False, Keys kernel a=-0.75, edge clamp).

    jax.image.resize's "bicubic" uses a = -0.5, which leaves a ~5e-4
    systematic drift on the interpolated pos embed; the exact kernel
    keeps the golden tight.  Static sizes -> computed in numpy at trace
    time, applied as two small matmuls.
    """
    a = -0.75

    def k(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
        return 0.0

    M = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        base = math.floor(src)
        fr = src - base
        for tap in range(-1, 3):
            w = k(tap - fr)
            j = min(max(base + tap, 0), n_in - 1)
            M[i, j] += w
    return M


def _interp_pos_embed(bkg, H: int, W: int):
    """(1, h, w, C) -> (1, H, W, C) with torch-exact bicubic."""
    _, h, w, C = bkg.shape
    if (h, w) == (H, W):
        return bkg
    Mh = jnp.asarray(_torch_bicubic_matrix(h, H))
    Mw = jnp.asarray(_torch_bicubic_matrix(w, W))
    x = jnp.einsum("Hh,bhwc->bHwc", Mh, bkg.astype(f32))
    return jnp.einsum("Ww,bhwc->bhWc", Mw, x)


class MultiScaleAttention(nn.Module):
    """SDPA over (windowed) tokens with optional 2x2 query pooling."""

    dim_out: int
    num_heads: int
    q_pool: bool = False

    @nn.compact
    def __call__(self, x):  # (B*, H, W, C)
        B, H, W, _ = x.shape
        NH = self.num_heads
        hd = self.dim_out // NH
        qkv = nn.Dense(3 * self.dim_out, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, NH, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = _do_pool(q.reshape(B, H, W, -1))
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, NH, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, self.dim_out)
        return nn.Dense(self.dim_out, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed/global attention, optional stage-change
    dim expansion + query pooling, MLP (ref:blocks.py:583)."""

    dim: int
    dim_out: int
    num_heads: int
    window_size: int = 0  # 0 = global attention
    q_stride: bool = False  # 2x2 query pool (stage transition)
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, name="proj")(x)
            if self.q_stride:
                shortcut = _do_pool(shortcut)
        elif self.q_stride:
            shortcut = _do_pool(shortcut)
        ws = self.window_size
        H, W = x.shape[1:3]
        if ws > 0:
            x, pad_hw = window_partition(x, ws)
        x = MultiScaleAttention(self.dim_out, self.num_heads,
                                q_pool=self.q_stride, name="attn")(x)
        if self.q_stride:
            # shapes changed: unpartition at the pooled window size
            ws = self.window_size // 2
            H, W = shortcut.shape[1:3]
            pad_hw = (H + (-H) % ws, W + (-W) % ws) if ws else None
        if self.window_size > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, name="mlp_fc2")(y)
        return x + y


class Hiera(nn.Module):
    """Hierarchical ViT trunk: 4 stages, dims x2 at each transition,
    per-stage window sizes, a few global-attention blocks
    (ref:encoders.py:645)."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (1, 2, 7, 2)
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_pos_embed_bkg_spatial_size: Sequence[int] = (7, 7)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    dim_mul: float = 2.0
    head_mul: float = 2.0

    @nn.compact
    def __call__(self, x):  # (B, S, S, 3) -> 4 stage-end NHWC maps
        depth = sum(self.stages)
        stage_ends = [sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]]

        x = nn.Conv(self.embed_dim, (7, 7), strides=4, padding=3,
                    name="patch_embed")(x)
        B, H, W, C = x.shape
        # windowed positional embedding: bicubic background + tiled window
        bkg = self.param("pos_embed", nn.initializers.zeros,
                         (1, *self.window_pos_embed_bkg_spatial_size, C), f32)
        win = self.param("pos_embed_window", nn.initializers.zeros,
                         (1, self.window_spec[0], self.window_spec[0], C), f32)
        pe = _interp_pos_embed(bkg, H, W)
        reps = (1, H // win.shape[1], W // win.shape[2], 1)
        pe = pe + jnp.tile(win, reps)
        x = x + pe

        outputs = []
        dim, heads, cur_stage = self.embed_dim, self.num_heads, 1
        for i in range(depth):
            dim_out = dim
            ws = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                ws = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim=dim, dim_out=dim_out, num_heads=heads, window_size=ws,
                q_stride=i in q_pool_blocks, name=f"block{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs  # [(B, S/4, S/4, C0), ..., (B, S/32, S/32, 8*C0)]


def position_embedding_sine(H: int, W: int, dim: int = 256,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """(H, W, dim) normalized sine/cosine 2D embedding
    (ref:blocks.py PositionEmbeddingSine, normalize=True)."""
    npf = dim // 2
    scale = 2 * math.pi
    ye = jnp.broadcast_to(jnp.arange(1, H + 1, dtype=f32)[:, None], (H, W))
    xe = jnp.broadcast_to(jnp.arange(1, W + 1, dtype=f32)[None, :], (H, W))
    ye = ye / (H + 1e-6) * scale
    xe = xe / (W + 1e-6) * scale
    dim_t = jnp.arange(npf, dtype=f32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / npf)
    px = xe[..., None] / dim_t  # (H, W, npf)
    py = ye[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], -1).reshape(H, W, npf)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], -1).reshape(H, W, npf)
    return jnp.concatenate([py, px], axis=-1)  # (H, W, dim)


class FpnNeck(nn.Module):
    """SAM2 FPN neck: 1x1 laterals, nearest top-down on the two lowest-
    resolution levels, sine positional encodings (ref:encoders.py:501)."""

    d_model: int = 256
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)
    fpn_top_down_levels: Sequence[int] = (2, 3)

    @nn.compact
    def __call__(self, xs):  # xs: high-res -> low-res NHWC maps
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1), name=f"conv{n - i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                B, h, w, C = prev.shape
                td = jax.image.resize(prev.astype(f32),
                                      (B, 2 * h, 2 * w, C), "nearest")
                prev = lateral + td
            else:
                prev = lateral
            out[i] = prev
            ph, pw = prev.shape[1:3]
            pos[i] = jnp.broadcast_to(
                position_embedding_sine(ph, pw, self.d_model)[None],
                prev.shape).astype(prev.dtype)
        return out, pos


class SAM2ImageEncoder(nn.Module):
    """Hiera trunk + FPN neck; drops the lowest-res level (scalp=1) and
    returns {vision_features, backbone_fpn, vision_pos_enc}
    (ref:encoders.py:446 ImageEncoder)."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (1, 2, 7, 2)
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    window_pos_embed_bkg_spatial_size: Sequence[int] = (7, 7)
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)
    scalp: int = 1

    @nn.compact
    def __call__(self, x):
        feats = Hiera(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            stages=self.stages, global_att_blocks=self.global_att_blocks,
            window_pos_embed_bkg_spatial_size=self.window_pos_embed_bkg_spatial_size,
            window_spec=self.window_spec, name="trunk")(x)
        out, pos = FpnNeck(
            backbone_channel_list=self.backbone_channel_list,
            name="neck")(feats)
        if self.scalp:
            out, pos = out[: -self.scalp], pos[: -self.scalp]
        return {"vision_features": out[-1], "backbone_fpn": out,
                "vision_pos_enc": pos}


# (embed_dim, stages, num_heads, global_att_blocks, window_spec,
#  window_pos_embed_bkg_spatial_size, backbone_channel_list)
SAM2_CONFIGS = {
    "sam2_t": dict(embed_dim=96, stages=(1, 2, 7, 2), num_heads=1,
                   global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7),
                   window_pos_embed_bkg_spatial_size=(7, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_s": dict(embed_dim=96, stages=(1, 2, 11, 2), num_heads=1,
                   global_att_blocks=(7, 10, 13), window_spec=(8, 4, 14, 7),
                   window_pos_embed_bkg_spatial_size=(7, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_b": dict(embed_dim=112, stages=(2, 3, 16, 3), num_heads=2,
                   global_att_blocks=(12, 16, 20), window_spec=(8, 4, 14, 7),
                   window_pos_embed_bkg_spatial_size=(14, 14),
                   backbone_channel_list=(896, 448, 224, 112)),
    "sam2_l": dict(embed_dim=144, stages=(2, 6, 36, 4), num_heads=2,
                   global_att_blocks=(23, 33, 43), window_spec=(8, 4, 16, 8),
                   window_pos_embed_bkg_spatial_size=(7, 7),
                   backbone_channel_list=(1152, 576, 288, 144)),
}


def build_sam2_image_encoder(variant: str = "sam2_t") -> SAM2ImageEncoder:
    return SAM2ImageEncoder(**SAM2_CONFIGS[variant])
