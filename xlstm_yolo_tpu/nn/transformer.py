"""Transformer modules for RT-DETR (NHWC / (B, S, D) layouts).

TPU-native re-design of ref:ultralytics/nn/modules/transformer.py:28-440:
- AIFI: single transformer encoder layer over the flattened P5 grid with
  a 2d sincos positional embedding (computed at trace time — static
  shapes under jit).
- MSDeformAttn: multiscale deformable attention.  The CUDA/torch
  implementation gathers bilinear samples per (query, head, level,
  point); here sampling is expressed as take_along_axis over the
  flattened level grids — XLA lowers it to gathers on the value tensor,
  which is fine in this graph (no Pallas custom calls co-compiled).
- DeformableTransformerDecoder(Layer): iterative box refinement, exactly
  the reference recurrence (sigmoid-space refinement with logit-space
  addition).

All dims are static; dropout is omitted (the shipped RT-DETR configs use
dropout=0.0).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

f32 = jnp.float32


def sincos_pos_embed_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2d sine-cosine positional embedding, reference-exact.

    Reproduces ref:transformer.py:101-115 bit-for-bit, including its
    quirk: the (w, h) 'ij' meshgrid is flattened w-major while the
    feature map flattens h-major — the embedding rows land transposed
    relative to the spatial layout.  Checkpoint parity requires copying
    that behavior, not fixing it.
    """
    assert dim % 4 == 0, "embed dim must be divisible by 4 for 2d sincos"
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=f32) / pos_dim))
    gw, gh = jnp.meshgrid(jnp.arange(w, dtype=f32), jnp.arange(h, dtype=f32),
                          indexing="ij")
    out_w = gw.reshape(-1)[:, None] * omega[None]  # (w*h, pos_dim)
    out_h = gh.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], -1
    )[None]  # (1, w*h, dim)


class MLP(nn.Module):
    """Simple multi-layer perceptron head (ref:transformer.py:174-190)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    act: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.out_dim if last else self.hidden_dim,
                         dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x) if self.act == "relu" else nn.silu(x)
        return x


class AIFI(nn.Module):
    """Attention-based Intra-scale Feature Interaction (ref:transformer.py:86-115).

    One post-norm transformer encoder layer over the flattened NHWC grid
    with a static 2d sincos positional embedding added to q/k (not v).
    """

    d_ffn: int = 1024
    num_heads: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        s = x.reshape(B, H * W, C)
        pos = sincos_pos_embed_2d(H, W, C).astype(s.dtype)
        qk = s + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="ma",
        )(inputs_q=qk, inputs_k=qk, inputs_v=s)
        s = nn.LayerNorm(name="norm1")(s + attn).astype(s.dtype)
        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="fc1")(s)
        ff = nn.Dense(C, dtype=self.dtype, name="fc2")(nn.gelu(ff))
        s = nn.LayerNorm(name="norm2")(s + ff).astype(s.dtype)
        return s.reshape(B, H, W, C)


def _msda_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional grid init for sampling offsets (ref:transformer.py:249-259)."""

    def init(key, shape, dtype=f32):
        thetas = jnp.arange(n_heads, dtype=f32) * (2.0 * math.pi / n_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)  # (nh, 2)
        grid = grid / jnp.abs(grid).max(-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        scale = jnp.arange(1, n_points + 1, dtype=f32)[None, None, :, None]
        return (grid * scale).reshape(-1).astype(dtype)

    return init


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (ref:transformer.py:218-309).

    ``value`` is the concatenated flattened levels (B, V, C); sampling
    locations are bilinear reads from each level grid, realized as 4
    take_along_axis gathers per point.
    """

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes):
        # query (B, Q, C); refer_bbox (B, Q, nl, 4) or (B, Q, nl, 2) in [0,1]
        B, Q, C = query.shape
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        dh = self.d_model // nh
        V = value.shape[1]
        assert sum(h * w for h, w in value_shapes) == V

        v = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, V, nh, dh)

        off = nn.Dense(
            nh * nl * npts * 2, kernel_init=nn.initializers.zeros,
            bias_init=_msda_offset_bias_init(nh, nl, npts),
            dtype=self.dtype, name="sampling_offsets",
        )(query).reshape(B, Q, nh, nl, npts, 2)
        w = nn.Dense(
            nh * nl * npts, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(B, Q, nh, nl * npts)
        w = jax.nn.softmax(w.astype(f32), -1).reshape(B, Q, nh, nl, npts)

        num_pts = refer_bbox.shape[-1]
        if num_pts == 2:
            wh = jnp.asarray([[hw[1], hw[0]] for hw in value_shapes], f32)
            loc = refer_bbox[:, :, None, :, None, :] + off / wh[None, None, None, :, None, :]
        else:  # 4: center + wh scaled offsets
            loc = (
                refer_bbox[:, :, None, :, None, :2]
                + off / npts * refer_bbox[:, :, None, :, None, 2:] * 0.5
            )

        # bilinear sampling per level via gathers on the flattened grid
        out = jnp.zeros((B, Q, nh, dh), f32)
        start = 0
        for li, (h_l, w_l) in enumerate(value_shapes):
            v_l = jax.lax.dynamic_slice_in_dim(v, start, h_l * w_l, axis=1)
            start += h_l * w_l
            # grid_sample(align_corners=False): x in [0,1] -> pixel x*W - 0.5
            xy = loc[:, :, :, li]  # (B, Q, nh, npts, 2)
            px = xy[..., 0].astype(f32) * w_l - 0.5
            py = xy[..., 1].astype(f32) * h_l - 0.5
            x0 = jnp.floor(px); y0 = jnp.floor(py)
            fx = px - x0; fy = py - y0
            vh = jnp.moveaxis(v_l.astype(f32), 2, 1)  # (B, nh, HW, dh)
            samples = 0.0
            for dy_ in (0, 1):
                for dx_ in (0, 1):
                    xi = jnp.clip(x0 + dx_, 0, w_l - 1)
                    yi = jnp.clip(y0 + dy_, 0, h_l - 1)
                    inb = (
                        (x0 + dx_ >= 0) & (x0 + dx_ < w_l)
                        & (y0 + dy_ >= 0) & (y0 + dy_ < h_l)
                    ).astype(f32)
                    wgt = ((fx if dx_ else 1 - fx) * (fy if dy_ else 1 - fy)) * inb
                    flat = (yi * w_l + xi).astype(jnp.int32)  # (B, Q, nh, npts)
                    flat = jnp.moveaxis(flat, 2, 1).reshape(B, nh, Q * npts)
                    got = jnp.take_along_axis(
                        vh, flat[..., None], axis=2
                    ).reshape(B, nh, Q, npts, dh)
                    samples = samples + got * jnp.moveaxis(wgt, 2, 1).reshape(
                        B, nh, Q, npts, 1)
            # weight by attention and accumulate over points
            w_l_att = jnp.moveaxis(w[:, :, :, li], 2, 1)  # (B, nh, Q, npts)
            out = out + jnp.moveaxis(
                (samples * w_l_att[..., None]).sum(3), 1, 2
            )
        out = out.reshape(B, Q, self.d_model).astype(query.dtype)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (ref:transformer.py:312-374)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, attn_mask=None,
                 query_pos=None):
        q = k = embed if query_pos is None else embed + query_pos
        tgt = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="self_attn",
        )(inputs_q=q, inputs_k=k, inputs_v=embed, mask=attn_mask)
        embed = nn.LayerNorm(name="norm1")(embed + tgt).astype(embed.dtype)

        tgt = MSDeformAttn(
            d_model=self.d_model, n_levels=self.n_levels, n_heads=self.n_heads,
            n_points=self.n_points, dtype=self.dtype, name="cross_attn",
        )(embed if query_pos is None else embed + query_pos,
          refer_bbox[:, :, None, :] * jnp.ones((1, 1, self.n_levels, 1), refer_bbox.dtype),
          feats, shapes)
        embed = nn.LayerNorm(name="norm2")(embed + tgt).astype(embed.dtype)

        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(name="norm3")(embed + ff).astype(embed.dtype)


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))
