"""SAM2 video-memory modules: RoPE attention, MemoryAttention, MemoryEncoder.

TPU-native (flax/NHWC/batch-first) re-design of the reference memory path:
- ref:ultralytics/models/sam/modules/memory_attention.py:12-237
  (MemoryAttentionLayer / MemoryAttention)
- ref:ultralytics/models/sam/modules/blocks.py:54-260 (MaskDownSampler,
  CXBlock, Fuser) and blocks.py:405-485 (RoPEAttention)
- ref:ultralytics/models/sam/modules/encoders.py:378-445 (MemoryEncoder)
- ref:ultralytics/models/sam/modules/utils.py:63-125 (sine pe, axial RoPE)

Design differences (on purpose):
- sequences are batch-first (B, T, C) and images NHWC throughout — the
  reference's seq-first (T, B, C) + NCHW exists for torch kernel reasons;
- rotary encodings are real-valued (cos, sin) pairs computed at trace
  time from static shapes — no complex dtypes (XLA/TPU native);
- dropout is omitted (eval parity; the reference video predictor runs
  under torch.no_grad with dropout inactive).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

f32 = jnp.float32


# ---------------------------------------------------------------------------
# positional encodings (utils.py:63-125)
# ---------------------------------------------------------------------------


def get_1d_sine_pe(pos, dim: int, temperature: float = 10000.0):
    """(N,) positions -> (N, dim) sine/cos embedding (utils.py:63-72)."""
    pe_dim = dim // 2
    dim_t = np.arange(pe_dim, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pos_embed = jnp.asarray(pos, f32)[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pos_embed), jnp.cos(pos_embed)], axis=-1)


def axial_rope_cos_sin(dim: int, end_x: int, end_y: int,
                       theta: float = 10000.0):
    """Real-valued axial RoPE tables: (end_x*end_y, dim//2) cos and sin.

    Matches utils.py:74-92 compute_axial_cis: the first dim//4 rotation
    channels carry x-angles, the next dim//4 carry y-angles; token t sits
    at (t % end_x, t // end_x).
    """
    n = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[:n].astype(np.float32) / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    tx, ty = t % end_x, np.floor(t / end_x)
    ang = np.concatenate([np.outer(tx, freqs), np.outer(ty, freqs)], axis=-1)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def apply_rotary(x, cos, sin):
    """Rotate adjacent channel pairs: x (..., T, D), cos/sin (T, D//2).

    Pairing matches torch.view_as_complex of x.reshape(..., D//2, 2)
    (utils.py:104-125): channel 2i is the real part, 2i+1 the imaginary.
    """
    xe = x[..., 0::2]
    xo = x[..., 1::2]
    ye = xe * cos - xo * sin
    yo = xe * sin + xo * cos
    return jnp.stack([ye, yo], axis=-1).reshape(x.shape)


# ---------------------------------------------------------------------------
# RoPE attention (blocks.py:405-485 over transformer.py:265-373)
# ---------------------------------------------------------------------------


class RoPEAttention(nn.Module):
    """Multi-head attention with axial rotary position encoding.

    ``num_k_exclude_rope`` (static): the LAST n key tokens skip rotation
    — the object-pointer tokens appended after the spatial memories.
    ``rope_k_repeat``: repeat the q-grid rotation along k (cross-attention
    to a bank of per-frame spatial memories, each the same grid as q).
    """

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: int | None = None
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0):
        internal = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        dh = internal // nh
        B, Tq, _ = q.shape
        Tk = k.shape[1]

        qp = nn.Dense(internal, name="q_proj")(q)
        kp = nn.Dense(internal, name="k_proj")(k)
        vp = nn.Dense(internal, name="v_proj")(v)

        def heads(x):
            return x.reshape(B, x.shape[1], nh, dh).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qp), heads(kp), heads(vp)

        side = int(round(math.sqrt(Tq)))
        assert side * side == Tq, f"RoPE q length {Tq} is not a square grid"
        cos, sin = axial_rope_cos_sin(dh, side, side, self.rope_theta)

        num_k_rope = Tk - num_k_exclude_rope
        if Tq != num_k_rope:
            assert self.rope_k_repeat, (Tq, num_k_rope)
            r = num_k_rope // Tq
            assert r * Tq == num_k_rope, (Tq, num_k_rope)
            cos_k = jnp.tile(cos, (r, 1))
            sin_k = jnp.tile(sin, (r, 1))
        else:
            cos_k, sin_k = cos, sin

        qh = apply_rotary(qh, cos, sin)
        k_rot = apply_rotary(kh[:, :, :num_k_rope], cos_k, sin_k)
        kh = (jnp.concatenate([k_rot, kh[:, :, num_k_rope:]], axis=2)
              if num_k_exclude_rope > 0 else k_rot)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(dh)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, internal)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


# ---------------------------------------------------------------------------
# memory attention (memory_attention.py:12-237)
# ---------------------------------------------------------------------------


class MemoryAttentionLayer(nn.Module):
    """Self-attn + cross-attn-to-memory + FFN, pre-norm residual."""

    d_model: int = 256
    dim_feedforward: int = 2048
    mem_dim: int = 64
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 num_k_exclude_rope: int = 0):
        # self-attention (memory_attention.py:96-102)
        t2 = nn.LayerNorm(name="norm1")(tgt)
        qk = t2 + query_pos if (self.pos_enc_at_attn and query_pos is not None) else t2
        t2 = RoPEAttention(self.d_model, num_heads=1, name="self_attn")(qk, qk, t2)
        tgt = tgt + t2

        # cross-attention to the memory bank (memory_attention.py:104-120)
        t2 = nn.LayerNorm(name="norm2")(tgt)
        qx = (t2 + query_pos if (self.pos_enc_at_cross_attn_queries
                                 and query_pos is not None) else t2)
        kx = (memory + pos if (self.pos_enc_at_cross_attn_keys
                               and pos is not None) else memory)
        t2 = RoPEAttention(
            self.d_model, num_heads=1, kv_in_dim=self.mem_dim,
            rope_k_repeat=True, name="cross_attn_image",
        )(qx, kx, memory, num_k_exclude_rope=num_k_exclude_rope)
        tgt = tgt + t2

        # FFN (relu; memory_attention.py:133-136)
        t2 = nn.LayerNorm(name="norm3")(tgt)
        t2 = nn.Dense(self.dim_feedforward, name="linear1")(t2)
        t2 = nn.Dense(self.d_model, name="linear2")(nn.relu(t2))
        return tgt + t2


class MemoryAttention(nn.Module):
    """Stack of MemoryAttentionLayers + final norm (batch-first)."""

    d_model: int = 256
    num_layers: int = 4
    dim_feedforward: int = 2048
    mem_dim: int = 64
    pos_enc_at_input: bool = True

    @nn.compact
    def __call__(self, curr, memory, curr_pos=None, memory_pos=None,
                 num_obj_ptr_tokens: int = 0):
        """curr (B, T, C); memory (B, M, mem_dim); returns (B, T, C)."""
        out = curr
        if self.pos_enc_at_input and curr_pos is not None:
            out = out + 0.1 * curr_pos
        for idx in range(self.num_layers):
            out = MemoryAttentionLayer(
                d_model=self.d_model, dim_feedforward=self.dim_feedforward,
                mem_dim=self.mem_dim, name=f"layers_{idx}",
            )(out, memory, pos=memory_pos, query_pos=curr_pos,
              num_k_exclude_rope=num_obj_ptr_tokens)
        return nn.LayerNorm(name="norm")(out)


# ---------------------------------------------------------------------------
# memory encoder (blocks.py:54-260 + encoders.py:378-445)
# ---------------------------------------------------------------------------


class MaskDownSampler(nn.Module):
    """Progressive mask downsampling 1 -> embed_dim (NHWC)."""

    embed_dim: int = 256
    kernel_size: int = 4
    stride: int = 4
    padding: int = 0
    total_stride: int = 16

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1)
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        assert self.stride**num_layers == self.total_stride
        chans = 1
        li = 0
        for _ in range(num_layers):
            chans = chans * (self.stride**2)
            x = nn.Conv(chans, (self.kernel_size, self.kernel_size),
                        strides=self.stride,
                        padding=[(self.padding, self.padding)] * 2,
                        name=f"encoder_{li}")(x)
            x = nn.LayerNorm(name=f"encoder_{li + 1}")(x)
            x = nn.gelu(x, approximate=False)
            li += 3  # conv, ln, act — mirrors the torch Sequential indices
        return nn.Conv(self.embed_dim, (1, 1), name=f"encoder_{li}")(x)


class CXBlock(nn.Module):
    """ConvNeXt block (blocks.py:114-205), NHWC."""

    dim: int
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init_value: float = 1e-6
    use_dwconv: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        inp = x
        x = nn.Conv(
            self.dim, (self.kernel_size, self.kernel_size),
            padding=[(self.padding, self.padding)] * 2,
            feature_group_count=self.dim if self.use_dwconv else 1,
            name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,), f32)
            x = gamma * x
        return inp + x


class Fuser(nn.Module):
    """num_layers CXBlocks (+ optional input projection)."""

    dim: int = 256
    num_layers: int = 2
    input_projection: bool = False

    @nn.compact
    def __call__(self, x):
        if self.input_projection:
            x = nn.Conv(self.dim, (1, 1), name="proj")(x)
        for idx in range(self.num_layers):
            x = CXBlock(dim=self.dim, name=f"layers_{idx}")(x)
        return x


class MemoryEncoder(nn.Module):
    """(pix_feat, mask) -> (memory features, spatial pos enc); NHWC.

    Parity: encoders.py:378-445.  Returns features (B, H, W, out_dim)
    and pos (B, H, W, out_dim).
    """

    out_dim: int = 64
    in_dim: int = 256

    @nn.compact
    def __call__(self, pix_feat, masks, skip_mask_sigmoid: bool = False):
        from xlstm_yolo_tpu.models.sam.sam2_encoder import (
            position_embedding_sine,
        )

        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        masks = MaskDownSampler(kernel_size=3, stride=2, padding=1,
                                name="mask_downsampler")(masks)
        x = nn.Conv(self.in_dim, (1, 1), name="pix_feat_proj")(pix_feat)
        x = x + masks
        x = Fuser(dim=self.in_dim, num_layers=2, name="fuser")(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), name="out_proj")(x)
        B, H, W, _ = x.shape
        pos = position_embedding_sine(H, W, self.out_dim)  # (H*W, out_dim)
        pos = jnp.broadcast_to(pos.reshape(1, H, W, self.out_dim),
                               (B, H, W, self.out_dim)).astype(x.dtype)
        return x, pos
