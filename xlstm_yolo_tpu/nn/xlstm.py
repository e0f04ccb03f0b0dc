"""xLSTM language-model stack: mLSTM blocks, sLSTM cells, block stack.

TPU re-design of the reference's embedded NXAI ``xlstm`` package
(ref:ultralytics/nn/modules/vision_lstm/xlstm/): the mLSTM LM layer
(blocks/mlstm/layer.py), the sLSTM cell whose CUDA extension
(blocks/slstm/src/cuda/slstm.cc:306, slstm_forward.cu, slstm_backward.cu)
becomes a fused ``lax.scan`` over a single jitted step — the pointwise
recurrence + per-head recurrent GEMM fuse into one XLA while-loop body,
which is the TPU-native equivalent of the fused CUDA kernel — and the
xLSTMBlockStack / xLSTMLarge LM with greedy generate()
(xlstm_large/model.py).

sLSTM recurrence (exponential gating + max-stabilizer, per head):
    z = tanh(Wz x + Rz h + bz)        o = sigmoid(Wo x + Ro h + bo)
    itil = Wi x + Ri h + bi           ftil = Wf x + Rf h + bf
    m' = max(ftil + m, itil)
    i' = exp(itil - m');  f' = exp(ftil + m - m')
    c' = f' c + i' z;     n' = f' n + i'
    h' = o * c' / n'
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlstm_yolo_tpu.nn.layers import (
    FeedForward,
    MatrixLSTMCell,
    RMSNorm,
    bias_linspace_init,
    small_init,
    wang_init,
)

f32 = jnp.float32


class CausalConv1d(nn.Module):
    """Depthwise causal conv over (B, S, D) (parity: vision_lstm2.py:835)."""

    dim: int
    kernel_size: int = 4
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size - 1
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.kernel_size, 1, self.dim), f32
        )
        y = jax.lax.conv_general_dilated(
            xp, w.astype(x.dtype), (1,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.dim,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.dim,), f32)
            y = y + b.astype(y.dtype)
        return y


class sLSTMCell(nn.Module):
    """Scalar LSTM with exponential gating, per-head recurrence.

    ``backend='scan'`` fuses the whole sequence into one lax.scan —
    the TPU analog of the reference's fused CUDA pointwise kernel +
    cuBLAS batched GEMM (ref:.../slstm/src/cuda/slstm_forward.cu).
    """

    dim: int
    num_heads: int = 4
    backend: str = "scan"  # 'scan' (lax.scan) | 'pallas' (fused VMEM kernel)

    @nn.compact
    def __call__(self, x, state=None):
        B, S, D = x.shape
        NH = self.num_heads
        DH = D // NH

        wx = nn.Dense(4 * D, use_bias=True, kernel_init=small_init(D), name="wx")(x)
        # per-head recurrent weights for the 4 gates: (4, NH, DH, DH)
        R = self.param(
            "recurrent_kernel",
            nn.initializers.orthogonal(),
            (4, NH, DH, DH),
            f32,
        )

        if state is None:
            zeros = jnp.zeros((B, NH, DH), f32)
            state = (zeros, zeros, zeros, zeros)  # h, c, n, m (m_0 = 0)
        h0, c0, n0, m0 = state

        wx_heads = wx.reshape(B, S, 4, NH, DH).astype(f32)

        if self.backend == "pallas":
            from xlstm_yolo_tpu.ops.pallas.slstm import slstm_sequence_pallas

            hs, last = slstm_sequence_pallas(wx_heads, R, (h0, c0, n0, m0))
            return hs.reshape(B, S, D).astype(x.dtype), last

        def step(carry, xt):
            h, c, nrm, m = carry  # (B, NH, DH) each
            # recurrent contribution: per-head GEMM h @ R_g
            rh = jnp.einsum("bhd,ghde->gbhe", h, R, preferred_element_type=f32)
            zt = jnp.tanh(xt[:, 0] + rh[0])
            it = xt[:, 1] + rh[1]
            ft = xt[:, 2] + rh[2]
            ot = jax.nn.sigmoid(xt[:, 3] + rh[3])
            m_new = jnp.maximum(ft + m, it)
            ig = jnp.exp(it - m_new)
            fg = jnp.exp(ft + m - m_new)
            c_new = fg * c + ig * zt
            n_new = fg * nrm + ig
            h_new = ot * c_new / jnp.maximum(n_new, 1e-6)
            return (h_new, c_new, n_new, m_new), h_new

        (h_last, c_last, n_last, m_last), hs = jax.lax.scan(
            step, (h0, c0, n0, m0), jnp.moveaxis(wx_heads, 1, 0)
        )
        out = jnp.moveaxis(hs, 0, 1).reshape(B, S, D).astype(x.dtype)
        return out, (h_last, c_last, n_last, m_last)


class sLSTMBlock(nn.Module):
    """Pre-norm sLSTM block with conv front and gated FFN.

    Parity: xlstm/blocks/slstm/block.py semantics.
    """

    dim: int
    num_heads: int = 4
    conv_kernel_size: int = 4
    ffn_proj_factor: float = 1.3334
    training: bool = False

    @nn.compact
    def __call__(self, x):
        xn = RMSNorm(self.dim, name="norm")(x)
        xc = nn.silu(CausalConv1d(self.dim, self.conv_kernel_size, name="conv")(xn))
        y, _ = sLSTMCell(dim=self.dim, num_heads=self.num_heads, name="cell")(xc)
        x = x + nn.Dense(self.dim, kernel_init=wang_init(self.dim, 1), name="proj")(y)
        xf = RMSNorm(self.dim, name="ffn_norm")(x)
        return x + FeedForward(
            dim=self.dim, proj_factor=self.ffn_proj_factor, name="ffn"
        )(xf)


class mLSTMLayerLM(nn.Module):
    """LM-style mLSTM layer (parity: xlstm/blocks/mlstm/layer.py and
    xlstm_large/model.py mLSTMLayer): up-proj -> causal conv + qk -> cell
    -> gated skip -> down-proj."""

    dim: int
    expansion: float = 2.0
    qkv_block_size: int = 64
    conv_kernel_size: int = 4
    chunk_size: int = 64
    training: bool = False
    chunkwise_kernel: str = "chunkwise--native_autograd"

    @nn.compact
    def __call__(self, x):
        D = self.dim
        inner = int(self.expansion * D)
        nh = max(inner // self.qkv_block_size, 1)

        x_inner = nn.Dense(2 * inner, kernel_init=small_init(D), name="proj_up")(x)
        x_mlstm, z = jnp.split(x_inner, 2, axis=-1)
        x_conv = nn.silu(
            CausalConv1d(inner, self.conv_kernel_size, name="conv1d")(x_mlstm)
        )
        q = nn.Dense(inner, kernel_init=small_init(D), name="q_proj")(x_conv)
        k = nn.Dense(inner, kernel_init=small_init(D), name="k_proj")(x_conv)
        v = nn.Dense(inner, kernel_init=small_init(D), name="v_proj")(x_mlstm)
        h = MatrixLSTMCell(
            dim=inner, num_heads=nh, chunk_size=self.chunk_size,
            mode="train_with_padding" if self.training else "inference",
            chunkwise_kernel=self.chunkwise_kernel, name="mlstm_cell",
        )(q, k, v)
        skip = self.param("learnable_skip", nn.initializers.ones, (inner,), f32)
        h = h + skip.astype(h.dtype) * x_conv
        h = h * nn.silu(z)
        return nn.Dense(D, kernel_init=wang_init(D, 1), name="proj_down")(h)


class mLSTMBlock(nn.Module):
    dim: int
    qkv_block_size: int = 64
    chunk_size: int = 64
    ffn_proj_factor: float = 2.6667
    training: bool = False

    @nn.compact
    def __call__(self, x):
        x = x + mLSTMLayerLM(
            dim=self.dim, qkv_block_size=self.qkv_block_size,
            chunk_size=self.chunk_size, training=self.training, name="mlstm_layer",
        )(RMSNorm(self.dim, name="norm_mlstm")(x))
        x = x + FeedForward(
            dim=self.dim, proj_factor=self.ffn_proj_factor, name="ffn"
        )(RMSNorm(self.dim, name="norm_ffn")(x))
        return x


class xLSTMBlockStack(nn.Module):
    """Homogeneous/mixed stack of mLSTM and sLSTM blocks.

    Parity: xlstm/xlstm_block_stack.py — ``slstm_at`` lists the indices
    that use sLSTM blocks (empty = pure mLSTM stack).
    """

    dim: int
    num_blocks: int = 6
    slstm_at: Sequence[int] = ()
    qkv_block_size: int = 64
    chunk_size: int = 64
    training: bool = False

    @nn.compact
    def __call__(self, x):
        for bi in range(self.num_blocks):
            if bi in set(self.slstm_at):
                x = sLSTMBlock(dim=self.dim, training=self.training, name=f"block_{bi}")(x)
            else:
                x = mLSTMBlock(
                    dim=self.dim, qkv_block_size=self.qkv_block_size,
                    chunk_size=self.chunk_size, training=self.training,
                    name=f"block_{bi}",
                )(x)
        return RMSNorm(self.dim, name="out_norm")(x)


class xLSTMLarge(nn.Module):
    """Token LM: embed -> xLSTMBlockStack -> tied/untied head.

    Parity: xlstm/xlstm_large/model.py:1-510 (forward + generate).
    """

    vocab_size: int
    dim: int = 512
    num_blocks: int = 6
    slstm_at: Sequence[int] = ()
    training: bool = False

    @nn.compact
    def __call__(self, tokens):  # (B, S) int32
        emb = nn.Embed(self.vocab_size, self.dim, name="embedding")(tokens)
        h = xLSTMBlockStack(
            dim=self.dim, num_blocks=self.num_blocks, slstm_at=self.slstm_at,
            training=self.training, name="backbone",
        )(emb)
        return nn.Dense(self.vocab_size, use_bias=False, name="lm_head")(h)


def generate(model, variables, prompt, max_new_tokens: int = 32):
    """Greedy decoding (full-prefix recompute; cached-state decode uses
    the inference-mode cell wrappers — future work)."""
    tokens = jnp.asarray(prompt)[None] if jnp.asarray(prompt).ndim == 1 else jnp.asarray(prompt)
    apply = jax.jit(lambda v, t: model.apply(v, t))
    for _ in range(max_new_tokens):
        logits = apply(variables, tokens)
        nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        tokens = jnp.concatenate([tokens, nxt], axis=1)
    return tokens
