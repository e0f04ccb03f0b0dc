"""Quadratic (parallel-form) mLSTM references in pure jnp.

These are the numerics oracles for the chunkwise and Pallas kernels:

- :func:`mlstm_siging_parallel` — sigmoid input gate, no max-stabilizer
  state.  Math parity target: ref:mlstm_kernels/torch/parallel/native_siging/fw.py:15
  (the kernel family the ViL-YOLO model actually runs).
- :func:`mlstm_parallel_stabilized` — exp input gate with row-wise
  max stabilization.  Math parity target:
  ref:ultralytics/nn/modules/vision_lstm/vision_lstm2.py:51 and
  ref:mlstm_kernels/torch/parallel/native_stablef/.

Shapes follow the reference convention:
    q, k: (B, NH, S, DHQK)    v: (B, NH, S, DHHV)
    i, f: (B, NH, S)          out: (B, NH, S, DHHV)

All gate math runs in float32 regardless of input dtype; matmuls request
float32 accumulation (MXU-native on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mlstm_siging_parallel", "mlstm_parallel_stabilized"]


def _causal_mask(S: int) -> jax.Array:
    return jnp.tril(jnp.ones((S, S), dtype=bool))


def mlstm_siging_parallel(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    i: jax.Array,
    f: jax.Array,
    eps: float = 1e-6,
    normalize: bool = True,
    stable_fgate: bool = True,
    stopgrad_norm: bool = False,
) -> jax.Array:
    """mLSTM with sigmoid input gate, quadratic formulation.

    ``stopgrad_norm`` detaches the max(|.|,1) denominator like the
    reference backward kernels (for custom-VJP parity tests).

    D[l, j] = exp( sum_{t=j+1..l} logsig(f_t) + logsig(i_j) )   for j <= l
    S       = (q k^T) / sqrt(DHQK)
    n_l     = max(|sum_j S[l,j] D[l,j]|, 1)
    h_l     = sum_j S[l,j] D[l,j] v_j / (n_l + eps)
    """
    B, NH, S, DHQK = q.shape
    f32 = jnp.float32

    log_fg = jax.nn.log_sigmoid(f.astype(f32))  # (B, NH, S)
    log_ig = jax.nn.log_sigmoid(i.astype(f32))  # (B, NH, S)

    if stable_fgate:
        # matLogSigF[l, j] = sum_{t=j+1..l} log_fg[t]; build without
        # cumsum-difference (avoids catastrophic cancellation for long S).
        mat = jnp.tril(jnp.broadcast_to(log_fg[..., :, None], (B, NH, S, S)), k=-1)
        mat_log_fg = jnp.cumsum(mat, axis=-2)
    else:
        csum = jnp.cumsum(log_fg, axis=-1)
        mat_log_fg = csum[..., :, None] - csum[..., None, :]

    ltr = _causal_mask(S)
    mat_log_fg = jnp.where(ltr, mat_log_fg, -jnp.inf)

    log_D = mat_log_fg + log_ig[..., None, :]  # (B, NH, S, S)
    mat_D = jnp.exp(log_D)

    mat_S = jnp.einsum(
        "bhsd,bhtd->bhst", q.astype(f32), k.astype(f32), preferred_element_type=f32
    ) * (DHQK**-0.5)

    mat_C = mat_S * mat_D
    if normalize:
        n = jnp.maximum(jnp.abs(mat_C.sum(-1, keepdims=True)), 1.0)
        if stopgrad_norm:
            n = jax.lax.stop_gradient(n)
        mat_C = mat_C / (n + eps)

    h = jnp.einsum("bhst,bhtd->bhsd", mat_C, v.astype(f32), preferred_element_type=f32)
    return h.astype(q.dtype)


def mlstm_parallel_stabilized(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    i: jax.Array,
    f: jax.Array,
    eps: float = 1e-6,
    stabilize_rowwise: bool = True,
) -> jax.Array:
    """Full mLSTM (exp input gate) with max-stabilized D matrix.

    Mirrors the semantics of the reference ``parallel_stabilized_simple``
    (ref:ultralytics/nn/modules/vision_lstm/vision_lstm2.py:51): the exp()
    arguments are shifted below zero by the per-row (or global) max of
    log D, and the normalizer lower bound is exp(-max).
    """
    B, NH, S, DHQK = q.shape
    f32 = jnp.float32

    log_fg = jax.nn.log_sigmoid(f.astype(f32))  # (B, NH, S)
    csum = jnp.concatenate(
        [jnp.zeros((B, NH, 1), f32), jnp.cumsum(log_fg, axis=-1)], axis=-1
    )  # (B, NH, S+1)
    # log_fg_matrix[l, j] = csum[l+1] - csum[j+1]  (gate at step t not applied to input t)
    mat = csum[..., :, None] - csum[..., None, :]  # (B, NH, S+1, S+1)
    ltr = _causal_mask(S)
    log_fg_matrix = jnp.where(ltr, mat[..., 1:, 1:], -jnp.inf)

    log_D = log_fg_matrix + i.astype(f32)[..., None, :]  # (B, NH, S, S)
    if stabilize_rowwise:
        max_log_D = jnp.max(log_D, axis=-1, keepdims=True)
    else:
        max_log_D = jnp.max(log_D, axis=(-2, -1), keepdims=True)
    mat_D = jnp.exp(log_D - max_log_D)

    ks = k.astype(f32) * (DHQK**-0.5)
    qk = jnp.einsum("bhsd,bhtd->bhst", q.astype(f32), ks, preferred_element_type=f32)
    mat_C = qk * mat_D
    n = jnp.maximum(jnp.abs(mat_C.sum(-1, keepdims=True)), jnp.exp(-max_log_D))
    h = jnp.einsum(
        "bhst,bhtd->bhsd", mat_C / (n + eps), v.astype(f32), preferred_element_type=f32
    )
    return h.astype(q.dtype)
