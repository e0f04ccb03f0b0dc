"""Recurrent-form mLSTM: single step and scanned sequence (generation path).

TPU equivalents of the reference's fused step kernel and native sequence
scan (ref:mlstm_kernels/triton/recurrent/fw_step_fused.py:19,
ref:mlstm_kernels/jax/recurrent/native_sequence_scan.py).  The siging
variant carries (C, n); the stabilized variant additionally carries m.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

f32 = jnp.float32

__all__ = [
    "mlstm_siging_step",
    "mlstm_siging_recurrent_sequence",
    "mlstm_step_stabilized",
    "mlstm_recurrent_sequence_stabilized",
]


def mlstm_siging_step(
    q: jax.Array,  # (B, NH, DHQK)
    k: jax.Array,
    v: jax.Array,  # (B, NH, DHHV)
    i: jax.Array,  # (B, NH)
    f: jax.Array,  # (B, NH)
    c_state: jax.Array,  # (B, NH, DHQK, DHHV) float32
    n_state: jax.Array,  # (B, NH, DHQK) float32
    qk_scale: float | None = None,
    normalize: bool = True,
    eps: float = 1e-6,
):
    """One timestep of the sigmoid-input-gate mLSTM.

        C' = sig(f) C + sig(i) k v^T;  n' = sig(f) n + sig(i) k
        h  = (qs C') / (max(|qs . n'|, 1) + eps),  qs = q / sqrt(DHQK)
    """
    DHQK = q.shape[-1]
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    fg = jax.nn.sigmoid(f.astype(f32))[..., None]
    ig = jax.nn.sigmoid(i.astype(f32))[..., None]
    kf, vf, qf = k.astype(f32), v.astype(f32), q.astype(f32)

    c_new = fg[..., None] * c_state + (ig * kf)[..., :, None] * vf[..., None, :]
    n_new = fg * n_state + ig * kf
    qs = qf * qk_scale
    num = jnp.einsum("bhd,bhdv->bhv", qs, c_new, preferred_element_type=f32)
    if normalize:
        den = jnp.maximum(jnp.abs(jnp.einsum("bhd,bhd->bh", qs, n_new)), 1.0)
        h = num / (den[..., None] + eps)
    else:
        h = num
    return h.astype(q.dtype), (c_new, n_new)


def mlstm_siging_recurrent_sequence(
    q, k, v, i, f, c_initial=None, n_initial=None, qk_scale=None,
    normalize: bool = True, eps: float = 1e-6, return_last_states: bool = False,
):
    """Scan :func:`mlstm_siging_step` over the S axis. q/k: (B, NH, S, DHQK)."""
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    C0 = c_initial.astype(f32) if c_initial is not None else jnp.zeros((B, NH, DHQK, DHHV), f32)
    n0 = n_initial.astype(f32) if n_initial is not None else jnp.zeros((B, NH, DHQK), f32)

    def step(carry, xs):
        qt, kt, vt, it, ft = xs
        h, carry = mlstm_siging_step(
            qt, kt, vt, it, ft, *carry, qk_scale=qk_scale, normalize=normalize, eps=eps
        )
        return carry, h

    xs = tuple(jnp.moveaxis(t, 2, 0) for t in (q, k, v)) + tuple(
        jnp.moveaxis(t, -1, 0) for t in (i, f)
    )
    (C_last, n_last), h = jax.lax.scan(step, (C0, n0), xs)
    h = jnp.moveaxis(h, 0, 2)
    if return_last_states:
        return h, (C_last, n_last)
    return h


def mlstm_step_stabilized(
    q, k, v, i, f, c_state, n_state, m_state, qk_scale=None, eps: float = 1e-6
):
    """One timestep of the exp-input-gate mLSTM with max-state m.

        m' = max(logsig(f) + m, i)
        C' = exp(logsig(f) + m - m') C + exp(i - m') k v^T
        n' = exp(logsig(f) + m - m') n + exp(i - m') k
        h  = (qs C') / (max(|qs . n'|, exp(-m')) + eps)
    """
    DHQK = q.shape[-1]
    if qk_scale is None:
        qk_scale = DHQK**-0.5
    logf = jax.nn.log_sigmoid(f.astype(f32))  # (B, NH)
    iv = i.astype(f32)
    m_new = jnp.maximum(logf + m_state, iv)
    fbar = jnp.exp(logf + m_state - m_new)[..., None]
    ibar = jnp.exp(iv - m_new)[..., None]
    kf, vf, qf = k.astype(f32), v.astype(f32), q.astype(f32)

    c_new = fbar[..., None] * c_state + (ibar * kf)[..., :, None] * vf[..., None, :]
    n_new = fbar * n_state + ibar * kf
    qs = qf * qk_scale
    num = jnp.einsum("bhd,bhdv->bhv", qs, c_new, preferred_element_type=f32)
    den = jnp.maximum(jnp.abs(jnp.einsum("bhd,bhd->bh", qs, n_new)), jnp.exp(-m_new))
    h = num / (den[..., None] + eps)
    return h.astype(q.dtype), (c_new, n_new, m_new)


def mlstm_recurrent_sequence_stabilized(
    q, k, v, i, f, c_initial=None, n_initial=None, m_initial=None,
    qk_scale=None, eps: float = 1e-6, return_last_states: bool = False,
):
    """Scan :func:`mlstm_step_stabilized` over the S axis."""
    B, NH, S, DHQK = q.shape
    DHHV = v.shape[-1]
    C0 = c_initial.astype(f32) if c_initial is not None else jnp.zeros((B, NH, DHQK, DHHV), f32)
    n0 = n_initial.astype(f32) if n_initial is not None else jnp.zeros((B, NH, DHQK), f32)
    m0 = m_initial.astype(f32) if m_initial is not None else jnp.zeros((B, NH), f32)

    def step(carry, xs):
        qt, kt, vt, it, ft = xs
        h, carry = mlstm_step_stabilized(qt, kt, vt, it, ft, *carry, qk_scale=qk_scale, eps=eps)
        return carry, h

    xs = tuple(jnp.moveaxis(t, 2, 0) for t in (q, k, v)) + tuple(
        jnp.moveaxis(t, -1, 0) for t in (i, f)
    )
    carry, h = jax.lax.scan(step, (C0, n0, m0), xs)
    h = jnp.moveaxis(h, 0, 2)
    if return_last_states:
        return h, carry
    return h
