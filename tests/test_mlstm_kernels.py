"""Kernel equivalence tests: chunkwise/recurrent vs quadratic oracle.

Test-pyramid level 1 per SURVEY.md §4: every linear-time formulation
(chunkwise scan, recurrent scan, step kernel, wrappers) must match the
quadratic parallel form in fw outputs and input gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.ops import (
    get_mlstm_kernel,
    make_backend,
    mLSTMBackendConfig,
    mlstm_chunkwise_stabilized,
    mlstm_parallel_stabilized,
    mlstm_siging_chunkwise,
    mlstm_siging_parallel,
    mlstm_siging_recurrent_sequence,
)
from xlstm_yolo_tpu.ops.wrappers import (
    pick_chunk_size,
    wrap_chunkwise_arbitrary_sequence_length,
    wrap_chunkwise_pad_zeros,
)
from xlstm_yolo_tpu.ops.mlstm_recurrent import (
    mlstm_recurrent_sequence_stabilized,
    mlstm_siging_step,
)

jax.config.update("jax_enable_x64", False)


def make_qkvif(rng, B=2, NH=3, S=64, DHQK=16, DHHV=16, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, NH, S, DHQK)), dtype)
    k = jnp.asarray(rng.normal(size=(B, NH, S, DHQK)), dtype)
    v = jnp.asarray(rng.normal(size=(B, NH, S, DHHV)), dtype)
    i = jnp.asarray(rng.normal(size=(B, NH, S)) - 5.0, dtype)  # ~bias init -10..0
    f = jnp.asarray(rng.normal(size=(B, NH, S)) + 4.0, dtype)  # ~bias init 3..6
    return q, k, v, i, f


@pytest.mark.parametrize("chunk_size", [8, 16, 64])
def test_siging_chunkwise_matches_parallel_fw(rng, chunk_size):
    args = make_qkvif(rng)
    h_ref = mlstm_siging_parallel(*args)
    h_cw = mlstm_siging_chunkwise(*args, chunk_size=chunk_size)
    np.testing.assert_allclose(h_cw, h_ref, atol=2e-5, rtol=1e-4)


def test_siging_chunkwise_matches_parallel_grads(rng):
    args = make_qkvif(rng, S=32)

    def loss_ref(*a):
        return (mlstm_siging_parallel(*a) ** 2).sum()

    def loss_cw(*a):
        return (mlstm_siging_chunkwise(*a, chunk_size=8) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_cw = jax.grad(loss_cw, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_ref, g_cw, "qkvif"):
        np.testing.assert_allclose(b, a, atol=5e-4, rtol=1e-3, err_msg=f"grad {name}")


def test_siging_recurrent_matches_parallel(rng):
    args = make_qkvif(rng, S=24)
    h_ref = mlstm_siging_parallel(*args)
    h_rec = mlstm_siging_recurrent_sequence(*args)
    np.testing.assert_allclose(h_rec, h_ref, atol=2e-5, rtol=1e-4)


def test_siging_step_matches_sequence(rng):
    q, k, v, i, f = make_qkvif(rng, S=5)
    h_seq, (C_seq, n_seq) = mlstm_siging_recurrent_sequence(
        q, k, v, i, f, return_last_states=True
    )
    B, NH, S, DHQK = q.shape
    C = jnp.zeros((B, NH, DHQK, v.shape[-1]), jnp.float32)
    n = jnp.zeros((B, NH, DHQK), jnp.float32)
    hs = []
    for t in range(S):
        h_t, (C, n) = mlstm_siging_step(
            q[:, :, t], k[:, :, t], v[:, :, t], i[:, :, t], f[:, :, t], C, n
        )
        hs.append(h_t)
    h_step = jnp.stack(hs, axis=2)
    np.testing.assert_allclose(h_step, h_seq, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(C, C_seq, atol=1e-5, rtol=1e-4)


def test_chunkwise_state_threading(rng):
    """Chunkwise over two segments with state threading == one segment."""
    q, k, v, i, f = make_qkvif(rng, S=64)
    h_full = mlstm_siging_chunkwise(q, k, v, i, f, chunk_size=16)
    h1, (C, n) = mlstm_siging_chunkwise(
        q[:, :, :32], k[:, :, :32], v[:, :, :32], i[:, :, :32], f[:, :, :32],
        chunk_size=16, return_last_states=True,
    )
    h2 = mlstm_siging_chunkwise(
        q[:, :, 32:], k[:, :, 32:], v[:, :, 32:], i[:, :, 32:], f[:, :, 32:],
        chunk_size=16, c_initial=C, n_initial=n,
    )
    np.testing.assert_allclose(jnp.concatenate([h1, h2], axis=2), h_full, atol=2e-5, rtol=1e-4)


def test_pad_zeros_wrapper_odd_length(rng):
    q, k, v, i, f = make_qkvif(rng, S=50)
    h_ref = mlstm_siging_parallel(q, k, v, i, f)
    h = wrap_chunkwise_pad_zeros(
        mlstm_siging_chunkwise, q, k, v, i, f, chunk_size=16, auto_divisor=False
    )
    np.testing.assert_allclose(h, h_ref, atol=2e-5, rtol=1e-4)
    # divisor mode picks 25 | 50
    h2 = wrap_chunkwise_pad_zeros(
        mlstm_siging_chunkwise, q, k, v, i, f, chunk_size=32, auto_divisor=True
    )
    np.testing.assert_allclose(h2, h_ref, atol=2e-5, rtol=1e-4)


def test_arbitrary_sequence_length_wrapper(rng):
    q, k, v, i, f = make_qkvif(rng, S=77)  # 64 + 13 tail
    h_ref = mlstm_siging_parallel(q, k, v, i, f)
    h, (C, n) = wrap_chunkwise_arbitrary_sequence_length(
        mlstm_siging_chunkwise,
        mlstm_siging_recurrent_sequence,
        mlstm_siging_step,
        q, k, v, i, f, chunk_size=64,
    )
    np.testing.assert_allclose(h, h_ref, atol=3e-5, rtol=1e-4)


def test_stabilized_chunkwise_matches_parallel(rng):
    q, k, v, i, f = make_qkvif(rng, S=32)
    i = i + 5.0  # exp-gate variant: i around 0, may exceed 0
    h_ref = mlstm_parallel_stabilized(q, k, v, i, f)
    h_cw = mlstm_chunkwise_stabilized(q, k, v, i, f, chunk_size=8)
    np.testing.assert_allclose(h_cw, h_ref, atol=3e-5, rtol=1e-4)
    h_rec = mlstm_recurrent_sequence_stabilized(q, k, v, i, f)
    np.testing.assert_allclose(h_rec, h_ref, atol=3e-5, rtol=1e-4)


def test_bf16_inputs_ok(rng):
    args = make_qkvif(rng, dtype=jnp.bfloat16)
    h32 = mlstm_siging_chunkwise(*(a.astype(jnp.float32) for a in args), chunk_size=16)
    h16 = mlstm_siging_chunkwise(*args, chunk_size=16)
    assert h16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        h16.astype(np.float32), h32, atol=5e-2, rtol=5e-2
    )


def test_registry_and_backend(rng):
    fn = get_mlstm_kernel("chunkwise--native_autograd")
    assert fn is mlstm_siging_chunkwise
    args = make_qkvif(rng, S=50)
    backend = make_backend(
        mLSTMBackendConfig(mode="train_with_padding", chunk_size=16)
    )
    h = backend(*args)
    np.testing.assert_allclose(h, mlstm_siging_parallel(*args), atol=2e-5, rtol=1e-4)
    infer = make_backend(
        mLSTMBackendConfig(mode="inference", chunk_size=64, return_last_states=True)
    )
    h2, (C, n) = infer(*args)
    np.testing.assert_allclose(h2, h, atol=3e-5, rtol=1e-4)


def test_pick_chunk_size():
    assert pick_chunk_size(1600, 512) == 400
    assert pick_chunk_size(6400, 512) == 400  # largest divisor of 6400 that is <= 512
    assert pick_chunk_size(400, 256) == 200
    assert pick_chunk_size(100, 64) == 50
    assert pick_chunk_size(512, 512) == 512


def test_chunkwise_siging_grads_finite_with_closed_fgates():
    """r5 real-training NaN: with trained (negative) forget-gate preacts
    the masked upper-triangle logD is large POSITIVE; exp must be masked
    BEFORE exponentiation or where()'s VJP makes 0*inf=NaN gradients
    while the forward stays finite (ops/mlstm_chunkwise.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlstm_yolo_tpu.ops.mlstm_chunkwise import mlstm_siging_chunkwise

    B, NH, S, DH, L = 1, 2, 128, 16, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, NH, S, DH), jnp.float32)
    k = jax.random.normal(ks[1], (B, NH, S, DH), jnp.float32)
    v = jax.random.normal(ks[2], (B, NH, S, DH), jnp.float32)
    i = jax.random.normal(ks[3], (B, NH, S), jnp.float32)
    # strongly closed forget gates: logsig(f) ~ -4 per step -> logD's
    # masked entries reach ~ +250 >> f32 exp overflow (88)
    f = jnp.full((B, NH, S), -4.0) + 0.1 * jax.random.normal(
        ks[4], (B, NH, S), jnp.float32)

    def scal(q, k, v, i, f):
        h = mlstm_siging_chunkwise(q, k, v, i, f, chunk_size=L)
        h = h[0] if isinstance(h, tuple) else h
        return jnp.sum(h.astype(jnp.float32) ** 2)

    val = float(scal(q, k, v, i, f))
    assert np.isfinite(val)
    grads = jax.grad(scal, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    for name, g in zip("qkvif", grads):
        assert bool(jnp.isfinite(g).all()), f"non-finite grad for {name}"
