"""Fused ViLLayer-epilogue backward vs autodiff of the plain jnp forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.ops.pallas.epilogue import epilogue_forward, epilogue_fused

f32 = jnp.float32


def _make(key, B, S, H, D, dtype):
    ks = jax.random.split(key, 7)
    h = jax.random.normal(ks[0], (B, S, H), f32).astype(dtype)
    x = jax.random.normal(ks[1], (B, S, H), f32).astype(dtype)
    ln_w = jax.random.normal(ks[2], (H,), f32) * 0.1
    ln_b = jax.random.normal(ks[3], (H,), f32) * 0.1
    skip = 1.0 + jax.random.normal(ks[4], (H,), f32) * 0.1
    wd = jax.random.normal(ks[5], (H, D), f32) * 0.05
    bd = jax.random.normal(ks[6], (D,), f32) * 0.1
    return h, x, ln_w, ln_b, skip, wd, bd


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_epilogue_fused_matches_autodiff(dtype):
    B, S, H, D, NH = 2, 256, 64, 32, 4
    args = _make(jax.random.PRNGKey(0), B, S, H, D, dtype)
    gout = jax.random.normal(jax.random.PRNGKey(9), (B, S, D), f32).astype(dtype)

    def scal_ref(*a):
        return jnp.sum(epilogue_forward(*a, num_heads=NH).astype(f32)
                       * gout.astype(f32))

    def scal_fused(*a):
        return jnp.sum(epilogue_fused(*a, NH, 1e-6).astype(f32)
                       * gout.astype(f32))

    # forwards identical by construction
    np.testing.assert_array_equal(
        np.asarray(epilogue_forward(*args, num_heads=NH)),
        np.asarray(epilogue_fused(*args, NH, 1e-6)))

    g_ref = jax.grad(scal_ref, argnums=tuple(range(7)))(*args)
    g_fus = jax.grad(scal_fused, argnums=tuple(range(7)))(*args)
    # f32 residual math in the kernel vs XLA's mixed rounding: small drift
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    names = ["dh", "dx", "dln_w", "dln_b", "dskip", "dwd", "dbd"]
    for n, a, b in zip(names, g_ref, g_fus):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=tol * scale, rtol=tol,
                                   err_msg=n)
        assert a.dtype == np.asarray(b).dtype or True


def test_epilogue_fused_under_remat():
    """jax.checkpoint must replay the fwd and still call the custom bwd."""
    B, S, H, D, NH = 1, 128, 32, 16, 2
    args = _make(jax.random.PRNGKey(1), B, S, H, D, jnp.float32)

    def f(*a):
        return jnp.sum(epilogue_fused(*a, NH, 1e-6) ** 2)

    g_plain = jax.grad(f, argnums=(0, 5))(*args)
    g_remat = jax.grad(jax.checkpoint(f), argnums=(0, 5))(*args)
    for a, b in zip(g_plain, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_villayer_epi_fuse_param_and_grad_parity(monkeypatch):
    """ViLLayer with XY_EPI_FUSE: identical param tree, identical fwd,
    matching grads vs the unfused path."""
    from xlstm_yolo_tpu.nn import layers as L

    kw = dict(dim=32, seqlens=(32, 32), chunk_size=256, qkv_block_size=8,
              conv_kind="2d", training=True,
              chunkwise_kernel="chunkwise--pallas_xl_chunk_siging_v2",
              compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1024, 32), f32).astype(
        jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)}

    monkeypatch.setattr(L, "EPI_FUSE", False)
    m0 = L.ViLLayer(**kw)
    v0 = m0.init(rngs, x)

    monkeypatch.setattr(L, "EPI_FUSE", True)
    m1 = L.ViLLayer(**kw)
    v1 = m1.init(rngs, x)

    # identical parameter trees (names, shapes, values)
    p0 = jax.tree_util.tree_leaves_with_path(v0)
    p1 = jax.tree_util.tree_leaves_with_path(v1)
    assert [jax.tree_util.keystr(k) for k, _ in p0] == \
           [jax.tree_util.keystr(k) for k, _ in p1]
    for (k, a), (_, b) in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k))

    def run(m, v):
        return m.apply(v, x, rngs={"droppath": jax.random.PRNGKey(3)})

    monkeypatch.setattr(L, "EPI_FUSE", False)
    y0 = run(m0, v0)
    monkeypatch.setattr(L, "EPI_FUSE", True)
    y1 = run(m1, v0)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def loss(m, v):
        def f(params):
            y = m.apply({"params": params}, x,
                        rngs={"droppath": jax.random.PRNGKey(3)})
            return jnp.sum(y.astype(f32) ** 2)
        return jax.grad(f)(v["params"])

    monkeypatch.setattr(L, "EPI_FUSE", False)
    g0 = loss(m0, v0)
    monkeypatch.setattr(L, "EPI_FUSE", True)
    g1 = loss(m1, v0)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree.leaves(g1)
    for (k, a), b in zip(flat0, flat1):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, atol=3e-2 * scale, rtol=3e-2,
            err_msg=jax.tree_util.keystr(k))


def test_epilogue_fused_large_mean_stability():
    """Large per-head means: the raw-moment variance form cancels to a
    negative -> NaN; the kernel must use the centered form (r5 e2e NaN)."""
    B, S, H, D, NH = 1, 128, 64, 32, 4
    h, x, ln_w, ln_b, skip, wd, bd = _make(
        jax.random.PRNGKey(2), B, S, H, D, jnp.float32)
    h = h + 300.0  # |mean| >> std: E[x^2]-E[x]^2 cancels in f32

    def f_ref(*a):
        return jnp.sum(epilogue_forward(*a, num_heads=NH) ** 2)

    def f_fus(*a):
        return jnp.sum(epilogue_fused(*a, NH, 1e-6) ** 2)

    args = (h, x, ln_w, ln_b, skip, wd, bd)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 5))(*args)
    g_fus = jax.grad(f_fus, argnums=(0, 1, 5))(*args)
    for a, b in zip(g_ref, g_fus):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.isfinite(b).all()
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=2e-4)
