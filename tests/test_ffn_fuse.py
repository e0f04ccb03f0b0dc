"""Fused FFN-branch backward vs autodiff of the plain jnp forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.ops.pallas.ffn import ffn_forward, ffn_fused

f32 = jnp.float32


def _make(key, B, S, D, U, dtype):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (B, S, D), f32).astype(dtype)
    wn = 1.0 + jax.random.normal(ks[1], (D,), f32) * 0.1
    wgz = jax.random.normal(ks[2], (D, 2 * U), f32) * 0.05
    bgz = jax.random.normal(ks[3], (2 * U,), f32) * 0.1
    wd = jax.random.normal(ks[4], (U, D), f32) * 0.05
    bd = jax.random.normal(ks[5], (D,), f32) * 0.1
    return x, wn, wgz, bgz, wd, bd


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ffn_fused_matches_autodiff(dtype):
    B, S, D, U = 2, 256, 64, 128
    args = _make(jax.random.PRNGKey(0), B, S, D, U, dtype)
    gout = jax.random.normal(jax.random.PRNGKey(9), (B, S, D), f32).astype(dtype)

    def scal_ref(*a):
        out, _ = ffn_forward(*a)
        return jnp.sum(out.astype(f32) * gout.astype(f32))

    def scal_fused(*a):
        return jnp.sum(ffn_fused(*a, 1e-6).astype(f32) * gout.astype(f32))

    np.testing.assert_array_equal(
        np.asarray(ffn_forward(*args)[0]),
        np.asarray(ffn_fused(*args, 1e-6)))

    g_ref = jax.grad(scal_ref, argnums=tuple(range(6)))(*args)
    g_fus = jax.grad(scal_fused, argnums=tuple(range(6)))(*args)
    tol = 2e-6 if dtype == jnp.float32 else 3e-2
    names = ["dx", "dwn", "dwgz", "dbgz", "dwd", "dbd"]
    for n, a, b in zip(names, g_ref, g_fus):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=tol * scale, rtol=tol,
                                   err_msg=n)


def test_villayer_ffn_fuse_param_and_grad_parity(monkeypatch):
    """ViLLayer with XY_FFN_FUSE: identical param tree, identical fwd,
    matching grads vs the unfused path."""
    from xlstm_yolo_tpu.nn import layers as L

    kw = dict(dim=32, seqlens=(32, 32), chunk_size=256, qkv_block_size=8,
              conv_kind="2d", training=True,
              chunkwise_kernel="chunkwise--pallas_xl_chunk_siging_v2",
              compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1024, 32), f32).astype(
        jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)}

    monkeypatch.setattr(L, "FFN_FUSE", False)
    m = L.ViLLayer(**kw)
    v0 = m.init(rngs, x)
    monkeypatch.setattr(L, "FFN_FUSE", True)
    v1 = L.ViLLayer(**kw).init(rngs, x)

    p0 = jax.tree_util.tree_leaves_with_path(v0)
    p1 = jax.tree_util.tree_leaves_with_path(v1)
    assert [jax.tree_util.keystr(k) for k, _ in p0] == \
           [jax.tree_util.keystr(k) for k, _ in p1]
    for (k, a), (_, b) in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k))

    def run():
        return m.apply(v0, x, rngs={"droppath": jax.random.PRNGKey(3)})

    monkeypatch.setattr(L, "FFN_FUSE", False)
    y0 = run()
    monkeypatch.setattr(L, "FFN_FUSE", True)
    y1 = run()
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def grads():
        def f(params):
            y = m.apply({"params": params}, x,
                        rngs={"droppath": jax.random.PRNGKey(3)})
            return jnp.sum(y.astype(f32) ** 2)
        return jax.grad(f)(v0["params"])

    monkeypatch.setattr(L, "FFN_FUSE", False)
    g0 = grads()
    monkeypatch.setattr(L, "FFN_FUSE", True)
    g1 = grads()
    for (k, a), b in zip(jax.tree_util.tree_leaves_with_path(g0),
                         jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=3e-2 * scale, rtol=3e-2,
                                   err_msg=jax.tree_util.keystr(k))
