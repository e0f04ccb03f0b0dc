"""v3 sub-chunked forward vs the v2 forward (interpret mode on CPU).

Same recurrence, different intra-chunk decomposition (Lb-row sub-chunks
with the C-state carried in-kernel) — outputs and ALL saved backward
states must match to fp-reassociation tolerance, so the v2 backward can
consume v3 forward states unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.ops.pallas.chunkwise_fw3 import fw3
from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import _fw

f32 = jnp.float32


def _mk(B, S, NH, DH, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (B, S, NH * DH), f32)
    k = jax.random.normal(ks[1], (B, S, NH * DH), f32)
    v = jax.random.normal(ks[2], (B, S, NH * DH), f32)
    i = jax.random.normal(ks[3], (B, S, NH), f32) - 2.0
    f = jax.random.normal(ks[4], (B, S, NH), f32) + 3.0
    return q, k, v, i, f


@pytest.mark.parametrize("S,L,Lb", [(1024, 256, 128), (640, 640, 128),
                                    (900, 256, 128), (512, 512, 256)])
def test_fw3_matches_v2(S, L, Lb):
    B, NH, DH = 2, 4, 32
    q, k, v, i, f = _mk(B, S, NH, DH)
    kw = dict(num_heads=NH, chunk_size=L, eps=1e-6,
              compute_dtype=jnp.float32)
    h2, n2, cs2, cl2, nl2 = _fw(q, k, v, i, f, **kw)
    h3, n3, cs3, cl3, nl3 = fw3(q, k, v, i, f, sub_chunk=Lb, **kw)
    for name, a, b, tol in [
        ("h", h2, h3, 2e-5), ("nout", n2, n3, 2e-4),
        ("cstates", cs2, cs3, 2e-4), ("clast", cl2, cl3, 2e-4),
        ("nlast", nl2, nl3, 2e-4),
    ]:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b, a, atol=tol * scale, rtol=tol,
                                   err_msg=name)


def test_fw3_initial_state_and_infer():
    B, S, NH, DH, L = 1, 512, 2, 32, 256
    q, k, v, i, f = _mk(B, S, NH, DH, seed=1)
    c0 = jax.random.normal(jax.random.PRNGKey(7), (B, NH, DH, DH), f32)
    n0 = jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (B, NH, DH), f32))
    kw = dict(num_heads=NH, chunk_size=L, eps=1e-6, compute_dtype=jnp.float32,
              c_initial=c0, n_initial=n0)
    h2, _, _, cl2, nl2 = _fw(q, k, v, i, f, **kw)
    h3, n3, cs3, cl3, nl3 = fw3(q, k, v, i, f, sub_chunk=128, **kw)
    np.testing.assert_allclose(np.asarray(h3), np.asarray(h2),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cl3), np.asarray(cl2),
                               atol=1e-4, rtol=1e-4)
    # infer variant (no saved states) agrees with the train variant
    h3i, n3i, cs3i, cl3i, _ = fw3(q, k, v, i, f, save_states=False, **kw)
    assert n3i is None and cs3i is None
    np.testing.assert_array_equal(np.asarray(h3i), np.asarray(h3))
    np.testing.assert_array_equal(np.asarray(cl3i), np.asarray(cl3))
