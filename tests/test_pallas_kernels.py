"""Pallas chunkwise kernel vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.ops import get_mlstm_kernel, mlstm_siging_chunkwise
from xlstm_yolo_tpu.ops.pallas.chunkwise import mlstm_siging_chunkwise_pallas


def make_args(rng, B=2, NH=3, S=64, DHQK=16, DHHV=16):
    q = jnp.asarray(rng.normal(size=(B, NH, S, DHQK)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, NH, S, DHQK)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, NH, S, DHHV)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, NH, S)) - 5.0, jnp.float32)
    f = jnp.asarray(rng.normal(size=(B, NH, S)) + 4.0, jnp.float32)
    return q, k, v, i, f


def test_registry_exposes_pallas():
    fn = get_mlstm_kernel("chunkwise--pallas_xl_chunk_siging")
    assert fn is mlstm_siging_chunkwise_pallas


@pytest.mark.parametrize("chunk_size", [16, 32])
def test_pallas_fw_matches_jnp(rng, chunk_size):
    args = make_args(rng)
    h_ref = mlstm_siging_chunkwise(*args, chunk_size=chunk_size)
    h_pl = mlstm_siging_chunkwise_pallas(
        *args, chunk_size=chunk_size, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=3e-5, rtol=1e-4)


def test_pallas_fw_with_states(rng):
    q, k, v, i, f = make_args(rng, S=32)
    h_full = mlstm_siging_chunkwise_pallas(
        q, k, v, i, f, chunk_size=16, compute_dtype=jnp.float32
    )
    h1, (C, n) = mlstm_siging_chunkwise_pallas(
        q[:, :, :16], k[:, :, :16], v[:, :, :16], i[:, :, :16], f[:, :, :16],
        chunk_size=16, return_last_states=True, compute_dtype=jnp.float32,
    )
    h2 = mlstm_siging_chunkwise_pallas(
        q[:, :, 16:], k[:, :, 16:], v[:, :, 16:], i[:, :, 16:], f[:, :, 16:],
        chunk_size=16, c_initial=C, n_initial=n, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([h1, h2], axis=2)), np.asarray(h_full),
        atol=3e-5, rtol=1e-4,
    )


def test_pallas_grads_match_jnp(rng):
    """The hand-written VJP must agree with JAX AD of the jnp scan —
    *with* the denominator stop-gradient semantics the reference uses."""
    args = make_args(rng, B=1, NH=2, S=32, DHQK=8, DHHV=8)

    def loss_pl(*a):
        return (mlstm_siging_chunkwise_pallas(
            *a, chunk_size=16, compute_dtype=jnp.float32
        ) ** 2).sum()

    # jnp reference with the same stop-grad-through-denominator semantics
    def loss_ref(*a):
        return (mlstm_siging_chunkwise(
            *a, chunk_size=16, stopgrad_norm=True
        ) ** 2).sum()

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_ref, g_pl, "qkvif"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=5e-3, err_msg=f"grad {name}"
        )


def test_pallas_step_matches_native(rng):
    from xlstm_yolo_tpu.ops.mlstm_recurrent import mlstm_siging_step
    from xlstm_yolo_tpu.ops.pallas.step import mlstm_siging_step_pallas

    B, NH, DH = 2, 3, 16
    q = jnp.asarray(rng.normal(size=(B, NH, DH)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, NH, DH)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, NH, DH)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, NH)) - 5, jnp.float32)
    f = jnp.asarray(rng.normal(size=(B, NH)) + 4, jnp.float32)
    C = jnp.asarray(rng.normal(size=(B, NH, DH, DH)), jnp.float32)
    n = jnp.asarray(rng.normal(size=(B, NH, DH)), jnp.float32)

    h_ref, (C_ref, n_ref) = mlstm_siging_step(q, k, v, i, f, C, n)
    h_pl, (C_pl, n_pl) = mlstm_siging_step_pallas(q, k, v, i, f, C, n)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(C_pl), np.asarray(C_ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(n_pl), np.asarray(n_ref), atol=2e-5, rtol=1e-4)


def test_pallas_exp_gate_fw_matches_jnp(rng):
    from xlstm_yolo_tpu.ops import mlstm_chunkwise_stabilized
    from xlstm_yolo_tpu.ops.pallas.chunkwise_exp import mlstm_chunkwise_exp_pallas

    B, NH, S, DH = 2, 3, 64, 16
    q = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, NH, S)), jnp.float32)  # raw exp gate
    f = jnp.asarray(rng.normal(size=(B, NH, S)) + 4.0, jnp.float32)
    h_ref = mlstm_chunkwise_stabilized(q, k, v, i, f, chunk_size=16)
    h_pl = mlstm_chunkwise_exp_pallas(
        q, k, v, i, f, chunk_size=16, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=3e-5, rtol=1e-4)


def test_pallas_v2_head_grouped_matches_jnp(rng):
    from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import mlstm_siging_chunkwise_pallas_v2

    args = make_args(rng, B=2, NH=4, S=64, DHQK=16, DHHV=16)
    h_ref = mlstm_siging_chunkwise(*args, chunk_size=16)
    h_v2 = mlstm_siging_chunkwise_pallas_v2(
        *args, chunk_size=16, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(h_v2), np.asarray(h_ref), atol=3e-5, rtol=1e-4)
    # head grouping smaller than NH also works (G=2 over B*NH=8)
    h_g2 = mlstm_siging_chunkwise_pallas_v2(
        *args, chunk_size=16, head_group=2, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(h_g2), np.asarray(h_ref), atol=3e-5, rtol=1e-4)


def test_pallas_v2_ragged_and_bsh(rng):
    """v2 handles non-multiple S in-kernel (masked last chunk) and its
    (B, S, H) entry matches the (B, NH, S, DH) registry convention."""
    from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import (
        mlstm_siging_chunkwise_pallas_v2 as v2,
        mlstm_siging_chunkwise_pallas_v2_bsh as v2_bsh,
    )

    B, NH, S, DH, L = 2, 4, 50, 16, 16  # S % L != 0
    q, k, v, i, f = make_args(rng, B=B, NH=NH, S=S, DHQK=DH, DHHV=DH)
    h_ref = mlstm_siging_chunkwise(q, k, v, i, f, chunk_size=10)
    h_v2 = v2(q, k, v, i, f, chunk_size=L, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(h_v2), np.asarray(h_ref), atol=3e-5, rtol=1e-4)

    to_bsh = lambda x: jnp.swapaxes(x, 1, 2).reshape(B, S, -1)
    h_bsh = v2_bsh(
        to_bsh(q), to_bsh(k), to_bsh(v),
        jnp.swapaxes(i, 1, 2), jnp.swapaxes(f, 1, 2),
        num_heads=NH, chunk_size=L, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(h_bsh.reshape(B, S, NH, DH), 1, 2)),
        np.asarray(h_ref), atol=3e-5, rtol=1e-4,
    )

    # grads through the ragged path vs jnp AD (stop-grad denominator)
    def loss_v2(*a):
        return (v2(*a, chunk_size=L, compute_dtype=jnp.float32) ** 2).sum()

    def loss_ref(*a):
        return (mlstm_siging_chunkwise(*a, chunk_size=10, stopgrad_norm=True) ** 2).sum()

    g_v2 = jax.grad(loss_v2, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    for a, b, name in zip(g_ref, g_v2, "qkvif"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=5e-3, err_msg=f"grad {name}"
        )


def test_model_v2_kernel_matches_native(rng):
    """Tiny model, same params: v2 Pallas path == native scan (pre-topk)."""
    from pathlib import Path
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    cfg = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-tiny.yaml"
    m1, _ = build_detection_model(cfg, decode_only=True)
    m2, _ = build_detection_model(
        cfg, chunkwise_kernel="chunkwise--pallas_xl_chunk_siging_v2", decode_only=True
    )
    x = jnp.asarray(rng.normal(0.45, 0.2, (2, 160, 160, 3)), jnp.float32)
    variables = jax.jit(m1.init)(jax.random.PRNGKey(0), x)
    y1, _ = m1.apply(variables, x)
    y2, _ = m2.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y2[..., :4]), np.asarray(y1[..., :4]), atol=0.05, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(y2[..., 4:]), np.asarray(y1[..., 4:]), atol=1e-4, rtol=1e-3
    )


def test_pallas_exp_gate_grads_and_states(rng):
    """Exp-gate Pallas custom VJP vs jnp AD with stop-grad stabilizers
    (the reference bw treats scaM/m_comb/den as constants); plus state
    threading through (C, n, m)."""
    from xlstm_yolo_tpu.ops import mlstm_chunkwise_stabilized
    from xlstm_yolo_tpu.ops.pallas.chunkwise_exp import mlstm_chunkwise_exp_pallas as pe

    B, NH, S, DH, L = 2, 3, 64, 16, 16
    q = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, NH, S)), jnp.float32)  # raw exp gate
    f = jnp.asarray(rng.normal(size=(B, NH, S)) + 4.0, jnp.float32)

    def loss_pl(*a):
        return (pe(*a, chunk_size=L, compute_dtype=jnp.float32) ** 2).sum()

    def loss_ref(*a):
        return (mlstm_chunkwise_stabilized(*a, chunk_size=L, stopgrad_norm=True) ** 2).sum()

    gp = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    for a, b, name in zip(gr, gp, "qkvif"):
        scale = float(jnp.abs(a).max())  # exp-gate grads reach ~1e4
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=2e-6 * max(scale, 1.0),
            err_msg=f"grad {name}",
        )

    h_ref = mlstm_chunkwise_stabilized(q, k, v, i, f, chunk_size=L)
    h1, st = pe(q[:, :, :32], k[:, :, :32], v[:, :, :32], i[:, :, :32], f[:, :, :32],
                chunk_size=L, return_last_states=True, compute_dtype=jnp.float32)
    h2 = pe(q[:, :, 32:], k[:, :, 32:], v[:, :, 32:], i[:, :, 32:], f[:, :, 32:],
            chunk_size=L, c_initial=st[0], n_initial=st[1], m_initial=st[2],
            compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([h1, h2], 2)), np.asarray(h_ref),
        atol=3e-5, rtol=1e-4,
    )


def test_pallas_v2_bw_head_group_split(rng, monkeypatch):
    """The dQKV head-group split path (G < NH, 5-D gate views) stays
    grad-exact; on hardware it engages when VMEM budget forces it."""
    from xlstm_yolo_tpu.ops.pallas import chunkwise_v2 as m

    monkeypatch.setattr(m, "_bw_head_group", lambda NH, L, dqk, dhv, *a: 2)
    q, k, v, i, f = make_args(rng, B=2, NH=4, S=48, DHQK=16, DHHV=16)

    def loss_v2(*a):
        return (m.mlstm_siging_chunkwise_pallas_v2(
            *a, chunk_size=16, compute_dtype=jnp.float32) ** 2).sum()

    def loss_ref(*a):
        return (mlstm_siging_chunkwise(*a, chunk_size=16, stopgrad_norm=True) ** 2).sum()

    g_v2 = jax.grad(loss_v2, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    for a, b, name in zip(g_ref, g_v2, "qkvif"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=5e-3, err_msg=f"grad {name}"
        )


def test_pallas_quadratic_flash_matches_oracle(rng):
    """Flash-style quadratic siging kernel (fw + custom-VJP bw) vs the
    jnp oracle (ref: triton/parallel/limit_headdim fw/bw kernels)."""
    from xlstm_yolo_tpu.ops.mlstm_parallel import mlstm_siging_parallel
    from xlstm_yolo_tpu.ops.pallas.parallel import mlstm_siging_parallel_pallas as pp

    q, k, v, i, f = make_args(rng, B=2, NH=3, S=64, DHQK=16, DHHV=16)
    h_ref = mlstm_siging_parallel(q, k, v, i, f)
    h_pl = pp(q, k, v, i, f, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=3e-5, rtol=1e-4)

    def lp(*a):
        return (pp(*a, compute_dtype=jnp.float32) ** 2).sum()

    def lr(*a):
        return (mlstm_siging_parallel(*a, stopgrad_norm=True) ** 2).sum()

    gp = jax.grad(lp, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    for a, b, name in zip(gr, gp, "qkvif"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3, err_msg=f"grad {name}"
        )


def test_slstm_pallas_matches_scan(rng):
    """Fused sLSTM Pallas scan == the lax.scan cell (the CUDA-extension
    counterpart, ref:slstm/src/cuda/slstm_forward.cu)."""
    from xlstm_yolo_tpu.nn.xlstm import sLSTMCell

    x = jnp.asarray(rng.normal(size=(2, 24, 32)), jnp.float32)
    cell = sLSTMCell(dim=32, num_heads=4)
    variables = cell.init(jax.random.PRNGKey(0), x)
    y_s, st_s = cell.apply(variables, x)
    y_p, st_p = sLSTMCell(dim=32, num_heads=4, backend="pallas").apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s), atol=1e-5)
    for a, b in zip(st_s, st_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_v2_fused_outnorm_matches_native_cell(rng):
    """Inference cell with the LN epilogue fused into the v2 kernel ==
    native-kernel cell with the separate MultiHeadLayerNorm (f32)."""
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.layers import MatrixLSTMCell

    B, S, H, NH = 2, 1536, 64, 4  # S >= 1024 so the v2 path engages
    q = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)

    cell_v2 = MatrixLSTMCell(dim=H, num_heads=NH, chunk_size=256,
                             mode="inference", fuse_outnorm=True,
                             chunkwise_kernel="chunkwise--pallas_xl_chunk_siging_v2")
    cell_nat = MatrixLSTMCell(dim=H, num_heads=NH, chunk_size=256,
                              mode="inference",
                              chunkwise_kernel="chunkwise--native_autograd")
    variables = cell_nat.init(jax.random.PRNGKey(0), q, k, v)
    # non-trivial norm params so the fusion is actually exercised
    p = jax.tree.map(np.asarray, variables["params"])
    r2 = np.random.default_rng(1)
    p["outnorm"]["weight"] = r2.normal(size=H).astype(np.float32) * 0.3
    p["outnorm"]["bias"] = r2.normal(size=H).astype(np.float32) * 0.1
    variables = {"params": jax.tree.map(jnp.asarray, p)}

    h_nat = cell_nat.apply(variables, q, k, v)
    h_v2 = cell_v2.apply(variables, q, k, v)
    np.testing.assert_allclose(np.asarray(h_v2), np.asarray(h_nat),
                               atol=3e-4, rtol=1e-3)


def test_pallas_c_initial_grad_matches_jnp(rng):
    """Gradient w.r.t. c_initial must be the grad of the state *before*
    chunk 0 (decay + chunk-0 h_inter term), not the raw dC_after-chunk-0
    the reverse scan stores at slot 0 — the sequence-parallel train path
    differentiates through threaded inbound states (parallel/sequence.py)."""
    from xlstm_yolo_tpu.ops.mlstm_chunkwise import mlstm_chunkwise_stabilized
    from xlstm_yolo_tpu.ops.pallas.chunkwise_exp import mlstm_chunkwise_exp_pallas
    from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import (
        mlstm_siging_chunkwise_pallas_v2,
    )

    B, NH, S, DH, L = 1, 2, 64, 8, 16
    q, k, v, i, f = make_args(rng, B=B, NH=NH, S=S, DHQK=DH, DHHV=DH)
    c0 = jnp.asarray(rng.normal(size=(B, NH, DH, DH)), jnp.float32) * 0.1
    n0 = jnp.asarray(rng.normal(size=(B, NH, DH)), jnp.float32) * 0.1

    cases = [
        (
            lambda c: mlstm_siging_chunkwise_pallas(
                q, k, v, i, f, chunk_size=L, c_initial=c, n_initial=n0,
                compute_dtype=jnp.float32),
            lambda c: mlstm_siging_chunkwise(
                q, k, v, i, f, chunk_size=L, c_initial=c, n_initial=n0,
                stopgrad_norm=True),
        ),
        (
            lambda c: mlstm_siging_chunkwise_pallas_v2(
                q, k, v, i, f, chunk_size=L, c_initial=c, n_initial=n0,
                compute_dtype=jnp.float32),
            lambda c: mlstm_siging_chunkwise(
                q, k, v, i, f, chunk_size=L, c_initial=c, n_initial=n0,
                stopgrad_norm=True),
        ),
        (
            lambda c: mlstm_chunkwise_exp_pallas(
                q, k, v, i, f, chunk_size=L, c_initial=c, n_initial=n0,
                m_initial=jnp.zeros((B, NH), jnp.float32),
                compute_dtype=jnp.float32),
            lambda c: mlstm_chunkwise_stabilized(
                q, k, v, i, f, chunk_size=L, c_initial=c, n_initial=n0,
                m_initial=jnp.zeros((B, NH), jnp.float32),
                stopgrad_norm=True),
        ),
    ]
    for name, (pl_fn, ref_fn) in zip(["v1", "v2", "exp"], cases):
        g_pl = jax.grad(lambda c: (pl_fn(c) ** 2).sum())(c0)
        g_ref = jax.grad(lambda c: (ref_fn(c) ** 2).sum())(c0)
        np.testing.assert_allclose(
            np.asarray(g_pl), np.asarray(g_ref), atol=2e-4, rtol=2e-3,
            err_msg=f"c_initial grad ({name})",
        )


def test_pallas_v2_bw_col_variant_matches_row(rng, monkeypatch):
    """XY_V2_BW=col (transposed (DH, L) grad outputs, full MXU lane
    width) must produce the same grads as the row form, including the
    ragged tail and c_initial."""
    from xlstm_yolo_tpu.ops.pallas import chunkwise_v2 as m

    B, NH, S, DH, L = 1, 2, 72, 8, 16  # S % L != 0: ragged path
    H = NH * DH
    q = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, S, NH)) - 5.0, jnp.float32)
    f = jnp.asarray(rng.normal(size=(B, S, NH)) + 4.0, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, NH, DH, DH)), jnp.float32) * 0.1
    n0 = jnp.asarray(rng.normal(size=(B, NH, DH)), jnp.float32) * 0.1

    def grads():
        def loss(q, k, v, i, f, c0):
            h = m.mlstm_siging_chunkwise_pallas_v2_bsh(
                q, k, v, i, f, num_heads=NH, chunk_size=L,
                c_initial=c0, n_initial=n0, compute_dtype=jnp.float32)
            return (h ** 2).sum()
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, i, f, c0)

    monkeypatch.setattr(m, "BW_VARIANT", "row")
    g_row = grads()
    monkeypatch.setattr(m, "BW_VARIANT", "col")
    g_col = grads()
    for a, b, name in zip(g_row, g_col, ["q", "k", "v", "i", "f", "c0"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5,
            err_msg=f"col-variant grad {name}",
        )


def test_pallas_v2_bw_multichunk_matches_single(rng, monkeypatch):
    """CC > 1 (multiple chunks per bw grid step, amortizing the per-step
    pipeline floor) must be grad-exact vs the CC=1 launch, including
    c_initial and the in-kernel reverse chunk order."""
    from xlstm_yolo_tpu.ops.pallas import chunkwise_v2 as m

    B, NH, S, DH, L = 2, 4, 64, 16, 16  # NC = 4: CC in {2, 4} legal
    H = NH * DH
    q = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, S, NH)) - 5.0, jnp.float32)
    f = jnp.asarray(rng.normal(size=(B, S, NH)) + 4.0, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, NH, DH, DH)), jnp.float32) * 0.1
    n0 = jnp.asarray(rng.normal(size=(B, NH, DH)), jnp.float32) * 0.1

    def grads():
        def loss(q, k, v, i, f, c0):
            h = m.mlstm_siging_chunkwise_pallas_v2_bsh(
                q, k, v, i, f, num_heads=NH, chunk_size=L,
                c_initial=c0, n_initial=n0, compute_dtype=jnp.float32)
            return (h ** 2).sum()
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, i, f, c0)

    monkeypatch.setitem(m.BW_CFG, "cc", 0)
    g_ref = grads()
    for cc, g_over, fuseg in ((2, 0, 0), (4, 0, 0), (2, 2, 0), (4, 4, 0),
                              (1, 0, 1), (2, 0, 1), (4, 4, 1)):
        monkeypatch.setitem(m.BW_CFG, "cc", cc)
        monkeypatch.setitem(m.BW_CFG, "g", g_over)
        monkeypatch.setitem(m.BW_CFG, "fuse_gates", fuseg)
        g_cc = grads()
        for a, b, name in zip(g_ref, g_cc, ["q", "k", "v", "i", "f", "c0"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5,
                err_msg=f"CC={cc} G={g_over} fuseg={fuseg} grad {name}",
            )
    monkeypatch.setitem(m.BW_CFG, "fuse_gates", 0)
    # illegal CC (NC % CC != 0 after ragged fallback) silently degrades to 1
    monkeypatch.setitem(m.BW_CFG, "cc", 3)
    monkeypatch.setitem(m.BW_CFG, "g", 0)
    g_bad = grads()
    for a, b in zip(g_ref, g_bad):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


def test_pallas_v2_bw_fused_gates_ragged(rng, monkeypatch):
    """fuse_gates emits in-kernel gate-grad rows; the padded tail rows
    must be sliced away exactly (ragged S) vs the XLA epilogue path."""
    from xlstm_yolo_tpu.ops.pallas import chunkwise_v2 as m

    B, NH, S, DH, L = 1, 2, 72, 8, 16  # S % L != 0
    H = NH * DH
    q = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, S, NH)) - 5.0, jnp.float32)
    f = jnp.asarray(rng.normal(size=(B, S, NH)) + 4.0, jnp.float32)

    def grads():
        def loss(q, k, v, i, f):
            h = m.mlstm_siging_chunkwise_pallas_v2_bsh(
                q, k, v, i, f, num_heads=NH, chunk_size=L,
                compute_dtype=jnp.float32)
            return (h ** 2).sum()
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)

    monkeypatch.setitem(m.BW_CFG, "fuse_gates", 0)
    g_ref = grads()
    monkeypatch.setitem(m.BW_CFG, "fuse_gates", 1)
    g_fg = grads()
    for a, b, name in zip(g_ref, g_fg, "qkvif"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5,
            err_msg=f"fused-gates ragged grad {name}",
        )


def test_pallas_v2_dmode_exp2_matches_exp(rng, monkeypatch):
    """D_MODE=exp2 (log2e-scaled exp2) must reproduce exp to fp rounding
    in both fw and bw."""
    from xlstm_yolo_tpu.ops.pallas import chunkwise_v2 as m

    B, NH, S, DH, L = 2, 4, 64, 16, 16
    H = NH * DH
    q = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, S, NH)) - 5.0, jnp.float32)
    f = jnp.asarray(rng.normal(size=(B, S, NH)) + 4.0, jnp.float32)

    def run():
        def loss(q, k, v, i, f):
            h = m.mlstm_siging_chunkwise_pallas_v2_bsh(
                q, k, v, i, f, num_heads=NH, chunk_size=L,
                compute_dtype=jnp.float32)
            return (h ** 2).sum(), h
        (l, h), g = jax.value_and_grad(loss, argnums=(0, 1, 3, 4),
                                       has_aux=True)(q, k, v, i, f)
        return h, g

    monkeypatch.setattr(m, "D_MODE", "exp")
    h0, g0 = run()
    monkeypatch.setattr(m, "D_MODE", "exp2")
    h1, g1 = run()
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=2e-6, rtol=2e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-5)
