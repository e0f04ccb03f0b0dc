"""Analysis tools: FLOP counter + transfer behavior (ref:mlstm_kernels
analysis suite parity, XLA-native)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.utils.analysis import (
    count_params, plot_transfer_behavior, program_cost, transfer_behavior,
)


def test_program_cost_matmul():
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 64), jnp.float32)
    cost = program_cost(lambda x, y: x @ y, a, b)
    # 2*M*N*K FLOPs
    assert cost["flops"] == 2 * 128 * 256 * 64
    assert cost["bytes_accessed"] > 0
    assert cost["arithmetic_intensity"] > 0


def test_count_params():
    tree = {"params": {"w": np.zeros((3, 4)), "b": np.zeros((4,))}}
    assert count_params(tree) == 16


def test_transfer_behavior_rows(tmp_path):
    def kern(q, k):
        return jnp.einsum("sd,td->st", q, k)

    def make_args(S, i):
        return (jnp.full((S, 8), float(i + 1)), jnp.full((S, 8), 2.0))

    rows = transfer_behavior(kern, [16, 32], make_args, iters=2)
    assert [r["S"] for r in rows] == [16, 32]
    assert all(r["ms"] > 0 and r["flops"] > 0 for r in rows)
    out = plot_transfer_behavior({"einsum": rows}, str(tmp_path / "tb.png"))
    import os

    assert os.path.exists(out)


def test_check_correctness_harness(tmp_path):
    """check_correctness twin (ref:mlstm_kernels/utils/test/checks.py:20):
    percentiles, allclose verdicts, and diff-image artifacts."""
    import numpy as np

    from xlstm_yolo_tpu.utils.test_checks import check_correctness

    rng = np.random.default_rng(0)
    base = rng.standard_normal((2, 3, 16, 8))
    out = check_correctness(base, base, name="exact", artifact_dir=tmp_path)
    assert out["allclose"] and out["max_abs"] == 0.0 and out["frac_close"] == 1.0

    noisy = base + rng.normal(scale=1e-3, size=base.shape)
    out2 = check_correctness(noisy, base, atol=1e-5, rtol=1e-4, name="noisy",
                             artifact_dir=tmp_path)
    assert not out2["allclose"]
    assert 0 < out2["p50_abs"] < out2["p90_abs"] < out2["p99_abs"] <= out2["max_abs"]
    pngs = list(tmp_path.glob("*.png"))
    assert len(pngs) >= 1  # diff-image artifacts rendered
