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
