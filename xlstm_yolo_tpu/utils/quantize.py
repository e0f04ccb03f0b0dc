"""Post-training weight quantization (int8, per-output-channel symmetric).

TPU-native analog of the reference exporter's int8 paths (TFLite/IMX PTQ,
ref:ultralytics/engine/exporter.py:1100-1213): weights are stored as int8
with float scales and dequantized to the compute dtype at load, halving
(vs bf16) or quartering (vs f32) checkpoint size and weight HBM traffic.
Activation quantization is left to the runtime (XLA int8 matmul fusion);
weight-only PTQ preserves mAP within noise at 8 bits.

A quantized leaf is a dict ``{"q": int8[...], "s": f32[...broadcast]}``;
1-D leaves (biases, norms, gates) stay in f32 — they are tiny and
precision-critical.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["quantize_tree", "dequantize_tree", "is_quantized_tree"]

_MIN_SIZE = 1024  # don't quantize tiny leaves


def _is_leaf_dict(x) -> bool:
    return isinstance(x, dict) and set(x) == {"q", "s"}


def quantize_tree(params, bits: int = 8):
    """Per-output-channel symmetric int8 quantization of >=2-D leaves.

    The last axis is treated as the output-channel axis (flax Dense /
    Conv kernel layout), one scale per output channel.
    """
    assert bits == 8, "only int8 supported"

    def q(leaf):
        a = np.asarray(leaf)
        if a.ndim < 2 or a.size < _MIN_SIZE or not np.issubdtype(a.dtype, np.floating):
            return np.asarray(a, np.float32)
        amax = np.max(np.abs(a.astype(np.float32)), axis=tuple(range(a.ndim - 1)))
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        qv = np.clip(np.round(a.astype(np.float32) / scale), -127, 127).astype(np.int8)
        return {"q": qv, "s": scale}

    return jax.tree.map(q, params)


def dequantize_tree(qparams, dtype=np.float32):
    """Inverse of :func:`quantize_tree` (scales broadcast on last axis)."""

    def dq(leaf):
        if _is_leaf_dict(leaf):
            return (leaf["q"].astype(np.float32) * leaf["s"]).astype(dtype)
        return np.asarray(leaf)

    return jax.tree.map(dq, qparams, is_leaf=_is_leaf_dict)


def is_quantized_tree(tree) -> bool:
    found = [False]

    def visit(leaf):
        if _is_leaf_dict(leaf):
            found[0] = True
        return leaf

    jax.tree.map(visit, tree, is_leaf=_is_leaf_dict)
    return found[0]
