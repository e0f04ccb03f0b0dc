"""Conv+BatchNorm folding for deployment (parity: ref:ultralytics/utils/torch_utils.py:242).

Eval-mode BN is an affine transform with frozen statistics, so every
(conv -> BN) pair folds into a single biased conv:

    k' = k * gamma / sqrt(var + eps)
    b' = beta - gamma * mean / sqrt(var + eps)

``fuse_variables`` walks the param tree, folds each BN group into its
sibling conv (pairs are identified by the module naming convention:
bn->conv, norm->fc1 in LSBlock, in_proj_bn->in_proj_conv in
ViLFusionBlock), and returns params for a model built with
``fused=True`` (conv carries bias; the BN op disappears — fewer HBM
passes at inference).
"""

from __future__ import annotations

import jax
import numpy as np

BN_EPS = 1e-3  # matches ConvBNAct/BatchNorm epsilon

# bn-group name -> sibling conv name, per module convention
_BN_TO_CONV = {"bn": "conv", "norm": "fc1", "in_proj_bn": "in_proj_conv"}


def _fold(kernel, gamma, beta, mean, var, bias0=None, eps=BN_EPS):
    """BN(conv(x) + b0) == conv'(x) + b' with b' = beta + (b0 - mean)*scale.

    Parity: ref:ultralytics/utils/torch_utils.py:242 fuse_conv_and_bn
    (which likewise starts from the conv's existing bias, zeros if none).
    """
    scale = gamma / np.sqrt(var + eps)
    k = np.asarray(kernel) * scale.reshape((1,) * (np.ndim(kernel) - 1) + (-1,))
    b0 = np.zeros_like(mean) if bias0 is None else np.asarray(bias0)
    b = beta + (b0 - mean) * scale
    return k.astype(np.asarray(kernel).dtype), b.astype(np.asarray(kernel).dtype)


def _is_bn_group(p_child, s_child):
    return (
        isinstance(p_child, dict)
        and set(p_child) >= {"scale", "bias"}
        and isinstance(s_child, dict)
        and set(s_child) >= {"mean", "var"}
    )


def fuse_variables(variables: dict) -> dict:
    """Fold every BN group into its sibling conv; drop batch_stats."""
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    def walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return p_node
        s_node = s_node if isinstance(s_node, dict) else {}
        # find foldable (bn, conv) sibling pairs at this level
        folds = {}
        for bn_name, conv_name in _BN_TO_CONV.items():
            if (
                bn_name in p_node
                and conv_name in p_node
                and _is_bn_group(p_node[bn_name], s_node.get(bn_name))
                and isinstance(p_node[conv_name], dict)
                and "kernel" in p_node[conv_name]
            ):
                folds[conv_name] = bn_name
        out = {}
        for name, child in p_node.items():
            if name in folds.values():
                continue  # folded BN group disappears
            if name in folds:
                bn = p_node[folds[name]]
                st = s_node[folds[name]]
                k, b = _fold(
                    child["kernel"], bn["scale"], bn["bias"],
                    st["mean"], st["var"], bias0=child.get("bias"),
                )
                out[name] = {**child, "kernel": k, "bias": b}
            else:
                out[name] = walk(child, s_node.get(name))
        return out

    return {"params": walk(params, stats)}
