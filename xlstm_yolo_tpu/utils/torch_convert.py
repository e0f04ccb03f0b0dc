"""Torch-checkpoint -> flax-params converter.

Maps the reference fork's ``state_dict`` names onto this framework's
param tree so released ``.pt`` weights (and CPU-torch golden models in
tests) drop into the JAX model.  Layout rules:

- Dense:   flax ``kernel (in, out)``  = torch ``weight (out, in)``.T
- Conv2d:  flax ``kernel (kh, kw, cin/g, cout)`` = torch
           ``weight (cout, cin/g, kh, kw)`` transposed (2, 3, 1, 0)
- BatchNorm: scale/bias <- weight/bias; batch_stats <- running_mean/var
- custom norms keep the name ``weight`` on both sides.

The flax tree path is translated to a dotted torch name by
:func:`flax_path_to_torch_name`; unknown leaves raise so silent drops
cannot happen.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax
import numpy as np


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def flax_path_to_torch_name(path: tuple[str, ...]) -> tuple[str, str]:
    """Translate a flax param path to (torch_param_name, kind).

    kind in {dense, conv, raw, bn_scale, bn_bias, bn_mean, bn_var} drives
    the layout transform.  Examples:
      ('params','model_2','module','rowwise_from_top_left','layer','proj_up','kernel')
        -> 'model.2.module.rowwise_from_top_left.layer.proj_up.weight', dense
      ('params','model_31','cv2_o2o_0_1','conv','kernel')
        -> 'model.31.one2one_cv2.0.1.conv.weight', conv
    """
    parts = list(path)
    col = parts.pop(0)  # 'params' or 'batch_stats'
    leaf = parts.pop()

    segs: list[str] = []
    for p in parts:
        m = re.fullmatch(r"model_(\d+)", p)
        if m:
            segs.append(f"model.{m.group(1)}")
            continue
        m = re.fullmatch(r"(cv[23])(_o2o)?_(\d+)_(.+)", p)
        if m:  # detect-head towers: cv2_o2o_0_1 -> one2one_cv2.0.1
            base = ("one2one_" if m.group(2) else "") + m.group(1)
            tower_path = m.group(4).replace("_", ".")
            segs.append(f"{base}.{m.group(3)}.{tower_path}")
            continue
        m = re.fullmatch(r"vil_(\d+)", p)
        if m:  # ViLFusionBlock.vil Sequential
            segs.append(f"vil.{m.group(1)}")
            continue
        m = re.fullmatch(r"(blocks|mlp|box_mlp)_(\d+)", p)
        if m:  # torch ModuleList/Sequential children: blocks.0, mlp.3, ...
            segs.append(f"{m.group(1)}.{m.group(2)}")
            continue
        if p == "in_proj_conv":
            segs.append("in_proj.0")
            continue
        if p == "in_proj_bn":
            segs.append("in_proj.1")
            continue
        if p == "conv1":  # SimpleStem
            segs.append("conv.0")
            continue
        if p == "conv2":
            segs.append("conv.3")
            continue
        segs.append(p)
    prefix = ".".join(segs)
    # SequenceConv2d: flax wraps an nn.Conv child named 'conv' inside the
    # module named 'conv'; torch subclasses Conv2d directly (one level).
    prefix = prefix.replace("conv.conv", "conv")

    def j(name):
        return f"{prefix}.{name}" if prefix else name

    if col == "batch_stats":
        return (j("running_mean"), "raw") if leaf == "mean" else (j("running_var"), "raw")
    if leaf == "kernel":
        # dense vs conv disambiguated by torch tensor rank at convert time
        return j("weight"), "kernel"
    if leaf == "scale":  # flax BatchNorm/LayerNorm scale
        return j("weight"), "raw"
    if leaf in {"bias", "weight", "embed", "queries", "learnable_skip"}:
        return j(leaf if leaf != "weight" else "weight"), "raw"
    raise KeyError(f"untranslatable flax leaf {leaf!r} at {path}")


def convert_torch_state_dict(
    variables: Mapping[str, Any],
    torch_sd: Mapping[str, Any],
    prefix: str = "",
    strict: bool = True,
):
    """Return a copy of ``variables`` with values from ``torch_sd``.

    ``prefix`` is prepended to translated names (e.g. ``"model."`` is
    already included by path translation for full models; use
    ``prefix=""`` for module-level conversion).
    """
    sd = {k: v for k, v in torch_sd.items()}
    used = set()
    # params with no flax counterpart: DFL's frozen arange conv (we decode
    # analytically), BN bookkeeping counters
    _ignored = lambda k: ".dfl." in k or k.endswith("num_batches_tracked")

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    new_leaves = []
    missing = []
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        name, kind = flax_path_to_torch_name(path)
        name = prefix + name
        if name not in sd:
            missing.append((path, name))
            new_leaves.append(leaf)
            continue
        t = _to_np(sd[name])
        used.add(name)
        if kind == "kernel":
            if t.ndim == 2:  # dense
                t = t.T
            elif t.ndim == 4:  # conv OIHW -> HWIO
                t = t.transpose(2, 3, 1, 0)
        if tuple(t.shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch {path}: flax {leaf.shape} vs torch {name} {t.shape}")
        dt = leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype
        new_leaves.append(t.astype(dt))
    if strict and missing:
        raise KeyError(f"missing torch params for: {missing[:10]} (+{max(0, len(missing)-10)} more)")
    unused = [k for k in sd if k not in used and not _ignored(k)]
    if strict and unused:
        raise KeyError(f"unused torch params: {unused[:10]} (+{max(0, len(unused)-10)} more)")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def export_flax_to_torch_state_dict(
    variables: Mapping[str, Any], prefix: str = ""
) -> dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict`: flax tree -> torch names.

    Same name translation, inverse layout transforms (dense kernels
    transposed back, conv HWIO -> OIHW).  Torch-only leaves the flax tree
    has no counterpart for (DFL's frozen arange conv, BN counters) are
    left to the torch model's own init.  Used for dataset-level parity:
    weights trained here run through the *reference* validator.
    """
    out: dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        name, kind = flax_path_to_torch_name(path)
        t = np.asarray(leaf)
        if kind == "kernel":
            if t.ndim == 2:
                t = t.T
            elif t.ndim == 4:  # HWIO -> OIHW
                t = t.transpose(3, 2, 0, 1)
        out[prefix + name] = t
    return out
