"""Orbax checkpointing of the full train state.

TPU-native replacement for save_model/resume
(ref:ultralytics/engine/trainer.py:517-551,700-757): the checkpoint is
the whole pytree {params, batch_stats, opt_state, EMA, step} plus a
JSON sidecar {epoch, best_fitness, args} — multi-host safe via orbax.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: Path, state, epoch: int, best_fitness: float, args: dict):
    if jax.process_index() != 0:
        # params/EMA are replicated and (with validator stats all-gathered)
        # best_fitness is identical on every host; one writer suffices and
        # concurrent rmtree+save on a shared FS would corrupt the snapshot.
        return
    path = Path(path).resolve()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    _ckptr().save(str(path), jax.tree.map(np.asarray, _to_tree(state)))
    meta = {
        "epoch": int(epoch),
        "best_fitness": float(best_fitness),
        "args": {k: (v if isinstance(v, (int, float, str, bool, type(None))) else str(v)) for k, v in (args or {}).items()},
    }
    (path.parent / f"{path.name}.meta.json").write_text(json.dumps(meta))


def load_checkpoint(path: Path, state):
    """Restore into the given state template; returns (state, start_epoch, best_fitness)."""
    path = Path(path).resolve()
    tree = _ckptr().restore(str(path), item=_to_tree(state))
    meta_file = path.parent / f"{path.name}.meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    return (
        _from_tree(state, tree),
        int(meta.get("epoch", -1)) + 1,
        float(meta.get("best_fitness", 0.0)),
    )


def _to_tree(state):
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema_params": state.ema.params,
        "ema_updates": state.ema.updates,
    }


def _from_tree(state, tree):
    from xlstm_yolo_tpu.engine.optimizers import EMAState

    if hasattr(state, "load_tree"):
        # FlatTrainState: on-disk layout stays the tree form (params /
        # ema_params as pytrees), re-raveled on restore
        return state.load_tree(tree)
    return state.replace(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        ema=EMAState(tree["ema_params"], tree["ema_updates"]),
    )


def strip_optimizer(path: Path, out: Path | None = None):
    """Keep only EMA params for deployment (parity: torch_utils.py:553)."""
    path = Path(path).resolve()
    state_tree = _ckptr().restore(str(path))
    slim = {"params": state_tree.get("ema_params") or state_tree["params"],
            "batch_stats": state_tree.get("batch_stats", {})}
    out = Path(out or path.parent / f"{path.name}_stripped").resolve()
    if out.exists():
        import shutil

        shutil.rmtree(out)
    _ckptr().save(str(out), slim)
    return out
