"""Device mesh + sharding rules (the DDP/NCCL replacement).

TPU-native parallelism per SURVEY.md §2.6: a 2D ('data', 'model') mesh;
batch sharded on 'data' (gradient all-reduce rides ICI via XLA-inserted
psum — no buckets, no process groups); optional tensor parallelism on
'model' for the wide ViL projections (proj_up / qk_proj / FFN fused up
are column-parallel, proj_down / FFN down are row-parallel).

Multi-host: call :func:`initialize_distributed` once per process
(jax.distributed.initialize) — the single-controller replacement for the
reference's torch.distributed.run subprocess relaunch
(ref:engine/trainer.py:188-233, utils/dist.py:56).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed():
    """Init multi-process JAX if a coordinator is configured (no-op else).

    Must run BEFORE any backend query (``jax.devices()`` / ``
    jax.process_count()`` pin the single-process backend, after which
    ``jax.distributed.initialize`` raises).  Reads the coordinator from
    JAX_COORDINATOR_ADDRESS and the process topology from
    JAX_NUM_PROCESSES / JAX_PROCESS_ID when set (explicit CPU/manual
    launches); TPU pod environments auto-detect with no envs at all.
    Idempotent: a second call (or a call after initialize elsewhere) is
    a no-op.  Exercised for real by tests/test_multihost.py (2 processes
    x 4 virtual CPU devices).
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
    except RuntimeError as e:
        # Only swallow the benign "already initialized" case.  Anything
        # else (coordinator unreachable, bad topology — XlaRuntimeError
        # subclasses RuntimeError) must surface, or a misconfigured
        # multi-host launch silently degrades to single-process while
        # peers hang at the barrier.
        if "already" not in str(e).lower():
            raise


def global_batch_from_local(batch: Any, mesh: Mesh, axis: int = 0) -> Any:
    """Assemble a GLOBAL data-sharded batch from per-process local shards.

    Multi-host twin of :func:`shard_host_batch`: each process passes only
    its own slice of the batch (local_batch = global_batch / process_count
    rows) and the result is a global jax.Array sharded on 'data' across
    all processes — the single-controller replacement for DDP's
    per-process DataLoader + implicit bucket all-reduce
    (ref:ultralytics/data/build.py:117 InfiniteDataLoader + DDP sampler).
    """
    sh = make_batch_sharding(mesh, batch, axis=axis)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch, sh,
    )


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# column-parallel (shard output features) / row-parallel (shard input
# features) kernels for the ViL stack; biases of column-parallel layers
# shard alike, row-parallel biases replicate.
_COL_PARALLEL = {"proj_up", "qk_proj", "v_proj", "proj_up_gate_z"}
_ROW_PARALLEL = {"proj_down"}


def param_pspec(path: tuple, leaf, n_model: int) -> P:
    """PartitionSpec for one param leaf under the ('data','model') mesh."""
    if n_model <= 1:
        return P()
    names = [k.key if hasattr(k, "key") else str(k) for k in path]
    leafname = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if parent in _COL_PARALLEL:
        if leafname == "kernel" and leaf.shape[-1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if leafname == "bias" and leaf.shape[-1] % n_model == 0:
            return P(MODEL_AXIS)
    if parent in _ROW_PARALLEL and leafname == "kernel" and leaf.shape[0] % n_model == 0:
        return P(MODEL_AXIS, None)
    return P()


def sharded_mask(tree: Any, n_model: int) -> Any:
    """Bool pytree: True where param_pspec puts the leaf on 'model'."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: param_pspec(p, l, n_model) != P(), tree
    )


def make_param_shardings(mesh: Mesh, tree: Any) -> Any:
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, param_pspec(p, l, n_model)), tree
    )


def make_batch_sharding(mesh: Mesh, tree: Any, axis: int = 0) -> Any:
    """Shard dim ``axis`` of every batch leaf on 'data' (axis 1 for
    microbatch-stacked (k, B, ...) grad-accumulation batches)."""

    def spec(l):
        dims = [None] * l.ndim
        dims[axis] = DATA_AXIS
        return NamedSharding(mesh, P(*dims))

    return jax.tree.map(spec, tree)


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def shard_host_batch(batch: Any, mesh: Mesh, axis: int = 0) -> Any:
    """Device-put a host batch with per-leaf batch sharding."""
    sh = make_batch_sharding(mesh, batch, axis=axis)
    return jax.tree.map(jax.device_put, batch, sh)
