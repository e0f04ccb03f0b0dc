"""Child process for tests/test_multihost.py.

Runs one JAX process of a 2-process x 4-virtual-CPU-device cluster
(8 global devices), executes a tiny data-parallel train loop over the
('data', 'model') mesh with the repo's own helpers, and prints a JSON
line with the final loss + a param checksum.  With JAX_NUM_PROCESSES
unset it runs the identical math single-process (the equivalence
oracle for the test).

Invoked with env set by the parent BEFORE python starts:
  XLA_FLAGS=--xla_force_host_platform_device_count=<local>
  JAX_PLATFORMS=cpu
  JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (multi)
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from xlstm_yolo_tpu.parallel.mesh import (  # noqa: E402
    initialize_distributed, make_mesh, global_batch_from_local,
    make_batch_sharding, replicated,
)

initialize_distributed()  # must precede any backend query

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

GLOBAL_BATCH, DIM, STEPS = 16, 32, 3


def main():
    nproc = jax.process_count()
    pid = jax.process_index()
    mesh = make_mesh()  # all 8 global devices on 'data'
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())

    # deterministic params + data, independent of process layout
    r = np.random.default_rng(0)
    params = {
        "w1": jnp.asarray(r.normal(size=(DIM, DIM)) * 0.1, jnp.float32),
        "w2": jnp.asarray(r.normal(size=(DIM, 1)) * 0.1, jnp.float32),
    }
    rep = replicated(mesh, params)
    params = jax.tree.map(
        lambda x, s: jax.make_array_from_callback(x.shape, s, lambda idx: np.asarray(x)[idx]),
        params, rep)

    def loss_fn(p, x, y):
        h = jnp.tanh(x @ p["w1"])
        pred = (h @ p["w2"])[:, 0]
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(p, x, y):
        l, g = jax.value_and_grad(loss_fn)(p, x, y)
        p = jax.tree.map(lambda a, b: a - 0.1 * b, p, g)
        return p, l

    losses = []
    for s in range(STEPS):
        rs = np.random.default_rng(100 + s)
        x_all = rs.normal(size=(GLOBAL_BATCH, DIM)).astype(np.float32)
        y_all = rs.normal(size=(GLOBAL_BATCH,)).astype(np.float32)
        if nproc > 1:
            # each process contributes ONLY its local rows
            per = GLOBAL_BATCH // nproc
            lo = pid * per
            batch = {"x": x_all[lo:lo + per], "y": y_all[lo:lo + per]}
            gb = global_batch_from_local(batch, mesh)
        else:
            sh = make_batch_sharding(mesh, {"x": x_all, "y": y_all})
            gb = jax.tree.map(jax.device_put,
                              {"x": jnp.asarray(x_all), "y": jnp.asarray(y_all)}, sh)
        params, l = step(params, gb["x"], gb["y"])
        losses.append(float(l))  # fully-replicated scalar: same on every process

    checksum = float(jax.device_get(jnp.sum(params["w1"])) +
                     jax.device_get(jnp.sum(params["w2"])))
    print(json.dumps({
        "pid": pid, "nproc": nproc,
        "n_global": len(jax.devices()), "n_local": len(jax.local_devices()),
        "losses": [round(x, 8) for x in losses],
        "checksum": round(checksum, 8),
    }), flush=True)


if __name__ == "__main__":
    main()
