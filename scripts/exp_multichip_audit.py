#!/usr/bin/env python
"""Multi-chip collective audit (VERDICT r3 item 4: evidence, not just
correctness).

Wall-clock "scaling" on this sandbox's 8-virtual-device CPU mesh is not
measurable — all 8 vdevs share ONE physical core, so DP-8 wall time is
8x the per-device work by construction.  What IS auditable is the
compiled program: which collectives GSPMD inserted, how many, how big,
and (on a real-TPU AOT compile) whether XLA schedules them
asynchronously so they overlap the backward.

Modes:
  --cpu      compile the flagship train step on the virtual CPU mesh for
             DP-8 / DP-4xTP-2 and count collectives in the optimized HLO
             (runs anywhere, no TPU).
  --tpu-aot  AOT-compile against a detached v5e 2x4 topology
             (jax.experimental.topologies) — the REAL TPU backend's
             optimized HLO, with async -start/-done pairs, obtained
             without owning 8 chips.  Needs the remote compile service.

Writes /tmp/tpu_queue/multichip_audit.json and prints a table.
Replaces: ref:engine/trainer.py:277 (DDP bucket all-reduce — the psum
equivalent is explicit in the audited HLO).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

COLLECTIVES = ("all-reduce", "reduce-scatter", "all-gather",
               "collective-permute", "all-to-all")


def _dtype_bytes(dt: str) -> int:
    return {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
            "f64": 8, "s8": 1, "u8": 1}.get(dt, 4)


def audit_hlo(hlo: str) -> dict:
    """Count collective ops + total payload bytes in optimized HLO text."""
    counts: Counter = Counter()
    bytes_: Counter = Counter()
    async_pairs = 0
    shape_re = re.compile(r"([a-z]+[0-9]*)\[([0-9,]*)\]")
    for line in hlo.splitlines():
        m = re.search(r"=\s*(\([^)]*\)|(?:f|bf|s|u|pred)[0-9]*\[[0-9,]*\]"
                      r"(?:\{[0-9,]*\})?)\s*"
                      r"(all-reduce|reduce-scatter|all-gather|collective-permute|"
                      r"all-to-all)(-start|-done)?", line)
        if not m:
            continue
        shape, op, phase = m.group(1), m.group(2), m.group(3)
        if phase == "-done":
            async_pairs += 1
            continue  # payload counted at -start
        counts[op] += 1
        for dt, dims in shape_re.findall(shape or ""):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            bytes_[op] += n * _dtype_bytes(dt)
    return {
        "counts": dict(counts),
        "mbytes": {k: round(v / 2**20, 2) for k, v in bytes_.items()},
        "async_done_ops": async_pairs,
    }


def _build_step(n_data: int, n_model: int, cfg_name: str, imgsz: int):
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import TrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.parallel import mesh as mesh_lib

    cfg = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / cfg_name
    model_t, d = build_detection_model(cfg, training=True)
    B, M = max(8, n_data), 8
    batch = {
        "img": jnp.zeros((B, imgsz, imgsz, 3), jnp.float32),
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.tile(jnp.asarray([10.0, 10.0, 80.0, 90.0]), (B, M, 1)),
        "mask": jnp.ones((B, M), bool).at[:, 4:].set(False),
    }
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model_t.init)({"params": rng, "droppath": rng}, batch["img"])
    tx, _, _ = opt_lib.build_optimizer(
        variables["params"], name="SGD", lr=0.01, momentum=0.9)
    state = TrainState.create(variables, tx)
    return model_t, d, state, batch, rng, tx


def audit_cpu(configs=((8, 1), (4, 2))) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from xlstm_yolo_tpu.engine.steps import make_train_step
    from xlstm_yolo_tpu.parallel import mesh as mesh_lib

    out = {}
    for n_data, n_model in configs:
        mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model)
        model_t, d, state, batch, rng, tx = _build_step(
            n_data, n_model, "vil-det-tiny.yaml", 160)
        param_sh = mesh_lib.make_param_shardings(mesh, state.params)
        state = state.replace(
            params=jax.device_put(state.params, param_sh),
            ema=state.ema._replace(
                params=jax.device_put(state.ema.params, param_sh)))
        batch = jax.device_put(batch, mesh_lib.make_batch_sharding(mesh, batch))
        step = jax.jit(make_train_step(model_t, tx, nc=d.get("nc", 80)))
        with mesh:
            compiled = step.lower(state, batch, rng).compile()
        hlo = compiled.as_text()
        key = f"dp{n_data}" + (f"_tp{n_model}" if n_model > 1 else "")
        out[key] = audit_hlo(hlo)
        out[key]["hlo_ops"] = hlo.count("\n")
        print(key, json.dumps(out[key]), flush=True)
    return out


def audit_tpu_aot() -> dict:
    """AOT-compile the train step for a detached v5e 2x4 topology."""
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh

    import numpy as np

    topo = topologies.get_topology_desc(
        "v5e:2x4", "tpu", topology_name="2x2x2")  # adjusted below if needed
    devs = np.asarray(topo.devices).reshape(4, 2)
    from xlstm_yolo_tpu.engine.steps import make_train_step
    from xlstm_yolo_tpu.parallel import mesh as mesh_lib

    mesh = Mesh(devs, (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))
    model_t, d, state, batch, rng, tx = _build_step(4, 2, "vil-det-tiny.yaml", 160)
    param_sh = mesh_lib.make_param_shardings(mesh, state.params)
    state_sh = jax.tree.map(
        lambda _: jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        state)
    # place params/batch shardings explicitly for AOT (no real devices to
    # device_put onto): use .lower with shardings via jax.jit in_shardings
    step = jax.jit(make_train_step(model_t, tx, nc=d.get("nc", 80)))
    with mesh:
        lowered = step.lower(state, batch, rng)
        compiled = lowered.compile()
    hlo = compiled.as_text()
    res = audit_hlo(hlo)
    print("tpu_aot_v5e_4x2", json.dumps(res), flush=True)
    return {"tpu_aot_v5e_4x2": res}


def main():
    res = {}
    if "--tpu-aot" in sys.argv:
        res.update(audit_tpu_aot())
    else:
        res.update(audit_cpu())
    out = Path("/tmp/tpu_queue/multichip_audit.json")
    out.parent.mkdir(exist_ok=True)
    prev = json.loads(out.read_text()) if out.exists() else {}
    prev.update(res)
    out.write_text(json.dumps(prev, indent=1))
    print(json.dumps(prev))


if __name__ == "__main__":
    if not os.environ.get("_AUDIT_CHILD") and "--tpu-aot" not in sys.argv:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            " --xla_force_host_platform_device_count=8")
        env["JAX_PLATFORMS"] = "cpu"
        env["_AUDIT_CHILD"] = "1"
        sys.exit(subprocess.run([sys.executable, __file__, *sys.argv[1:]],
                                env=env).returncode)
    main()
