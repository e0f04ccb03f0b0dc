"""Benchmark harness: speed table across export formats + kernel sweeps.

Parity targets: ref:ultralytics/utils/benchmarks.py:51 (benchmark()) and
the mlstm_kernels grid-sweep runner
(ref:mlstm_kernels/utils/benchmark/run_benchmark.py:22).

Measurement protocol notes (remote-TPU relay): identical dispatches are
deduped by the runtime and per-iteration host syncs measure RTT, so the
runner pipelines distinct device-resident inputs and fetches the last
output as the barrier (device programs execute in order).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from itertools import product
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def measure_throughput(fn: Callable, make_input: Callable, iters: int = 16,
                       warmup: int = 2) -> float:
    """Pipelined seconds-per-call; see module docstring for protocol."""
    keys = jax.random.split(jax.random.PRNGKey(0), warmup + iters)
    inputs = [make_input(k) for k in keys]
    for x in inputs[:warmup]:
        np.asarray(jax.tree.leaves(fn(x))[0])
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs[warmup:]]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters


def benchmark(model, imgsz: int = 640, batch: int = 8,
              formats=("jit", "stablehlo", "orbax", "orbax_int8", "tflite"),
              data=None, verbose=True, out_dir=None):
    """Speed (+optional accuracy) table across export formats.

    Parity: ref:ultralytics/utils/benchmarks.py:51 — the reference
    exports each format, reloads it, measures inference speed and
    (when ``data`` is given) validates mAP. Here the XLA format set is
    exercised end-to-end: export via ``engine.Exporter``, reload via
    ``AutoBackend`` / ``load_stablehlo``, measure with the relay-safe
    pipelined protocol, and — for formats that restore parameters —
    run the task validator for the metric column.
    """
    import tempfile
    from types import SimpleNamespace

    bundle = model._get_bundle(imgsz=imgsz)
    flax_model, variables = bundle["model"], bundle["variables"]

    @jax.jit
    def predict(img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _ = flax_model.apply(variables, x)
        return y

    def make_input(key):
        return jax.random.randint(key, (batch, imgsz, imgsz, 3), 0, 255, jnp.uint8)

    def val_map(bundle) -> float | None:
        if data is None:
            return None
        from xlstm_yolo_tpu.cfg import get_cfg
        from xlstm_yolo_tpu.engine.validator import DetectionValidator

        cfg = get_cfg(overrides=dict(
            data=str(data), imgsz=imgsz, batch=batch, workers=0,
            task="detect", plots=False, save_json=False))
        res = DetectionValidator(cfg, data=str(data))(bundle, batch_size=batch)
        return float(res.get("metrics/mAP50-95(B)", float("nan")))

    out_dir = Path(out_dir) if out_dir else Path(tempfile.mkdtemp(prefix="bench_fmt_"))
    rows = []
    for fmt in formats:
        try:
            if fmt == "jit":
                sec = measure_throughput(predict, make_input)
                m = val_map({"model": flax_model, "variables": variables})
            else:
                from xlstm_yolo_tpu.engine.exporter import Exporter, load_stablehlo

                args = SimpleNamespace(format=fmt, imgsz=imgsz, batch=batch)
                path = Exporter(args)(
                    {"model": flax_model, "variables": variables},
                    out_dir=out_dir / fmt)
                if fmt == "stablehlo":
                    fn = load_stablehlo(path)
                    sec = measure_throughput(fn, make_input)
                    m = None  # serialized program: no variables to re-val
                else:
                    from xlstm_yolo_tpu.nn.autobackend import AutoBackend

                    ab = AutoBackend(path, model_cfg=model.model_cfg,
                                     imgsz=imgsz, fuse=False)
                    sec = measure_throughput(ab._jit, make_input)
                    # tflite runs in the TF interpreter: no flax variables
                    # to re-validate (same scope as stablehlo)
                    m = None if ab.format == "tflite" else val_map(
                        {"model": ab.model, "variables": ab.variables})
            rows.append({
                "format": fmt, "status": "ok", "imgsz": imgsz, "batch": batch,
                "ms/img": round(sec / batch * 1e3, 2),
                "img/s": round(batch / sec, 1),
                "mAP50-95": None if m is None else round(m, 4),
            })
        except Exception as e:  # a failing format must not sink the table
            rows.append({"format": fmt, "status": f"{type(e).__name__}: {e}"})
    if verbose:
        for r in rows:
            print(r)
    return rows


@dataclass
class KernelBenchConfig:
    """Grid-sweep config (parity: param_handling.py:75 BenchmarkConfig)."""

    kernel_names: list = field(default_factory=lambda: [
        "chunkwise--native_autograd", "chunkwise--pallas_xl_chunk_siging",
    ])
    B: list = field(default_factory=lambda: [2])
    NH: list = field(default_factory=lambda: [12])
    S: list = field(default_factory=lambda: [1024, 6656])
    DH: list = field(default_factory=lambda: [32])
    chunk_size: list = field(default_factory=lambda: [256, 512])
    with_backward: bool = False


def run_kernel_benchmark(cfg: KernelBenchConfig | None = None):
    """Sweep kernels x shapes; returns list of dict rows (runtime ms)."""
    from xlstm_yolo_tpu.ops import get_mlstm_kernel

    cfg = cfg or KernelBenchConfig()
    rows = []
    for name, B, NH, S, DH, L in product(
        cfg.kernel_names, cfg.B, cfg.NH, cfg.S, cfg.DH, cfg.chunk_size
    ):
        if S % L:
            continue
        kern = get_mlstm_kernel(name)
        rng = np.random.default_rng(0)
        qkv = [jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.bfloat16) for _ in range(3)]
        gates = [jnp.asarray(rng.normal(size=(B, NH, S)), jnp.float32) for _ in range(2)]

        if cfg.with_backward:
            fn = jax.jit(jax.grad(
                lambda q, k, v, i, f: (kern(q, k, v, i, f, chunk_size=L).astype(jnp.float32) ** 2).sum(),
                argnums=(0, 1, 2),
            ))
        else:
            fn = jax.jit(lambda q, k, v, i, f: kern(q, k, v, i, f, chunk_size=L))

        # differential chained timing (RTT-free): N=1 vs N=5 program
        def chain(N):
            @jax.jit
            def run(q, k, v, i, f):
                def body(t, acc):
                    out = kern(q, k, acc, i, f, chunk_size=L)
                    out = out[0] if isinstance(out, tuple) else out
                    return out.astype(acc.dtype)
                return jax.lax.fori_loop(0, N, body, v).astype(jnp.float32).sum()
            return run

        f1, f5 = chain(1), chain(5)
        args = (*qkv, *gates)
        float(f1(*args)); float(f5(*args))
        t0 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f5(*args)); t5 = time.perf_counter() - t0
        ms = (t5 - t1) / 4 * 1e3
        rows.append({"kernel": name, "B": B, "NH": NH, "S": S, "DH": DH,
                     "chunk": L, "ms": round(ms, 3)})
    return rows
