"""String-keyed kernel registry + mLSTM backend binding.

TPU re-design of the reference backend indirection
(ref:mlstm_kernels/torch/__init__.py:35, ref:mlstm_kernels/torch/backend_module.py:41-205):
a config dataclass selects chunkwise/sequence/step kernels by name and a
mode in {train, train_with_padding, inference}; ``make_backend`` returns a
pure function (no nn.Module needed — JAX backends are closures).

Kernel names:
    chunkwise--native_autograd          pure-jnp chunkwise siging (JAX AD)
    chunkwise--native_stablef           pure-jnp chunkwise exp-gate (JAX AD)
    chunkwise--pallas_xl_chunk_siging   Pallas TPU fw/bw (custom VJP)
    chunkwise--pallas_xl_chunk          Pallas TPU exp-gate variant
    parallel--native_siging             quadratic siging oracle
    parallel--native_stablef            quadratic exp-gate oracle
    sequence--native                    lax.scan recurrent sequence
    step--native                        single fused step
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Literal

import jax

from xlstm_yolo_tpu.ops import mlstm_chunkwise, mlstm_parallel, mlstm_recurrent, wrappers

ChunkwiseKernelName = str
ModeName = Literal["train", "train_with_padding", "inference"]

_CHUNKWISE_REGISTRY: dict[str, Callable] = {}
_SEQUENCE_REGISTRY: dict[str, Callable] = {}
_STEP_REGISTRY: dict[str, Callable] = {}
_PARALLEL_REGISTRY: dict[str, Callable] = {}


def register_kernel(kind: str, name: str, fn: Callable | None = None):
    reg = {
        "chunkwise": _CHUNKWISE_REGISTRY,
        "sequence": _SEQUENCE_REGISTRY,
        "step": _STEP_REGISTRY,
        "parallel": _PARALLEL_REGISTRY,
    }[kind]
    if fn is None:
        return lambda f: (reg.__setitem__(name, f), f)[1]
    reg[name] = fn
    return fn


register_kernel("chunkwise", "native_autograd", mlstm_chunkwise.mlstm_siging_chunkwise)
register_kernel("chunkwise", "native_stablef", mlstm_chunkwise.mlstm_chunkwise_stabilized)
register_kernel("parallel", "native_siging", mlstm_parallel.mlstm_siging_parallel)
register_kernel("parallel", "native_stablef", mlstm_parallel.mlstm_parallel_stabilized)
register_kernel("sequence", "native", mlstm_recurrent.mlstm_siging_recurrent_sequence)
register_kernel("sequence", "native_stablef", mlstm_recurrent.mlstm_recurrent_sequence_stabilized)
register_kernel("step", "native", mlstm_recurrent.mlstm_siging_step)
register_kernel("step", "native_stablef", mlstm_recurrent.mlstm_step_stabilized)


def _register_pallas():
    """Pallas kernels register lazily (they import pallas/tpu modules)."""
    try:
        from xlstm_yolo_tpu.ops.pallas import fwbw as _pl  # noqa: F401
    except Exception:  # pragma: no cover - pallas unavailable on this backend
        return False
    return True


def get_mlstm_kernel(name: str) -> Callable:
    """Look up a kernel by ``"<module>--<backend>"`` key.

    Mirrors the public lookup API of ref:mlstm_kernels/torch/__init__.py:35.
    """
    kind, _, backend = name.partition("--")
    reg = {
        "chunkwise": _CHUNKWISE_REGISTRY,
        "sequence": _SEQUENCE_REGISTRY,
        "step": _STEP_REGISTRY,
        "parallel": _PARALLEL_REGISTRY,
    }.get(kind)
    if reg is None:
        raise ValueError(f"unknown kernel module '{kind}' in '{name}'")
    if backend not in reg and backend.startswith("pallas"):
        _register_pallas()
    if backend not in reg:
        raise ValueError(
            f"unknown {kind} kernel '{backend}'; available: {sorted(reg)}"
        )
    return reg[backend]


@dataclasses.dataclass(frozen=True)
class mLSTMBackendConfig:
    """Parity with ref:mlstm_kernels/torch/backend_module.py:41-87."""

    chunkwise_kernel: str = "chunkwise--native_autograd"
    sequence_kernel: str = "sequence--native"
    step_kernel: str = "step--native"
    mode: ModeName = "train"
    chunk_size: int = 64
    return_last_states: bool = False
    autocast_kernel_dtype: str = "bfloat16"
    eps: float = 1e-6
    normalize: bool = True
    auto_divisor_chunking: bool = True  # TPU addition: divisor-aware chunk pick


def make_backend(config: mLSTMBackendConfig) -> Callable:
    """Bind a config to a pure callable ``fn(q, k, v, i, f, ...) -> h``.

    Train modes take (B, NH, S, DH) tensors and return h only;
    inference mode threads (C, n) states and accepts arbitrary S.
    """
    cw = get_mlstm_kernel(config.chunkwise_kernel)
    seq = get_mlstm_kernel(config.sequence_kernel)
    step = get_mlstm_kernel(config.step_kernel)

    if config.mode == "train":

        def fn(q, k, v, i, f, **kw):
            return cw(
                q, k, v, i, f,
                chunk_size=config.chunk_size,
                eps=config.eps,
                return_last_states=config.return_last_states,
                **kw,
            )

    elif config.mode == "train_with_padding":

        def fn(q, k, v, i, f, **kw):
            return wrappers.wrap_chunkwise_pad_zeros(
                cw, q, k, v, i, f,
                chunk_size=config.chunk_size,
                auto_divisor=config.auto_divisor_chunking,
                eps=config.eps,
                **kw,
            )

    elif config.mode == "inference":

        def fn(q, k, v, i, f, c_initial=None, n_initial=None, return_last_states=None, **kw):
            rls = config.return_last_states if return_last_states is None else return_last_states
            return wrappers.wrap_chunkwise_arbitrary_sequence_length(
                cw, seq, step, q, k, v, i, f,
                c_initial=c_initial, n_initial=n_initial,
                chunk_size=config.chunk_size, eps=config.eps,
                return_last_states=rls, **kw,
            )

    else:  # pragma: no cover
        raise ValueError(f"unknown mode {config.mode}")

    return fn
