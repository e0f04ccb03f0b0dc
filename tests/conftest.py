"""Test harness config: run on a simulated 8-device CPU mesh.

Same trick as ref:mlstm_kernels/jax/xla_utils.py:7 — force the host
platform to expose 8 virtual devices so sharding/collective code paths
are exercised without TPU hardware.  Must run before jax initializes
its backends.

Note: the ambient environment may have registered a remote-TPU PJRT
plugin ("axon") at interpreter start and pinned ``jax_platforms`` via
jax.config (which beats env vars), so we update the config explicitly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
