"""Tiny TPU health probe — run standalone: `timeout 300 python scripts/probe.py`.

Exits 0 with "probe ok" if a tiny matmul executes on the real device.
Keep this in its own process: a hung relay must not wedge the caller.
"""
import jax
import jax.numpy as jnp

x = jnp.ones((256, 256), jnp.bfloat16)
y = (x @ x).sum()
print("probe ok", float(y), jax.devices())
