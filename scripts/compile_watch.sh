#!/bin/bash
# Watch for remote-compile-service recovery: every 5 min, try a
# FRESH-shape matmul (unique dim per attempt -> never cache-hit) with a
# 180 s timeout. Logs to /tmp/tpu_queue/compile_watch.log; exits when
# a compile succeeds.
set -u
mkdir -p /tmp/tpu_queue
n=0
while true; do
  n=$((n + 1))
  dim=$((300 + n))
  if timeout 180 python -c "
import jax.numpy as jnp
x = jnp.ones(($dim, $dim), jnp.bfloat16)
assert bool(jnp.isfinite((x @ x).sum()))" 2>/dev/null; then
    echo "$(date +%H:%M:%S) compile service HEALTHY (dim=$dim)" >> /tmp/tpu_queue/compile_watch.log
    exit 0
  fi
  echo "$(date +%H:%M:%S) compile still wedged (attempt $n, dim=$dim)" >> /tmp/tpu_queue/compile_watch.log
  sleep 300
done
