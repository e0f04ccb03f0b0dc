#!/bin/bash
# Round-3 TPU work queue: run the moment the worker is healthy.
# Each step probes first and logs to /tmp/tpu_queue/.
set -u
mkdir -p /tmp/tpu_queue
cd /root/repo

probe() {
  timeout 240 python -c "import jax.numpy as jnp; assert float((jnp.ones((8,8))@jnp.ones((8,8))).sum())==512.0" 2>/dev/null
}

echo "[queue] waiting for healthy worker $(date +%H:%M:%S)"
until probe; do sleep 120; done
echo "[queue] worker healthy $(date +%H:%M:%S)"

echo "[queue] 1/4 tpu_parity"
timeout 2400 python scripts/tpu_parity.py > /tmp/tpu_queue/parity.log 2>&1
echo "rc=$? (TPU_PARITY.json at repo root)"
probe || { echo "[queue] worker wedged after tpu_parity; stopping"; exit 1; }

echo "[queue] 2/4 bench"
timeout 1800 python bench.py > /tmp/tpu_queue/bench.log 2>&1
echo "rc=$?"; tail -1 /tmp/tpu_queue/bench.log
probe || { echo "[queue] worker wedged after bench; stopping"; exit 1; }

echo "[queue] 3/4 exp_dwconv"
timeout 1800 python scripts/exp_dwconv.py > /tmp/tpu_queue/dwconv.log 2>&1
echo "rc=$?"
probe || { echo "[queue] worker wedged after dwconv; stopping"; exit 1; }

echo "[queue] 4/4 done — leave worker healthy"
probe && echo "[queue] final probe ok $(date +%H:%M:%S)"
