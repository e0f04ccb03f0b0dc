#!/bin/bash
# Round-3 TPU queue, batch 3: remat on/off train-step measurement, then a
# bench refresh so the assigner top-k win is captured end-to-end.
# Serialize all on-chip work (CLAUDE.md): one step at a time, probe between.
set -u
mkdir -p /tmp/tpu_queue
cd /root/repo

probe() {
  timeout 240 python -c "import jax.numpy as jnp; assert float((jnp.ones((8,8))@jnp.ones((8,8))).sum())==512.0" 2>/dev/null
}

echo "[q3] waiting for healthy worker $(date +%H:%M:%S)"
until probe; do sleep 120; done
echo "[q3] healthy $(date +%H:%M:%S)"

echo "[q3] 1/2 exp_remat"
timeout 3600 python scripts/exp_remat.py 8 > /tmp/tpu_queue/remat.log 2>&1
echo "rc=$?"; tail -1 /tmp/tpu_queue/remat.log
probe || { echo "[q3] worker wedged after exp_remat; stopping"; exit 1; }

echo "[q3] 2/2 bench"
timeout 1800 python bench.py > /tmp/tpu_queue/bench3.log 2>&1
echo "rc=$?"; tail -1 /tmp/tpu_queue/bench3.log
probe && echo "[q3] final probe ok $(date +%H:%M:%S)"
