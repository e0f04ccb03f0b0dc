#!/bin/bash
# Round-4 TPU work queue: runs serially the moment the compile service
# recovers. Each step re-probes with a FRESH-shape compile (cache-proof)
# and logs to /tmp/tpu_queue/.
set -u
mkdir -p /tmp/tpu_queue
cd /root/repo

probe_fresh() {
  local dim=$((400 + RANDOM % 500))
  timeout 240 python -c "
import jax.numpy as jnp
x = jnp.ones(($dim, $dim), jnp.bfloat16)
assert bool(jnp.isfinite((x @ x).sum()))" 2>/dev/null
}

echo "[q4] waiting for compile service $(date +%H:%M:%S)"
until probe_fresh; do sleep 240; done
echo "[q4] compile service healthy $(date +%H:%M:%S)"

echo "[q4] 1/5 bw_opt2 (gate-hoist + S1600 + fuse_gates sweep)"
timeout 3000 python scripts/exp_bw_opt2.py > /tmp/tpu_queue/bw_opt2.log 2>&1
echo "rc=$?"; tail -2 /tmp/tpu_queue/bw_opt2.log
probe_fresh || { echo "[q4] wedged after bw_opt2; waiting"; until probe_fresh; do sleep 240; done; }

echo "[q4] 2/5 tpu_parity (all kernels, incl. reworked v2)"
timeout 2700 python scripts/tpu_parity.py > /tmp/tpu_queue/parity.log 2>&1
echo "rc=$? (TPU_PARITY.json at repo root)"; tail -1 /tmp/tpu_queue/parity.log
probe_fresh || { echo "[q4] wedged after parity; waiting"; until probe_fresh; do sleep 240; done; }

echo "[q4] 3/5 train-step decomp (gate-hoist at step level)"
timeout 3000 python scripts/exp_train_decomp.py > /tmp/tpu_queue/train_decomp.log 2>&1
echo "rc=$?"; tail -2 /tmp/tpu_queue/train_decomp.log
probe_fresh || { echo "[q4] wedged after decomp; waiting"; until probe_fresh; do sleep 240; done; }

echo "[q4] 4/5 bench"
timeout 3600 python bench.py > /tmp/tpu_queue/bench.log 2>&1
echo "rc=$?"; tail -1 /tmp/tpu_queue/bench.log
probe_fresh || { echo "[q4] wedged after bench; waiting"; until probe_fresh; do sleep 240; done; }

echo "[q4] 5/5 entry() compile check"
timeout 1200 python -c "
import jax, __graft_entry__ as g
fn, args = g.entry(); out = jax.jit(fn)(*args); print('entry ok', out.shape)" \
  > /tmp/tpu_queue/entry.log 2>&1
echo "rc=$?"; tail -1 /tmp/tpu_queue/entry.log

probe_fresh && echo "[q4] done, worker healthy $(date +%H:%M:%S)"
