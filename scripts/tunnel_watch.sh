#!/bin/bash
# Re-probe the axon TPU tunnel every 20 min; on success run the round-4
# measurement playbook (scripts/run_round5_tpu.sh). Logs: /tmp/r4_tpu/watch.log
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/r5_tpu_watch
mkdir -p "$OUT"
log() { echo "[$(date -u +%H:%M:%S)] $*" >> "$OUT/watch.log"; }

for i in $(seq 1 40); do
  log "probe attempt $i"
  if timeout 420 python -c "
import jax, numpy as np, jax.numpy as jnp
print(float(np.asarray(jnp.dot(jnp.ones((8,8)),jnp.ones((8,8)))[0,0])))
" >> "$OUT/watch.log" 2>&1; then
    log "TUNNEL IS UP"
    # 1-core host: wait for any heavy foreground job (test suite etc.) to
    # finish so bench timings aren't polluted by host load.
    while [ -e /tmp/host_busy.lock ]; do
      log "host busy (lock present); waiting 60s"
      sleep 60
    done
    log "running playbook"
    bash scripts/run_round5_tpu.sh >> "$OUT/playbook.log" 2>&1
    log "playbook finished (exit=$?)"
    exit 0
  fi
  log "tunnel still down; sleeping 20 min"
  sleep 1200
done
log "gave up after 40 attempts"
exit 1
