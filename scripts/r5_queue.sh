#!/bin/bash
# Round-5 serialized chip-job queue (same pattern as r4: exactly ONE
# axon client at a time; artifact-gated, resumable jobs; see
# scripts/r4_queue.sh and CLAUDE.md round-3/4 learnings).
#
# Launch:  mkdir -p /tmp/r5 && nohup bash scripts/r5_queue.sh > /tmp/r5/queue.log 2>&1 &
set -u
cd /root/repo
# 2026-08-21 re-image: the default ``python`` is a bare 3.12 with no
# numpy/jax; the full stack lives in /opt/venv.  Put it first on PATH
# so every job's ``python`` resolves to the working interpreter.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/.axon_site:/root/repo
export PDT_APPROX_PESQ=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

SPOOL=/root/repo/scripts/r5_jobs
STATE=/tmp/r5
MAX_TRIES=8
mkdir -p "$STATE" "$SPOOL"
echo $$ > "$STATE/queue.pid"

tpu_alive() {
  # The relay hangs forever when dead; bound the probe.  Probe a REAL
  # computation, not just jax.devices(): a wedged client blocks the
  # relay's data path for every other client while device enumeration
  # still answers (observed 2026-08-20 — three tries burned retrying
  # into a blocked relay; killing the wedged client frees it).
  timeout 1800 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jax.device_put(np.ones((256, 256), np.float32))
assert float(jnp.sum(x @ x)) == 16777216.0" > /dev/null 2>&1
}

while :; do
  next=""
  for j in "$SPOOL"/[0-9]*.sh; do
    [ -e "$j" ] || continue
    name=$(basename "$j" .sh)
    [ -e "$STATE/$name.done" ] && continue
    [ -e "$STATE/$name.skip" ] && continue
    next="$j"
    break
  done
  if [ -z "$next" ]; then
    if [ -e "$STATE/STOP" ]; then
      echo "[queue] $(date +%H:%M:%S) STOP and no pending jobs; exiting"
      break
    fi
    sleep 30
    continue
  fi
  name=$(basename "$next" .sh)
  tries=$(cat "$STATE/$name.tries" 2>/dev/null || echo 0)
  if [ "$tries" -ge "$MAX_TRIES" ]; then
    echo "[queue] $name exhausted $MAX_TRIES tries; marking skip"
    touch "$STATE/$name.skip"
    continue
  fi
  if ! tpu_alive; then
    echo "[queue] $(date +%H:%M:%S) TPU relay unresponsive; waiting 5 min"
    sleep 300
    continue
  fi
  echo $((tries + 1)) > "$STATE/$name.tries"
  echo "[queue] $(date +%H:%M:%S) run $name (try $((tries + 1))/$MAX_TRIES)"
  bash "$next" >> "$STATE/$name.log" 2>&1
  rc=$?
  done_flag=$([ -e "$STATE/$name.done" ] && echo yes || echo no)
  echo "[queue] $(date +%H:%M:%S) $name exit $rc done=$done_flag"
  [ "$done_flag" = yes ] || sleep 20
done
