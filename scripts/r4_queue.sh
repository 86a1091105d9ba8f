#!/bin/bash
# Round-4 serialized chip-job queue.
#
# Exactly ONE axon (TPU) client at a time: round-3 post-mortem
# (CLAUDE.md) showed the relay dies when two clients share the chip and
# one is killed mid-RPC, and nothing respawns it.  So every chip job
# this round goes through this runner, strictly serialized.
#
# Jobs live in scripts/r4_jobs/NN_name.sh, processed in NN order.  A
# job is complete when it touches /tmp/r4/NN_name.done as its LAST
# action (after verifying its own artifact).  Jobs must be resumable
# (train_demo.py checkpoints + --deadline give that for free); the
# runner retries a job up to MAX_TRIES times before marking it .skip.
# New jobs can be dropped into the spool while the runner is live; the
# runner exits when /tmp/r4/STOP exists and nothing is pending.
#
# Launch:  nohup bash scripts/r4_queue.sh > /tmp/r4/queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export PDT_APPROX_PESQ=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

SPOOL=/root/repo/scripts/r4_jobs
STATE=/tmp/r4
MAX_TRIES=6
mkdir -p "$STATE" "$SPOOL"
echo $$ > "$STATE/queue.pid"

tpu_alive() {
  # The relay hangs forever when dead; bound the probe.
  timeout 150 python -c "import jax; print(jax.devices())" > /dev/null 2>&1
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
