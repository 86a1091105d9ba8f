#!/bin/bash
# Chip-compute sentinel for the 2026-08-21 post-bench data-path hang:
# device enumeration and device_put answer instantly, execute hangs
# forever — a signature no prior round hit (the bench client had exited
# CLEANLY; there is no wedged client to kill).  Spawns an UNBOUNDED
# probe every CYCLE seconds; when one completes, relaunches the r5
# queue and exits.  Probes older than MAXAGE are SIGTERM'd by explicit
# PID (single-client SIGTERM is queue-proven safe; never kill by
# pattern — CLAUDE.md).
#
# Launch: nohup bash scripts/r5_sentinel.sh > /tmp/r5/sentinel.log 2>&1 &
set -u
cd /root/repo
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
STATE=/tmp/r5
CYCLE=${CYCLE:-180}
MAXAGE=${MAXAGE:-900}
echo $$ > "$STATE/sentinel.pid"
declare -A started
while :; do
  ts=$(date +%s)
  python - > "$STATE/probe_$ts.log" 2>&1 <<'EOF' &
import time
t0 = time.time()
import jax, numpy as np, jax.numpy as jnp
x = jax.device_put(np.ones((256, 256), np.float32))
assert float(jnp.sum(x @ x)) == 16777216.0
print("PROBE_OK", round(time.time() - t0, 1), flush=True)
EOF
  started[$!]=$ts
  echo "[sentinel] $(date +%H:%M:%S) probe pid $! spawned"
  sleep "$CYCLE"
  ok=""
  for pid in "${!started[@]}"; do
    t=${started[$pid]}
    if ! kill -0 "$pid" 2>/dev/null; then
      grep -q PROBE_OK "$STATE/probe_$t.log" && ok=yes
      unset "started[$pid]"
    elif [ $(( $(date +%s) - t )) -gt "$MAXAGE" ]; then
      echo "[sentinel] $(date +%H:%M:%S) probe $pid stuck >${MAXAGE}s; SIGTERM"
      kill -TERM "$pid" 2>/dev/null
      unset "started[$pid]"
    fi
  done
  if [ -n "$ok" ]; then
    echo "[sentinel] $(date +%H:%M:%S) compute is back; relaunching queue"
    nohup bash scripts/r5_queue.sh >> "$STATE/queue.log" 2>&1 &
    exit 0
  fi
done
