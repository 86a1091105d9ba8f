#!/bin/bash
# Lost-RPC wedge watchdog for the r5 chip queue (CLAUDE.md round-4:
# a training client can wedge on a lost RPC — log frozen, ~0% CPU —
# while the relay stays healthy; the fix is a SIGTERM by EXPLICIT pid,
# never by pattern, and the queue retry resumes from the last
# checkpoint).  This automates that manual playbook:
#
#   wedged :=  the running job's log is silent > WEDGE_S seconds
#          AND its last line is a training step line (so we are mid-
#              stretch, not in a legitimately silent cold compile /
#              bench phase — those jobs are exempt by construction)
#          AND the job's python consumed < ~2% CPU over 30 s
#          AND a bounded relay probe from a second process succeeds
#
# Launch: nohup bash scripts/r5_watchdog.sh > /tmp/r5/watchdog.log 2>&1 &
set -u
export PATH=/opt/venv/bin:$PATH  # re-imaged box: stack lives in /opt/venv
STATE=/tmp/r5
# 45 min: a 500-step log stretch takes 75-150 s healthy (2-4x under
# CPU contention) — but a step-line-frozen silence can ALSO be a
# healthy orbax async-save finalize (measured ~31 min at b8 fullscale:
# the finalize readback saturates the tunnel, the next save blocks in
# wait_until_finished right after a step line, ~1% CPU — the full
# wedge signature on a healthy client; CLAUDE.md round-5).  Do NOT
# lower this: on 2026-08-20 a 15-min threshold judgement killed a
# healthy client mid-training, and a 25-min threshold would have
# killed the fs8A save-finalize (and possibly corrupted the latest
# checkpoint).
WEDGE_S=${WEDGE_S:-2700}
echo $$ > "$STATE/watchdog.pid"

job_pids() {  # python descendants of the queue's current job shell
  local qpid; qpid=$(cat "$STATE/queue.pid" 2>/dev/null) || return 1
  local sh p
  for sh in $(ps -o pid= --ppid "$qpid" 2>/dev/null); do
    for p in $(ps -o pid= --ppid "$sh" 2>/dev/null); do
      if grep -qa python "/proc/$p/cmdline" 2>/dev/null; then echo "$p"; fi
    done
  done
}

cpu_ticks() {
  awk '{print $14 + $15}' "/proc/$1/stat" 2>/dev/null || echo ""
}

while :; do
  sleep 60
  name=$(grep -oP 'run \K[0-9_a-z]+' "$STATE/queue.log" 2>/dev/null | tail -1)
  [ -n "${name:-}" ] || continue
  log="$STATE/$name.log"
  [ -f "$log" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$log") ))
  [ "$age" -ge "$WEDGE_S" ] || continue
  # ONLY the mid-training stretch (last line is a step line): restore
  # and compile phases are legitimately silent for 10+ min under CPU
  # contention — killing there murders healthy clients (2026-08-20)
  tail -1 "$log" | grep -q '^step ' || continue
  for pid in $(job_pids); do
    t0=$(cpu_ticks "$pid"); [ -n "$t0" ] || continue
    sleep 30
    t1=$(cpu_ticks "$pid"); [ -n "$t1" ] || continue
    if [ $((t1 - t0)) -lt 60 ]; then
      if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1
      then
        echo "[watchdog] $(date +%H:%M:%S) $name pid $pid wedged" \
             "(log silent ${age}s, $((t1 - t0)) ticks/30s); SIGTERM"
        kill -TERM "$pid"
      else
        echo "[watchdog] $(date +%H:%M:%S) relay probe failed; not killing"
      fi
    fi
  done
done
