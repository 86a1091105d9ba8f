#!/bin/bash
# Republished sampler-schedule tradeoff on the FIXED bf16 x0 sampler
# (VERDICT r5 items 1+3): fast-6 bf16 must now be finite and near its
# f32 quality, per-row 'served' column pins the executed formulation,
# and with the put_batch device-readback fix the ms/batch column should
# reconcile with bench.py (~34 ms for fast-6 bf16 dual).
set -u
cd /root/repo
[ -e /tmp/r5/20_fs8_b.done ] || { echo "stage B not done"; exit 1; }
timeout 5400 python scripts/eval_schedules.py \
  --assets assets/fullscale8 --doc fs8B --sigma --predict-x0 --bf16 \
  --batch 8 --report /tmp/r5/sched_tradeoff.md
if [ -s /tmp/r5/sched_tradeoff.md ]; then
  cp -f /tmp/r5/sched_tradeoff.md docs/SCHEDULE_TRADEOFF_r5.md
  cp -f /tmp/r5/sched_tradeoff.json docs/SCHEDULE_TRADEOFF_r5.json
  touch /tmp/r5/30_sched_tradeoff.done
fi
