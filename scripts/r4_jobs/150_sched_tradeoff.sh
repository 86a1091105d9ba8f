#!/bin/bash
# Sampler-schedule quality<->latency sweep on the fs8 two-stage chain
# (PERF_r4_notes.md S3: step count is the one remaining serving lever).
# Produces docs/SCHEDULE_TRADEOFF_r4.{md,json}: prior-only .. fast-2/3/4
# .. fast-6 (reference default) .. fast-8 .. full-50, six metrics +
# slope-timed production enhance_batch per schedule.
set -u
cd /root/repo
[ -e /tmp/r4/130_fs8_b.done ] || { echo "stage B not done"; exit 1; }
timeout 5400 python scripts/eval_schedules.py \
  --assets assets/fullscale8 --doc fs8B --sigma --predict-x0 --bf16 \
  --batch 8 --report /tmp/r4/sched_tradeoff.md
if [ -s /tmp/r4/sched_tradeoff.md ]; then
  cp -f /tmp/r4/sched_tradeoff.md docs/SCHEDULE_TRADEOFF_r4.md
  cp -f /tmp/r4/sched_tradeoff.json docs/SCHEDULE_TRADEOFF_r4.json
  touch /tmp/r4/150_sched_tradeoff.done
fi
