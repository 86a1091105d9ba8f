#!/bin/bash
# Republished sampler-schedule tradeoff on the FIXED bf16 x0 sampler
# (VERDICT r5 items 1+3), on the miniB checkpoint (reduced scale — see
# 10_mini_a.sh for why; the doc labels it).  fast-6 bf16 must now be
# finite and near its f32 quality; the per-row 'served' column pins the
# executed formulation; with the put_batch device-readback fix the
# ms/batch column should reconcile with bench.py.
set -u
cd /root/repo
[ -e /tmp/r5/15_mini_b.done ] || { echo "stage B not done"; exit 1; }
# fast-4 and fast-8 are dropped: they duplicate the bf16 rounding
# classes already covered (fast-3: top abar 0.999; fast-6/full-50:
# 0.9999) and the round's remaining chip budget is tight post-blackout.
timeout 5400 python scripts/eval_schedules.py \
  --assets assets/mini8 --doc miniB --sigma --predict-x0 --bf16 \
  --batch 8 --variants "prior,fast-2,fast-3,fast-6,full-50" \
  --report /tmp/r5/sched_tradeoff.md
if [ -s /tmp/r5/sched_tradeoff.md ]; then
  cp -f /tmp/r5/sched_tradeoff.md docs/SCHEDULE_TRADEOFF_r5.md
  cp -f /tmp/r5/sched_tradeoff.json docs/SCHEDULE_TRADEOFF_r5.json
  touch /tmp/r5/20_sched_tradeoff.done
  # best-effort f32 reference at the default schedule + prior-only so
  # the table's "bf16 quality ~= f32" claim is measured, not assumed
  timeout 1800 python scripts/eval_schedules.py \
    --assets assets/mini8 --doc miniB --sigma --predict-x0 \
    --batch 8 --reps 1 --variants "fast-6,prior" \
    --report /tmp/r5/sched_tradeoff_f32.md \
  && cp -f /tmp/r5/sched_tradeoff_f32.md docs/SCHEDULE_TRADEOFF_r5_f32.md \
  && cp -f /tmp/r5/sched_tradeoff_f32.json docs/SCHEDULE_TRADEOFF_r5_f32.json
fi
