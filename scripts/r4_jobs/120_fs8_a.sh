#!/bin/bash
# Full-scale two-stage recipe in the TPU-recommended configuration
# (batch 8, bf16 mixed precision — docs/PERF_r4_notes.md §1a measured
# 8.9 ms/utt, 2.2x the reference-config throughput).  Stage A: joint
# eps.  Same corpus as assets/fullscale (symlinked), same step budget —
# the question is whether the recommended config preserves quality at
# ~2x the wall-clock speed.
set -u
cd /root/repo
mkdir -p assets/fullscale8 assets/fullscale/data
[ -e assets/fullscale8/data ] || ln -s ../fullscale/data assets/fullscale8/data
DEADLINE=$(($(date +%s) + 120 * 60))
python scripts/train_demo.py \
  --n-train 11572 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/fullscale8 --eval-every 6000 --ckpt-every 2000 \
  --deadline "$DEADLINE" --batch 8 --bf16 \
  --doc fs8A --steps 24000 --ddpm-steps 0 \
  --report /tmp/r4/fullscale8_a.md
if [ -e /tmp/r4/fullscale8_a.md ]; then
  cp -f /tmp/r4/fullscale8_a.md docs/demo_fullscale8_prior.md
  touch /tmp/r4/120_fs8_a.done
fi
