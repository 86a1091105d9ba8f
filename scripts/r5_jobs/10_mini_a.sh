#!/bin/bash
# Post-re-image stage A at REDUCED budget.  The third re-image
# (2026-08-21) destroyed the fs8 checkpoints again; the full 24k-step
# chain measured ~15 h end-to-end on this box (queue retries + save
# stalls included) — unaffordable in the remaining round budget.  This
# trains the SAME config as fs8A (batch 8 bf16, sigma, snr 2.5-17.5 dB)
# at 8000 joint steps on a 4000-utterance corpus: a real trained prior
# for the fixed-sampler schedule-tradeoff republication (VERDICT r5
# items 1/3/4), explicitly labeled at this scale in every artifact.
# Original full-scale job: scripts/r5_jobs_fullscale/10_fs8_a.sh.
set -u
cd /root/repo
mkdir -p assets/mini8
DEADLINE=$(($(date +%s) + 70 * 60))
python scripts/train_demo.py \
  --n-train 4000 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/mini8 --eval-every 0 --ckpt-every 2000 \
  --deadline "$DEADLINE" --max-rss-gb 80 --batch 8 --bf16 \
  --doc miniA --steps 8000 --ddpm-steps 0 \
  --report /tmp/r5/mini8_a.md
if [ -e /tmp/r5/mini8_a.md ]; then
  cp -f /tmp/r5/mini8_a.md docs/demo_mini8_prior.md
  touch /tmp/r5/10_mini_a.done
fi
