#!/bin/bash
# Re-image recovery + stage-A retrain.  The fs8 checkpoints died with
# assets/ (second re-image), and VERDICT r5 items 1/3/4 need them: the
# schedule-tradeoff republication must run on a reference-scale
# checkpoint.  Corpus regenerates deterministically (seed=7) inside
# train_demo.py.  Config identical to r4's 120_fs8_a.sh (batch 8 bf16,
# the measured TPU-recommended regime, docs/PERF_r4_notes.md).
# --max-rss-gb 80 converts the tunneled-PJRT leak (~5.8 MB/step at b8)
# into clean resumable exits instead of OOM kills.
set -u
cd /root/repo
mkdir -p assets/fullscale/data assets/fullscale8
[ -e assets/fullscale8/data ] || ln -s ../fullscale/data assets/fullscale8/data
DEADLINE=$(($(date +%s) + 100 * 60))
python scripts/train_demo.py \
  --n-train 11572 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/fullscale8 --eval-every 6000 --ckpt-every 2000 \
  --deadline "$DEADLINE" --max-rss-gb 80 --batch 8 --bf16 \
  --doc fs8A --steps 24000 --ddpm-steps 0 \
  --report /tmp/r5/fullscale8_a.md
if [ -e /tmp/r5/fullscale8_a.md ]; then
  cp -f /tmp/r5/fullscale8_a.md docs/demo_fullscale8_prior.md
  touch /tmp/r5/10_fs8_a.done
fi
