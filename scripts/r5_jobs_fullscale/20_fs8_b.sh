#!/bin/bash
# Stage B in the recommended config (identical to r4's 130_fs8_b.sh):
# frozen-prior predict=x0 + x0_leak_drop=1.0 refinement, batch 8 bf16.
# Artifact: docs/demo_fullscale8.md (the headline chain-vs-prior table).
set -u
cd /root/repo
[ -e /tmp/r5/10_fs8_a.done ] || { echo "stage A not done"; exit 1; }
DEADLINE=$(($(date +%s) + 90 * 60))
python scripts/train_demo.py \
  --n-train 11572 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/fullscale8 --eval-every 6000 --ckpt-every 2000 \
  --deadline "$DEADLINE" --max-rss-gb 80 --batch 8 --bf16 \
  --doc fs8B --warm-start-dis assets/fullscale8 --warm-start-doc fs8A \
  --steps 0 --ddpm-steps 16000 --predict-x0 --x0-leak-drop 1.0 \
  --report /tmp/r5/fullscale8_b.md
if [ -e /tmp/r5/fullscale8_b.md ]; then
  cp -f /tmp/r5/fullscale8_b.md docs/demo_fullscale8.md
  touch /tmp/r5/20_fs8_b.done
fi
