#!/bin/bash
# Stage B in the recommended config: frozen-prior predict=x0 +
# x0_leak_drop=1.0 refinement at batch 8, bf16.  Done = the chain
# beats the prior on the six-metric table at ~2x the reference-config
# training speed (compare docs/demo_fullscale.md).
set -u
cd /root/repo
[ -e /tmp/r4/120_fs8_a.done ] || { echo "stage A not done"; exit 1; }
DEADLINE=$(($(date +%s) + 90 * 60))
python scripts/train_demo.py \
  --n-train 11572 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/fullscale8 --eval-every 6000 --ckpt-every 2000 \
  --deadline "$DEADLINE" --batch 8 --bf16 \
  --doc fs8B --warm-start-dis assets/fullscale8 --warm-start-doc fs8A \
  --steps 0 --ddpm-steps 16000 --predict-x0 --x0-leak-drop 1.0 \
  --report /tmp/r4/fullscale8_b.md
if [ -e /tmp/r4/fullscale8_b.md ]; then
  cp -f /tmp/r4/fullscale8_b.md docs/demo_fullscale8.md
  touch /tmp/r4/130_fs8_b.done
fi
