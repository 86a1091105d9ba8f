#!/bin/bash
# Stage B at reduced budget (see 10_mini_a.sh): frozen miniA prior,
# predict=x0 + x0_leak_drop=1.0 (the recommended recipe, README), 6000
# DDPM-only steps.  Artifact: docs/demo_mini8.md.
set -u
cd /root/repo
[ -e /tmp/r5/10_mini_a.done ] || { echo "stage A not done"; exit 1; }
DEADLINE=$(($(date +%s) + 55 * 60))
python scripts/train_demo.py \
  --n-train 4000 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/mini8 --eval-every 0 --ckpt-every 2000 \
  --deadline "$DEADLINE" --max-rss-gb 80 --batch 8 --bf16 \
  --doc miniB --warm-start-dis assets/mini8 --warm-start-doc miniA \
  --steps 0 --ddpm-steps 6000 --predict-x0 --x0-leak-drop 1.0 \
  --report /tmp/r5/mini8_b.md
if [ -e /tmp/r5/mini8_b.md ]; then
  cp -f /tmp/r5/mini8_b.md docs/demo_mini8.md
  touch /tmp/r5/15_mini_b.done
fi
