#!/bin/bash
# Full-scale two-stage recipe, stage B: frozen-prior x0 + hard
# x0_leak_drop=1.0 refinement (the E9/E10 recipe, measured to make the
# chain strictly beat the prior at the p300 regime in
# docs/demo_weakprior300_x0leak.md).  Prior warm-started from stage A's
# best checkpoint; residual DDPM trains fresh in x0 mode.
set -u
cd /root/repo
[ -e /tmp/r4/40_fullscale_a.done ] || { echo "stage A not done"; exit 1; }
DEADLINE=$(($(date +%s) + 150 * 60))
python scripts/train_demo.py \
  --n-train 11572 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/fullscale --eval-every 6000 --ckpt-every 2000 \
  --deadline "$DEADLINE" \
  --doc fsB --warm-start-dis assets/fullscale --warm-start-doc fsA \
  --steps 0 --ddpm-steps 16000 --predict-x0 --x0-leak-drop 1.0 \
  --report /tmp/r4/fullscale_b.md
if [ -e /tmp/r4/fullscale_b.md ]; then
  cp -f /tmp/r4/fullscale_b.md docs/demo_fullscale.md
  touch /tmp/r4/50_fullscale_b.done
fi
