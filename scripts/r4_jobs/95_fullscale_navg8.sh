#!/bin/bash
# Posterior-mean composition on the full-scale stage-B checkpoint:
# n_avg=8 re-eval, no training (the weak-prior demos measured n_avg
# adding SSNR on top of the leak-drop optimum).  Artifact:
# docs/demo_fullscale_navg8.md.
set -u
cd /root/repo
[ -e /tmp/r4/50_fullscale_b.done ] || { echo "stage B not done"; exit 1; }
python scripts/train_demo.py \
  --n-train 11572 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/fullscale --eval-every 6000 --ckpt-every 2000 \
  --doc fsB \
  --steps 0 --ddpm-steps 0 --n-avg 8 --predict-x0 --x0-leak-drop 1.0 \
  --report /tmp/r4/fullscale_navg8.md
if [ -e /tmp/r4/fullscale_navg8.md ]; then
  cp -f /tmp/r4/fullscale_navg8.md docs/demo_fullscale_navg8.md
  touch /tmp/r4/95_fullscale_navg8.done
fi
