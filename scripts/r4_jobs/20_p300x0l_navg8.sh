#!/bin/bash
# Stage N: n_avg=8 posterior-mean re-eval of the UNCHANGED stage-L
# checkpoint (no training).  At the leak-drop optimum the net is
# already a posterior-mean regressor, so the prediction is "little
# further gain"; a real net retains some x_t dependence which the
# averaging removes.
set -u
cd /root/repo
[ -e /tmp/r4/10_p300x0l.done ] || { echo "stage L not done"; exit 1; }
python scripts/train_demo.py \
  --n-train 2048 --n-test 16 --snr-lo -5 --snr-hi 5 --sigma \
  --assets assets/speech2k --eval-every 2000 --ckpt-every 1000 \
  --doc p300x0l \
  --steps 0 --ddpm-steps 0 --n-avg 8 --predict-x0 --x0-leak-drop 1.0 \
  --report /tmp/r4/p300x0l_navg8.md
if [ -e /tmp/r4/p300x0l_navg8.md ]; then
  cp -f /tmp/r4/p300x0l_navg8.md docs/demo_weakprior300_x0leak_navg8.md
  touch /tmp/r4/20_p300x0l_navg8.done
fi
