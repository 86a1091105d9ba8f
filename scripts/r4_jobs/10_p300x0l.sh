#!/bin/bash
# Stage L (round-3 pipeline5 unfinished business): predict='x0' with
# HARD x0_leak_drop=1.0, 8k DDPM-only steps against the frozen p300
# weak prior.  The round-3 leg reached step 2000 before its deadline
# and checkpointed under assets/speech2k/checkpoint/p300x0l — this job
# resumes from there (train_demo retrain=True + orbax latest-epoch).
# Theory (tests/test_sampler_theory.py): at the p300 regime (probe val
# cos 0.472, ~22 % recoverable residual MSE) the hard-drop training
# optimum run through the unchanged sampler yields chain MSE =
# e_unpredictable, strictly below prior-only.
set -u
cd /root/repo
DEADLINE=$(($(date +%s) + 170 * 60))
python scripts/train_demo.py \
  --n-train 2048 --n-test 16 --snr-lo -5 --snr-hi 5 --sigma \
  --assets assets/speech2k --eval-every 2000 --ckpt-every 1000 \
  --deadline "$DEADLINE" \
  --doc p300x0l --warm-start-dis assets/speech2k --warm-start-doc p300 \
  --steps 0 --ddpm-steps 8000 --predict-x0 --x0-leak-drop 1.0 \
  --report /tmp/r4/p300x0l.md
if [ -e /tmp/r4/p300x0l.md ]; then
  cp -f /tmp/r4/p300x0l.md docs/demo_weakprior300_x0leak.md
  touch /tmp/r4/10_p300x0l.done
fi
