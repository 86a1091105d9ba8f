#!/bin/bash
# Full-scale two-stage recipe, stage A (round-3 verdict next #4):
# reference-scale corpus (11,572 train utterances, the reference's
# VoiceBank count, trainer/complex_ddpm_trainer.py:52-53) with a
# VoiceBank-like SNR spread (2.5..17.5 dB — also lifts approx-PESQ off
# the Loizou floor so CSIG/COVL carry signal, round-3 verdict weak #4).
# Stage A = the reference joint recipe: prior + eps-DDPM trained
# jointly (E9 recipe: eps while the prior trains).
set -u
cd /root/repo
DEADLINE=$(($(date +%s) + 165 * 60))
python scripts/train_demo.py \
  --n-train 11572 --n-test 32 --snr-lo 2.5 --snr-hi 17.5 --sigma \
  --assets assets/fullscale --eval-every 6000 --ckpt-every 2000 \
  --deadline "$DEADLINE" \
  --doc fsA --steps 24000 --ddpm-steps 0 \
  --report /tmp/r4/fullscale_a.md
if [ -e /tmp/r4/fullscale_a.md ]; then
  cp -f /tmp/r4/fullscale_a.md docs/demo_fullscale_prior.md
  touch /tmp/r4/40_fullscale_a.done
fi
