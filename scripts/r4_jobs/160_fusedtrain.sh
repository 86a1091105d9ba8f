#!/bin/bash
# Chip measurement for the train-mode dual block-diagonal decoder
# (PDT_FUSED_TRAIN=dual): does the serving fusion's 1.53x decoder win
# transfer to the training hot loop (forward AND backward) at the
# recommended batch-8 bf16 config?  Measures both recipe stages (joint
# eps and frozen-prior x0+leak) flax vs dual, full donated step plus
# ddpm fwd/vag segments.  Artifact: docs/PERF_fusedtrain_r4.json.
set -u
cd /root/repo
python scripts/profile_fusedtrain.py
if [ -e docs/PERF_fusedtrain_r4.json ]; then
  touch /tmp/r4/160_fusedtrain.done
fi
