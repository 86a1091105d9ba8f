#!/bin/bash
# Third point on the train-step batch-scaling curve (6 -> 8 -> 16): does
# bf16 throughput keep improving past the b8 tiling fix, and does the
# backward's 1.56x close further?  Artifact: docs/PERF_r4_b16.json.
set -u
cd /root/repo
PDT_PROF_BATCH=16 python scripts/profile_train_r4.py
if [ -e docs/PERF_r4_b16.json ]; then
  touch /tmp/r4/90_prof_b16.done
fi
