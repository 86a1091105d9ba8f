#!/bin/bash
# Train-step backward attribution in both dtypes (round-3 verdict
# next #2: why does bf16 serve 2.55x faster but train only 1.32x?).
# Many medium-size compiles; the persistent cache bounds retries.
# Artifact: docs/PERF_r4.json.
set -u
cd /root/repo
python scripts/profile_train_r4.py
if [ -e docs/PERF_r4.json ]; then
  touch /tmp/r4/70_prof_train.done
fi
