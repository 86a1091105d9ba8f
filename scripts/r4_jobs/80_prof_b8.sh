#!/bin/bash
# bf16 train-gap experiment: same segmentation at batch 8 (the serve
# optimum) + a pre-cast-params forward, to separate the batch-6 tiling
# hypothesis from the in-graph param-cast hypothesis.
# Artifact: docs/PERF_r4_b8.json.
set -u
cd /root/repo
PDT_PROF_BATCH=8 python scripts/profile_train_r4.py
if [ -e docs/PERF_r4_b8.json ]; then
  touch /tmp/r4/80_prof_b8.done
fi
