#!/bin/bash
# Fused conv-block kernel vs XLA encoder at the serving shape (round-3
# verdict next #5).  Quick: a handful of small compiles.  Artifact:
# docs/PERF_convblock_r4.json.
set -u
cd /root/repo
python scripts/bench_convblock.py
if [ -e docs/PERF_convblock_r4.json ]; then
  touch /tmp/r4/60_convblock.done
fi
