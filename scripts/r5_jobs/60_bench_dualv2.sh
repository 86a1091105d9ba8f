#!/bin/bash
# Roofline-driven serving experiment (docs/PERF_r5_notes.md): dual vs
# dual2 (concat-free split-matmul conv1).  Adoption gate: >=5% full-
# batch win flips the serving default.
set -u
cd /root/repo
out=$(timeout 3600 python scripts/bench_dualv2.py | tail -1)
if echo "$out" | python -c "import json,sys; d=json.load(sys.stdin); assert d['enhance_ms_dual'] > 0 and d['enhance_ms_dual2'] > 0"; then
  echo "$out" > docs/PERF_dualv2_r5.json
  touch /tmp/r5/60_bench_dualv2.done
fi
