#!/bin/bash
# Re-run bench.py after the fast-2 serving-knee extra landed
# (docs/SCHEDULE_TRADEOFF_r5.md §4): warms the fast-2 enhance HLO into
# the persistent cache so the driver's end-of-round bench pays no cold
# compile for it, and refreshes docs/BENCH_r5_fresh.json with the
# fast-2 + dual-pair extras.
set -u
cd /root/repo
out=$(timeout 5400 python bench.py | tail -1)
if echo "$out" | python -c "
import json, sys
d = json.load(sys.stdin)
assert d['value'] > 0, d
assert d['extra']['enhance_rtf_bf16_fast2'] > 0
print('bench ok', d['value'], 'fast2', d['extra']['enhance_rtf_bf16_fast2'])
"; then
  echo "$out" > docs/BENCH_r5_fresh.json
  touch /tmp/r5/55_bench_rewarm.done
fi
