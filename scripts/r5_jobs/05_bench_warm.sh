#!/bin/bash
# End-of-round bench warm (r4 pattern): run bench.py so (a) the
# persistent compile cache at /tmp/jax_bench_cache holds every HLO the
# driver's end-of-round bench will need (cold compiles there would eat
# the bench budget), and (b) the round-5 additions (dual2 candidate,
# roofline fraction, serving_formulation) are validated on chip.
# Artifact: docs/BENCH_r5_fresh.json (validated last line only —
# ADVICE r4 on the r4 job's whole-stdout copy).
set -u
cd /root/repo
out=$(timeout 5400 python bench.py | tail -1)
if echo "$out" | python -c "
import json, sys
d = json.load(sys.stdin)
assert d['value'] > 0, d
assert d['extra']['enhance_rtf_bf16'] > 0
print('bench ok', d['value'], d['extra'].get('serving_formulation'))
"; then
  echo "$out" > docs/BENCH_r5_fresh.json
  touch /tmp/r5/05_bench_warm.done
fi
