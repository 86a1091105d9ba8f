#!/bin/bash
# bench.py with the adopted dual-decoder bf16 serving default: the
# headline RTF should rise from ~513 toward ~700 if the segment win
# (PERF_fwdsplit_r4.json: decoders 6.29 -> 4.10 ms) carries end-to-end.
# Artifact: /tmp/r4/bench_r4_dual.json.
set -u
cd /root/repo
python bench.py | tail -1 > /tmp/r4/bench_r4_dual.json
if python -c "
import json
d = json.load(open('/tmp/r4/bench_r4_dual.json'))
assert d['value'] > 100, d
print('bench ok:', d['value'], d['unit'], d['extra'].get('enhance_rtf_bf16_flax'))
"; then
  touch /tmp/r4/100_bench_dual.done
fi
