#!/bin/bash
# bench.py after routing the prior forward through the dual decoder
# too (it shares the UNet spine; ~6.5 ms of the 38 ms batch was the
# flax prior).  Artifact: /tmp/r4/bench_r4_dual2.json.
set -u
cd /root/repo
python bench.py | tail -1 > /tmp/r4/bench_r4_dual2.json
if python -c "
import json
d = json.load(open('/tmp/r4/bench_r4_dual2.json'))
assert d['value'] > 100, d
print('bench ok:', d['value'], d['unit'], 'flax', d['extra'].get('enhance_rtf_bf16_flax'))
"; then
  touch /tmp/r4/110_bench_dual2.done
fi
