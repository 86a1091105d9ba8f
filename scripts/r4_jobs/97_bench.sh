#!/bin/bash
# bench.py self-check after the round-4 changes (new b8 train leg):
# validates the artifact end-to-end and pre-warms the compile cache so
# the driver's round-end run is fast.  Artifact: /tmp/r4/bench_r4.json.
set -u
cd /root/repo
python bench.py | tail -1 > /tmp/r4/bench_r4.json
if python -c "
import json
d = json.load(open('/tmp/r4/bench_r4.json'))
assert d['value'] > 100, d
print('bench ok:', d['value'], d['unit'])
"; then
  touch /tmp/r4/97_bench.done
fi
