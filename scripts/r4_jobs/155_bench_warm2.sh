#!/bin/bash
# Second re-image recovery (2026-08-20): /tmp was wiped again, so the
# persistent compile cache at /tmp/jax_bench_cache is empty.  Run
# bench.py once to re-warm it so the driver's end-of-round bench hits
# cached HLO instead of paying every compile cold, and record the
# reproduced numbers.
set -u
cd /root/repo
timeout 3600 python bench.py > /tmp/r4/bench_warm2.json 2>/tmp/r4/bench_warm2.err
if [ -s /tmp/r4/bench_warm2.json ] && tail -1 /tmp/r4/bench_warm2.json | python -c "import json,sys; json.loads(sys.stdin.read())"; then
  # only the validated last line: a stray stdout line would otherwise
  # break every json.load() consumer of the artifact (ADVICE r4)
  tail -1 /tmp/r4/bench_warm2.json > docs/BENCH_r4_fresh.json
  touch /tmp/r4/155_bench_warm2.done
fi
