#!/bin/bash
# Re-verify bench.py on the re-imaged box (fresh /tmp: compile cache and
# all prior queue state were wiped).  Warms /tmp/jax_bench_cache so the
# driver's end-of-round bench run hits cached HLO, and records the
# serving/train numbers reproduced from a cold machine.
set -u
cd /root/repo
timeout 3600 python bench.py > /tmp/r4/bench_fresh.json 2>/tmp/r4/bench_fresh.err
if [ -s /tmp/r4/bench_fresh.json ] && tail -1 /tmp/r4/bench_fresh.json | python -c "import json,sys; json.loads(sys.stdin.read())"; then
  cp -f /tmp/r4/bench_fresh.json docs/BENCH_r4_fresh.json
  touch /tmp/r4/140_bench_fresh.done
fi
