#!/bin/bash
# VERDICT r5 item 8: chip serving RTF for GCRN / GRN / DB-AIAT ri
# (f32 + bf16), through each family's production enhance jit.
set -u
cd /root/repo
out=$(timeout 5400 python scripts/bench_priors.py | tail -1)
if echo "$out" | python -c "import json,sys; d=json.load(sys.stdin); assert d['rtf_gcrn_bf16'] > 0 and d['rtf_grn_bf16'] > 0 and d['rtf_dbaiat_ri_bf16'] > 0"; then
  echo "$out" > docs/BENCH_priors_r5.json
  touch /tmp/r5/50_bench_priors.done
fi
