#!/bin/bash
# Re-run the forward split with the block-diagonal dual-decoder
# candidate added (decoders are 96% of the bf16 serving forward per
# the first run).  Artifact: docs/PERF_fwdsplit_r4.json (overwrites).
set -u
cd /root/repo
python scripts/profile_fwd_split.py
if grep -q decoders_dual_ms docs/PERF_fwdsplit_r4.json; then
  touch /tmp/r4/99_fwdsplit2.done
fi
