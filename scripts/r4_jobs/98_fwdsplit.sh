#!/bin/bash
# DiffUNet1 serving-forward internal split (encoder / TCM / decoders)
# at the serving shape.  Artifact: docs/PERF_fwdsplit_r4.json.
set -u
cd /root/repo
python scripts/profile_fwd_split.py
if [ -e docs/PERF_fwdsplit_r4.json ]; then
  touch /tmp/r4/98_fwdsplit.done
fi
