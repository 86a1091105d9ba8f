#!/bin/bash
# Round-3 chip pipeline: perf profile -> E3b prior checkpoints + probes
# -> E1 staged demo re-run (2048 utts, 40k joint + 20k DDPM-only)
# -> E6 n_avg=8 re-eval -> bench sanity.
#
# Every stage is gated on an artifact file and retried a bounded number
# of times, so the pipeline self-heals across the axon client's host-RSS
# leak (restart-on-death; training resumes from the latest orbax epoch
# checkpoint) and brief tunnel outages.  Run detached:
#   nohup bash scripts/r3_pipeline.sh > /tmp/r3/pipeline.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export PDT_APPROX_PESQ=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
mkdir -p /tmp/r3 docs

# run <artifact> <max_tries> <log> <cmd...>
run() {
  local artifact="$1" tries="$2" log="$3"; shift 3
  local i=0
  while [ ! -e "$artifact" ] && [ "$i" -lt "$tries" ]; do
    i=$((i + 1))
    echo "[pipeline] $(date +%H:%M:%S) try $i/$tries: $* (want $artifact)"
    "$@" >> "$log" 2>&1
    echo "[pipeline] $(date +%H:%M:%S) exit $? (artifact $([ -e "$artifact" ] && echo yes || echo no))"
    [ -e "$artifact" ] || sleep 20
  done
  if [ ! -e "$artifact" ]; then
    echo "[pipeline] GIVING UP on $artifact after $tries tries"
    return 1
  fi
}

# Stage A/B: under-trained prior checkpoints for the E3b probes.
# Shared corpus + checkpoints all live under assets/speech2k, namespaced
# by --doc.  The step-300/1500 runs also warm the train-step compile
# cache for the long E1 run.
DEMO_ARGS=(--n-train 2048 --n-test 16 --snr-lo -5 --snr-hi 5 --sigma
           --assets assets/speech2k --eval-every 5000)
run /tmp/r3/p300.md 3 /tmp/r3/p300.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p300 \
    --steps 300 --ckpt-every 300 --report /tmp/r3/p300.md
run /tmp/r3/p1500.md 3 /tmp/r3/p1500.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p1500 \
    --steps 1500 --ckpt-every 1500 --report /tmp/r3/p1500.md

# Stage C/D: predictability probes against the frozen weak priors
# (fills RESULTS_PROBES / E3b in docs/residual_capability_r3.md).
run docs/probe_predictability_p300_cond.json 3 /tmp/r3/probe300.log \
  python scripts/probe_predictability.py --assets assets/speech2k \
    --doc p300 --sigma --variant cond --steps 12000 \
    --out docs/probe_predictability_p300_cond.json
run docs/probe_predictability_p1500_cond.json 3 /tmp/r3/probe1500.log \
  python scripts/probe_predictability.py --assets assets/speech2k \
    --doc p1500 --sigma --variant cond --steps 12000 \
    --out docs/probe_predictability_p1500_cond.json

# Stage P: op-level perf attribution + batch sweep (verdict item 2).
# Runs after the probes so the host core is quiet (timing fidelity) and
# before the long E1 run so the perf deliverable lands early.
run docs/PERF_r3.json 2 /tmp/r3/profile.log \
  python scripts/profile_breakdown.py

# Stage E: flagship staged demo (E1 re-run; box was re-imaged so the
# round-3 checkpoints are gone).  Resumable: retries restart from the
# latest epoch checkpoint, riding out the axon host-RSS leak.
run /tmp/r3/e1.md 40 /tmp/r3/e1.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc demo \
    --steps 40000 --ddpm-steps 20000 --ckpt-every 2000 \
    --report /tmp/r3/e1.md
cp -f /tmp/r3/e1.md docs/demo_speechlike_2k.md

# Stage F: E6 — posterior-mean (n_avg=8) re-eval of the unchanged E1
# checkpoint; no training (step 60000 >= requested 0).
run /tmp/r3/e6.md 3 /tmp/r3/e6.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc demo \
    --steps 0 --ddpm-steps 0 --n-avg 8 --report /tmp/r3/e6.md
cp -f /tmp/r3/e6.md docs/demo_speechlike_2k_navg8.md

# Stage G: bench artifact sanity (driver runs bench.py itself at round
# end; this catches negative/unstable numbers early).
run /tmp/r3/bench.json 2 /tmp/r3/bench.log \
  bash -c 'python bench.py | tail -1 > /tmp/r3/bench.json'

echo "[pipeline] $(date +%H:%M:%S) ALL DONE"
touch /tmp/r3/DONE
