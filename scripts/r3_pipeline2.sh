#!/bin/bash
# Round-3 chip pipeline v2 — supersedes r3_pipeline.sh (same artifact
# gating) with the predict='x0' stages inserted and the order tuned so
# the capability-critical result (x0 chain vs weak prior) lands early:
#   probes (E3b) -> x0 weak-prior demo (E9-TPU) -> perf profile ->
#   E1 flagship re-run -> E6 n_avg=8 re-eval -> x0 converged-prior demo
#   -> bench sanity.
#
# Every stage is gated on an artifact file and retried a bounded number
# of times, so the pipeline self-heals across the axon client's host-RSS
# leak (restart-on-death; training resumes from the latest orbax epoch
# checkpoint) and brief tunnel outages.  Run detached:
#   nohup bash scripts/r3_pipeline2.sh > /tmp/r3/pipeline2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export PDT_APPROX_PESQ=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
mkdir -p /tmp/r3 docs

# If a v1 stage child is still running (v1's controller was replaced by
# this script), wait for it to exit before touching the chip — two axon
# clients sharing the chip wrecks timings and has killed the tunnel
# before (CLAUDE.md round-3 learnings).
if [ -n "${WAIT_PID:-}" ]; then
  echo "[pipeline2] waiting for inherited stage pid $WAIT_PID"
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
  echo "[pipeline2] pid $WAIT_PID done"
fi

# run <artifact> <max_tries> <log> <cmd...>
run() {
  local artifact="$1" tries="$2" log="$3"; shift 3
  local i=0
  while [ ! -e "$artifact" ] && [ "$i" -lt "$tries" ]; do
    i=$((i + 1))
    echo "[pipeline2] $(date +%H:%M:%S) try $i/$tries: $* (want $artifact)"
    "$@" >> "$log" 2>&1
    echo "[pipeline2] $(date +%H:%M:%S) exit $? (artifact $([ -e "$artifact" ] && echo yes || echo no))"
    [ -e "$artifact" ] || sleep 20
  done
  if [ ! -e "$artifact" ]; then
    echo "[pipeline2] GIVING UP on $artifact after $tries tries"
    return 1
  fi
}

DEMO_ARGS=(--n-train 2048 --n-test 16 --snr-lo -5 --snr-hi 5 --sigma
           --assets assets/speech2k --eval-every 5000)

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

# Stage X1 (new, E9-TPU): predict='x0' DDPM trained against the frozen
# 1500-step weak prior — the regime where the supervised probe finds
# recoverable residual structure that eps-training provably never
# transfers to the chain (docs/residual_capability_r3.md E8).  The x0
# parameterization carries the probe's structure straight to the output
# (tests/test_sampler_theory.py: mean-collapsed x0 chain == posterior
# mean exactly), so this is the "chain >= prior-only on TPU" candidate.
run /tmp/r3/p1500x0.md 8 /tmp/r3/p1500x0.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p1500x0 \
    --warm-start-dis assets/speech2k --warm-start-doc p1500 \
    --steps 0 --ddpm-steps 15000 --predict-x0 \
    --eval-every 2000 --ckpt-every 2000 --report /tmp/r3/p1500x0.md
cp -f /tmp/r3/p1500x0.md docs/demo_weakprior_x0.md

# Stage P: op-level perf attribution + batch sweep (verdict item 2).
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

# Stage X2 (new): predict='x0' against the converged prior — the
# unpredictable-residual regime, where theory says the x0 chain should
# converge to harmless (parity with prior-only) instead of the eps
# chain's net-negative.
run /tmp/r3/demox0.md 8 /tmp/r3/demox0.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc demox0 \
    --warm-start-dis assets/speech2k --warm-start-doc demo \
    --steps 0 --ddpm-steps 15000 --predict-x0 \
    --eval-every 2000 --ckpt-every 2000 --report /tmp/r3/demox0.md
cp -f /tmp/r3/demox0.md docs/demo_converged_x0.md

# Stage G: bench artifact sanity (driver runs bench.py itself at round
# end; this catches negative/unstable numbers early).
run /tmp/r3/bench.json 2 /tmp/r3/bench.log \
  bash -c 'python bench.py | tail -1 > /tmp/r3/bench.json'

echo "[pipeline2] $(date +%H:%M:%S) ALL DONE"
touch /tmp/r3/DONE
