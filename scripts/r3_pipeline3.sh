#!/bin/bash
# Round-3 chip pipeline v3 — supersedes r3_pipeline2.sh.  Changes:
#   * the probe-backed capability experiment comes FIRST: the running
#     p300 predictability probe measures val cos ~0.37 on the 300-step
#     weak prior's residual, so predict='x0' against THAT prior is the
#     strongest "chain > prior-only" candidate (the x0 chain emits the
#     posterior mean a mean-collapsed net learns — the probe IS that
#     net; docs/residual_capability_r3.md E8/E9 theory box);
#   * wall-clock deadline gating: no stage try starts after
#     $STAGE_DEADLINE, and train_demo exits cleanly (resumable, never
#     mid-RPC) at the first checkpoint boundary past $TRAIN_DEADLINE,
#     so the driver's round-end bench.py never shares the chip with a
#     training run (two axon clients has killed the tunnel before).
#
# Every stage is gated on an artifact file and retried a bounded number
# of times, so the pipeline self-heals across the axon host-RSS leak
# (restarts resume from the latest orbax epoch checkpoint) and brief
# tunnel outages.  Run detached:
#   nohup bash scripts/r3_pipeline3.sh > /tmp/r3/pipeline3.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export PDT_APPROX_PESQ=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
mkdir -p /tmp/r3 docs

STAGE_DEADLINE=$(date -d "21:00" +%s)   # no new stage tries after this
TRAIN_DEADLINE=$(date -d "21:15" +%s)   # train loops checkpoint+exit here

# Wait for any inherited chip job to finish before touching the chip.
if [ -n "${WAIT_PID:-}" ]; then
  echo "[pipeline3] waiting for inherited chip pid $WAIT_PID"
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
  echo "[pipeline3] pid $WAIT_PID done"
fi

# run <artifact> <max_tries> <log> <cmd...>
run() {
  local artifact="$1" tries="$2" log="$3"; shift 3
  local i=0
  while [ ! -e "$artifact" ] && [ "$i" -lt "$tries" ]; do
    if [ "$(date +%s)" -gt "$STAGE_DEADLINE" ]; then
      echo "[pipeline3] stage deadline passed; skipping $artifact"
      return 1
    fi
    i=$((i + 1))
    echo "[pipeline3] $(date +%H:%M:%S) try $i/$tries: $* (want $artifact)"
    "$@" >> "$log" 2>&1
    echo "[pipeline3] $(date +%H:%M:%S) exit $? (artifact $([ -e "$artifact" ] && echo yes || echo no))"
    [ -e "$artifact" ] || sleep 20
  done
  if [ ! -e "$artifact" ]; then
    echo "[pipeline3] GIVING UP on $artifact after $i tries"
    return 1
  fi
}

DEMO_ARGS=(--n-train 2048 --n-test 16 --snr-lo -5 --snr-hi 5 --sigma
           --assets assets/speech2k --eval-every 2000 --ckpt-every 2000
           --deadline "$TRAIN_DEADLINE")

# Stage X1a (capability headline): predict='x0' DDPM, 15k DDPM-only
# steps against the frozen 300-step weak prior — the regime where the
# supervised probe measures cos ~0.37 of recoverable residual structure
# that eps-training provably never transfers to the chain (E8).  A
# mean-collapsed x0 net emits the posterior-mean residual exactly
# (tests/test_sampler_theory.py), so this is the "chain >= prior-only
# on TPU" candidate.
run /tmp/r3/p300x0.md 10 /tmp/r3/p300x0.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p300x0 \
    --warm-start-dis assets/speech2k --warm-start-doc p300 \
    --steps 0 --ddpm-steps 15000 --predict-x0 \
    --report /tmp/r3/p300x0.md
[ -e /tmp/r3/p300x0.md ] && cp -f /tmp/r3/p300x0.md docs/demo_weakprior300_x0.md

# Stage P: op-level perf attribution + batch sweep (verdict item 2).
run docs/PERF_r3.json 2 /tmp/r3/profile.log \
  python scripts/profile_breakdown.py

# Stage C2: predictability probe for the 1500-step prior (E3b's second
# row; the p300 row is produced by the inherited job above).
run docs/probe_predictability_p1500_cond.json 3 /tmp/r3/probe1500.log \
  python scripts/probe_predictability.py --assets assets/speech2k \
    --doc p1500 --sigma --variant cond --steps 12000 \
    --out docs/probe_predictability_p1500_cond.json

# Stage X1b: predict='x0' against the 1500-step prior (stronger prior,
# smaller predictable fraction — tests the dose-response of the x0 win).
run /tmp/r3/p1500x0.md 10 /tmp/r3/p1500x0.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p1500x0 \
    --warm-start-dis assets/speech2k --warm-start-doc p1500 \
    --steps 0 --ddpm-steps 15000 --predict-x0 \
    --report /tmp/r3/p1500x0.md
[ -e /tmp/r3/p1500x0.md ] && cp -f /tmp/r3/p1500x0.md docs/demo_weakprior_x0.md

# Stage E: flagship staged demo (E1 re-run; the box re-image deleted
# the round-3 'demo' checkpoints).  Resumable across retries.
run /tmp/r3/e1.md 40 /tmp/r3/e1.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc demo \
    --steps 40000 --ddpm-steps 20000 \
    --report /tmp/r3/e1.md
[ -e /tmp/r3/e1.md ] && cp -f /tmp/r3/e1.md docs/demo_speechlike_2k.md

# Stage F: E6 — posterior-mean (n_avg=8) re-eval of the unchanged E1
# checkpoint; no training (step 60000 >= requested 0).
run /tmp/r3/e6.md 3 /tmp/r3/e6.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc demo \
    --steps 0 --ddpm-steps 0 --n-avg 8 --report /tmp/r3/e6.md
[ -e /tmp/r3/e6.md ] && cp -f /tmp/r3/e6.md docs/demo_speechlike_2k_navg8.md

# Stage X2: predict='x0' against the converged prior — the
# unpredictable-residual regime, where theory says the x0 chain
# converges to harmless (parity) instead of the eps chain's
# net-negative.
run /tmp/r3/demox0.md 8 /tmp/r3/demox0.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc demox0 \
    --warm-start-dis assets/speech2k --warm-start-doc demo \
    --steps 0 --ddpm-steps 15000 --predict-x0 \
    --report /tmp/r3/demox0.md
[ -e /tmp/r3/demox0.md ] && cp -f /tmp/r3/demox0.md docs/demo_converged_x0.md

# Stage G: bench artifact sanity (driver runs bench.py itself at round
# end; this catches negative/unstable numbers early).
run /tmp/r3/bench.json 2 /tmp/r3/bench.log \
  bash -c 'python bench.py | tail -1 > /tmp/r3/bench.json'

echo "[pipeline3] $(date +%H:%M:%S) ALL DONE"
touch /tmp/r3/DONE
