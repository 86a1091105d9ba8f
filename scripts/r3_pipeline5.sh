#!/bin/bash
# Round-3 chip pipeline v5 — supersedes r3_pipeline4.sh mid-flight.
#
# v4 launched stage W (p300 weak-prior rebuild) and was then stopped
# before stage L: the closed-form affine analysis (now pinned in
# tests/test_sampler_theory.py) showed v4's soft U[0,1) leak
# attenuation at p=0.5 is MISCALIBRATED against the sampler's
# full-scale x0->eps conversion (chain worse than prior at the
# optimum).  The clean point is hard drop at p=1.0: the training
# optimum is a posterior-mean regressor the unchanged reference
# sampler emits exactly — chain MSE = e_unpredictable, strictly below
# prior AND reference chain whenever anything is predictable.  At the
# p300 regime the probe measured val cos 0.472 (~22 % recoverable
# MSE), so the predicted outcome is chain SSNR > prior-only SSNR
# (plain-x0 scored -0.33 there, eps -6.99).
#
# Run detached AFTER v4's stage-W python exits (this script waits):
#   nohup bash scripts/r3_pipeline5.sh > /tmp/r3b/pipeline5.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export PDT_APPROX_PESQ=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
mkdir -p /tmp/r3b docs

NOW=$(date +%s)
STAGE_DEADLINE=$((NOW + 45 * 60))
TRAIN_DEADLINE=$((NOW + 50 * 60))

# Wait for any inherited chip job (v4's stage W) — never two axon clients.
if [ -n "${WAIT_PID:-}" ]; then
  echo "[pipeline5] waiting for inherited chip pid $WAIT_PID"
  while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
  echo "[pipeline5] pid $WAIT_PID done"
fi

run() {
  local artifact="$1" tries="$2" log="$3"; shift 3
  local i=0
  while [ ! -e "$artifact" ] && [ "$i" -lt "$tries" ]; do
    if [ "$(date +%s)" -gt "$STAGE_DEADLINE" ]; then
      echo "[pipeline5] stage deadline passed; skipping $artifact"
      return 1
    fi
    i=$((i + 1))
    echo "[pipeline5] $(date +%H:%M:%S) try $i/$tries: $* (want $artifact)"
    "$@" >> "$log" 2>&1
    echo "[pipeline5] $(date +%H:%M:%S) exit $? (artifact $([ -e "$artifact" ] && echo yes || echo no))"
    [ -e "$artifact" ] || sleep 20
  done
  [ -e "$artifact" ]
}

DEMO_ARGS=(--n-train 2048 --n-test 16 --snr-lo -5 --snr-hi 5 --sigma
           --assets assets/speech2k --eval-every 2000 --ckpt-every 2000
           --deadline "$TRAIN_DEADLINE")

# Stage W (usually already satisfied by v4): 300-step weak prior.
run /tmp/r3b/p300.md 4 /tmp/r3b/p300.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p300 \
    --steps 300 --ddpm-steps 0 \
    --report /tmp/r3b/p300.md

# Stage L: predict='x0' + HARD x0_leak_drop=1.0, 8k DDPM-only steps
# against the frozen p300 prior.  Comparands: plain-x0 (E9-TPU,
# docs/demo_weakprior300_x0.md, Δ SSNR −0.33) and eps (E3, Δ −6.99).
run /tmp/r3b/p300x0l.md 10 /tmp/r3b/p300x0l.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p300x0l \
    --warm-start-dis assets/speech2k --warm-start-doc p300 \
    --steps 0 --ddpm-steps 8000 --predict-x0 --x0-leak-drop 1.0 \
    --report /tmp/r3b/p300x0l.md
[ -e /tmp/r3b/p300x0l.md ] && cp -f /tmp/r3b/p300x0l.md docs/demo_weakprior300_x0leak.md

# Stage N: n_avg=8 posterior-mean re-eval of the unchanged stage-L
# checkpoint — at the leak-drop optimum the chain is already the
# posterior mean, so the prediction is "no further gain" (a real net
# retains some x_t dependence; n_avg averages that residue out).
run /tmp/r3b/p300x0l_navg8.md 3 /tmp/r3b/p300x0l_navg8.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p300x0l \
    --steps 0 --ddpm-steps 0 --n-avg 8 --predict-x0 --x0-leak-drop 1.0 \
    --report /tmp/r3b/p300x0l_navg8.md
[ -e /tmp/r3b/p300x0l_navg8.md ] && cp -f /tmp/r3b/p300x0l_navg8.md docs/demo_weakprior300_x0leak_navg8.md

# Stage L2 (only if wall clock allows): dose-response — hard p=1.0
# against the stronger 1500-step prior (probe val cos 0.178).
run /tmp/r3b/p1500.md 3 /tmp/r3b/p1500.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p1500 \
    --steps 1500 --ddpm-steps 0 \
    --report /tmp/r3b/p1500.md
run /tmp/r3b/p1500x0l.md 6 /tmp/r3b/p1500x0l.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p1500x0l \
    --warm-start-dis assets/speech2k --warm-start-doc p1500 \
    --steps 0 --ddpm-steps 8000 --predict-x0 --x0-leak-drop 1.0 \
    --report /tmp/r3b/p1500x0l.md
[ -e /tmp/r3b/p1500x0l.md ] && cp -f /tmp/r3b/p1500x0l.md docs/demo_weakprior_x0leak.md

echo "[pipeline5] $(date +%H:%M:%S) ALL DONE"
touch /tmp/r3b/DONE
