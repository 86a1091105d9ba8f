#!/bin/bash
# SUPERSEDED by r3_pipeline5.sh (kept for the round-3 record): the
# stage-L description below predates the committed x0_leak_drop
# implementation.  The committed semantics is a HARD zero of the x_t
# signal content (not soft U[0,1) attenuation — that design was
# refuted by tests/test_sampler_theory.py before reaching the chip),
# and p=0.5 is the mixed-population regime the same theory pins as
# WORSE than the prior; the supported operating point is p=1.0
# (r3_pipeline5.sh / scripts/r4_jobs/10_p300x0l.sh).  Do not run this.
# Round-3 chip pipeline v4 — the x0_leak_drop capability experiment.
#
# Context (docs/residual_capability_r3.md E9-TPU): against the 300-step
# weak prior the supervised probe measures val cos 0.472 (~22 %
# recoverable residual MSE), but the plain predict='x0' chain banks
# none of it — the sampled residual collapses to 7 % energy / cos 0.02
# because of the x0 objective's identity leak.  x0_leak_drop is the
# train-side fix (attenuate x_t's signal content by U[0,1) with prob p,
# so the net must recover the residual from the conditioning).  This
# pipeline measures whether the fix banks the predictable fraction:
# done = chain SSNR > prior-only SSNR at the p300 regime (plain-x0
# scored -0.33 there).
#
# Same artifact-gating / deadline rules as r3_pipeline3.sh: never two
# axon clients, never kill mid-RPC, resumable via orbax epoch ckpts.
# Run detached:
#   nohup bash scripts/r3_pipeline4.sh > /tmp/r3b/pipeline4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export PDT_APPROX_PESQ=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
mkdir -p /tmp/r3b docs

NOW=$(date +%s)
STAGE_DEADLINE=$((NOW + 35 * 60))   # no new stage tries after this
TRAIN_DEADLINE=$((NOW + 40 * 60))   # train loops checkpoint+exit here

run() {
  local artifact="$1" tries="$2" log="$3"; shift 3
  local i=0
  while [ ! -e "$artifact" ] && [ "$i" -lt "$tries" ]; do
    if [ "$(date +%s)" -gt "$STAGE_DEADLINE" ]; then
      echo "[pipeline4] stage deadline passed; skipping $artifact"
      return 1
    fi
    i=$((i + 1))
    echo "[pipeline4] $(date +%H:%M:%S) try $i/$tries: $* (want $artifact)"
    "$@" >> "$log" 2>&1
    echo "[pipeline4] $(date +%H:%M:%S) exit $? (artifact $([ -e "$artifact" ] && echo yes || echo no))"
    [ -e "$artifact" ] || sleep 20
  done
  [ -e "$artifact" ]
}

DEMO_ARGS=(--n-train 2048 --n-test 16 --snr-lo -5 --snr-hi 5 --sigma
           --assets assets/speech2k --eval-every 2000 --ckpt-every 2000
           --deadline "$TRAIN_DEADLINE")

# Stage W: rebuild the 300-step weak prior (the box re-image deleted all
# round-3 checkpoints).  Same corpus generator/seed as every other
# speech2k run, so E9-TPU's probe numbers still describe this regime.
run /tmp/r3b/p300.md 4 /tmp/r3b/p300.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p300 \
    --steps 300 --ddpm-steps 0 \
    --report /tmp/r3b/p300.md

# Stage L: predict='x0' + x0_leak_drop=0.5, 8k DDPM-only steps against
# the frozen p300 prior.  Direct comparands: E9-TPU p300 plain-x0
# (docs/demo_weakprior300_x0.md, 15k steps, Δ SSNR −0.33, sampled
# residual 7 % energy / cos 0.02) and the E3 eps chain (Δ SSNR −6.99).
run /tmp/r3b/p300x0l.md 10 /tmp/r3b/p300x0l.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p300x0l \
    --warm-start-dis assets/speech2k --warm-start-doc p300 \
    --steps 0 --ddpm-steps 8000 --predict-x0 --x0-leak-drop 0.5 \
    --report /tmp/r3b/p300x0l.md
[ -e /tmp/r3b/p300x0l.md ] && cp -f /tmp/r3b/p300x0l.md docs/demo_weakprior300_x0leak.md

# Stage N: n_avg=8 posterior-mean re-eval of the unchanged stage-L
# checkpoint (no training) — do the sampling- and training-side fixes
# compose?
run /tmp/r3b/p300x0l_navg8.md 3 /tmp/r3b/p300x0l_navg8.log \
  python scripts/train_demo.py "${DEMO_ARGS[@]}" --doc p300x0l \
    --steps 0 --ddpm-steps 0 --n-avg 8 --predict-x0 --x0-leak-drop 0.5 \
    --report /tmp/r3b/p300x0l_navg8.md
[ -e /tmp/r3b/p300x0l_navg8.md ] && cp -f /tmp/r3b/p300x0l_navg8.md docs/demo_weakprior300_x0leak_navg8.md

echo "[pipeline4] $(date +%H:%M:%S) ALL DONE"
touch /tmp/r3b/DONE
