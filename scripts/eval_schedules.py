"""Sampler-schedule quality <-> latency tradeoff on a trained run.

PERF_r4_notes.md S3 names "fewer sampler steps" as the one remaining
serving lever after the dual-decoder fusion (the 6 DiffUNet1 forwards
are ~all of the enhance batch).  The step count is already fully
config-reachable — ``DiffusionConfig.inference_noise_schedule`` is the
reference's WaveGrad-style fast schedule
(``utils/params.py:36-41`` / ``trainer/complex_ddpm_trainer.py:105-156``)
and any beta list that embeds into the 50-step training grid is legal —
so this script measures, rather than adds, the tradeoff: it loads a
trained two-stage run and sweeps

    prior-only (0 steps) .. fast-2/3/4 .. fast-6 (reference default)
    .. fast-8 .. full-50 (``fast_sampling: false``)

scoring all six metrics on the run's test set and slope-timing the
production ``enhance_batch`` jit per schedule (chained device runs
ending in a scalar readback — the only trustworthy timing on this
PJRT, see bench.py).

Output: a markdown table (--report) + JSON sidecar, the measured
answer to "how many reverse steps does serving actually need".

Usage (after a train_demo.py run):
  python scripts/eval_schedules.py --assets assets/fullscale8 \
      --doc fs8B --sigma --predict-x0 --bf16 \
      --report docs/SCHEDULE_TRADEOFF_r4.md
"""

import argparse
import dataclasses
import json
import os
import statistics
import time

os.environ.setdefault("PDT_APPROX_PESQ", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

FLOOR_EPS = 5e-4

# Short fast schedules: every beta list must embed into the 50-step
# linspace(1e-4, 0.05) training grid (inference_schedule raises if its
# alpha_cum leaves the training cumprod range [0.2857, 0.9999]); these
# are checked by tests/test_schedule.py::test_tradeoff_variants_embed.
VARIANTS = [
    ("prior-only", None),
    ("fast-2", [1e-2, 0.5]),
    ("fast-3", [1e-3, 0.05, 0.5]),
    ("fast-4", [1e-3, 0.01, 0.1, 0.5]),
    ("fast-6 (default)", "default"),
    ("fast-8", [1e-4, 5e-4, 2e-3, 8e-3, 0.03, 0.1, 0.25, 0.5]),
    ("full-50", "full"),
]

N1, N2 = 1, 6


def _slope(run_chain, reps):
    vals = []
    for _ in range(reps):
        t1 = run_chain(N1)
        t2 = run_chain(N2)
        vals.append((t2 - t1) / (N2 - N1))
    return statistics.median(vals)


def time_enhance(tr, batch, rng, jnp, reps):
    """Median slope of chained enhance_batch runs (output wav feeds the
    next input, final scalar readback forces completion)."""
    import jax

    if reps <= 0:
        return float("nan")

    def chain(n):
        t0 = time.time()
        out = batch
        r = rng
        for _ in range(n):
            r, sub = jax.random.split(r)
            out = tr.enhance_batch(out, sub)
        float(jnp.sum(out))  # completion fence
        return time.time() - t0

    chain(1)  # warm the jit outside the timed runs
    return _slope(chain, reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", required=True)
    ap.add_argument("--doc", required=True,
                    help="checkpoint namespace under --assets")
    ap.add_argument("--report", default="docs/SCHEDULE_TRADEOFF_r4.md")
    ap.add_argument("--sigma", action="store_true")
    ap.add_argument("--cond-noisy", action="store_true")
    ap.add_argument("--predict-x0", action="store_true")
    ap.add_argument("--n-avg", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bf16", action="store_true",
                    help="serve in bfloat16 (production fast path)")
    ap.add_argument("--seconds", type=float, default=3.0,
                    help="timing-batch utterance length")
    ap.add_argument("--reps", type=int, default=3,
                    help="slope-timing repetitions (0 skips timing; "
                         "used by the CPU smoke test)")
    ap.add_argument("--variants", default="",
                    help="comma-separated variant-name prefixes to run "
                         "(default: all)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prior_diffuse_tpu.config import (DiffusionConfig, ExperimentConfig,
                                          ModelConfig, OptimConfig,
                                          RunConfig, TrainConfig)
    from prior_diffuse_tpu.data.wavio import read_wav
    from prior_diffuse_tpu.metrics.compare import compare
    from prior_diffuse_tpu.metrics.pesq import pesq_mode
    from prior_diffuse_tpu.serving.enhance import enhance_files
    from prior_diffuse_tpu.training.ddpm_trainer import ComplexDDPMTrainer
    from prior_diffuse_tpu.utils.logging import setup_logging

    setup_logging(os.path.join(args.assets, "log"))
    corpus = os.path.join(args.assets, "data")
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=args.batch, n_epochs=1,
                          loss="com_mse_loss",
                          compute_dtype="bfloat16" if args.bf16
                          else "float32"),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(),
        optim_ddpm=OptimConfig(),
        diffusion=DiffusionConfig(cond_noisy=args.cond_noisy,
                                  n_avg=args.n_avg,
                                  predict="x0" if args.predict_x0
                                  else "eps"),
    )
    run = RunConfig(assets=args.assets, doc=args.doc, data_root=corpus,
                    joint=False, retrain=True, sigma=args.sigma)
    tr = ComplexDDPMTrainer(run, exp)
    if tr.step == 0:
        raise SystemExit(f"no checkpoint under {args.assets}/{args.doc}")
    print(f"loaded step {tr.step} from {args.assets}/{args.doc}", flush=True)
    if args.bf16:
        tr.serve_dtype = jnp.bfloat16

    clean_dir = os.path.join(corpus, "clean_testset_wav")
    noisy_dir = os.path.join(corpus, "noisy_testset_wav")
    paths = sorted(glob.glob(os.path.join(noisy_dir, "*.wav")))
    wavs = [read_wav(p, tr.cfg.sample_rate)[0] for p in paths]

    # fixed timing batch: the serving-optimum shape (rows=8 x 3 s)
    tlen = int(args.seconds * tr.cfg.sample_rate)
    tbatch = np.zeros((args.batch, tlen), np.float32)
    for i in range(args.batch):
        w = wavs[i % len(wavs)]
        seg = w[:tlen]
        c = max(float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))), 1e-12)
        tbatch[i, : len(seg)] = seg / c
    tbatch = jnp.asarray(tbatch)

    from prior_diffuse_tpu.serving.enhance import prior_only_server

    audio_sec = args.batch * args.seconds
    rows = []
    base_diff = tr.exp.diffusion
    wanted = [v for v in args.variants.split(",") if v]
    for name, sched in VARIANTS:
        if wanted and not any(name.startswith(w) for w in wanted):
            continue
        if sched is None:
            server_dt = getattr(tr, "serve_dtype", jnp.float32)
            server, steps = prior_only_server(tr), 0
        else:
            if sched == "full":
                diff = dataclasses.replace(base_diff, fast_sampling=False)
            elif sched == "default":
                diff = base_diff
            else:
                diff = dataclasses.replace(base_diff,
                                           inference_noise_schedule=sched)
            steps = len(diff.noise_schedule if not diff.fast_sampling
                        else diff.inference_noise_schedule)
            tr.exp = dataclasses.replace(tr.exp, diffusion=diff)
            tr._enhance_key = None  # schedule changed: force a retrace
            server = tr
        print(f"[{name}] enhancing {len(wavs)} files ...", flush=True)
        out_dir = os.path.join(args.assets, "sched_eval",
                               name.split()[0].replace("-", "_"))
        os.makedirs(out_dir, exist_ok=True)
        outs = enhance_files(server, wavs, jax.random.PRNGKey(17))
        from prior_diffuse_tpu.data.wavio import write_wav

        for p, w in zip(paths, outs):
            write_wav(os.path.join(out_dir, os.path.basename(p)), w,
                      tr.cfg.sample_rate)
        res = np.mean(np.asarray(compare(clean_dir, out_dir)), axis=0)
        ms = time_enhance(server, tbatch, jax.random.PRNGKey(3), jnp,
                          args.reps) * 1e3
        # record what actually served (VERDICT r4 weak #3: the round-4
        # table's JSON claimed bf16 with nothing pinning the executed
        # formulation): the trainer's (dtype, fused) enhance key, or the
        # prior-only adapter's dtype
        if sched is None:
            served = f"prior_only:{np.dtype(server_dt).name}"
        else:
            dt_key, fused_key = tr._enhance_key
            served = f"{np.dtype(dt_key).name}:{fused_key or 'flax'}"
        rows.append({"variant": name, "steps": steps, "served": served,
                     "ms_per_batch": round(ms, 2),
                     "rtf": round(audio_sec / (ms / 1e3), 1),
                     "utt_per_s": round(args.batch / (ms / 1e3), 1),
                     "csig": round(float(res[0]), 3),
                     "cbak": round(float(res[1]), 3),
                     "covl": round(float(res[2]), 3),
                     "pesq": round(float(res[3]), 3),
                     "ssnr": round(float(res[4]), 3),
                     "stoi": round(float(res[5]), 3)})
        print(f"[{name}] {ms:.1f} ms/batch, pesq {res[3]:.3f} "
              f"ssnr {res[4]:.3f}", flush=True)
    tr.exp = dataclasses.replace(tr.exp, diffusion=base_diff)

    mode = pesq_mode()
    clippable = {"csig", "cbak", "covl"}

    def cell(k, v):
        flag = " (floor)" if k in clippable and v <= 1.0 + FLOOR_EPS else ""
        return f"{v:.3f}{flag}"

    os.makedirs(os.path.dirname(args.report) or ".", exist_ok=True)
    with open(args.report, "w") as f:
        f.write("# Sampler-schedule tradeoff (serving)\n\n")
        f.write(f"Run: `{args.assets}` doc `{args.doc}` (step {tr.step}), "
                f"{'bf16' if args.bf16 else 'f32'} serving, "
                f"batch {args.batch} x {args.seconds:g} s timing shape, "
                f"{len(wavs)}-file test set.\n\n"
                f"**PESQ regime: `{mode}`** — CSIG/CBAK/COVL inherit this "
                "regime; values are comparable only within it.\n\n")
        f.write("| schedule | steps | served | ms/batch | RTF | "
                "utt/s/chip | CSIG | "
                "CBAK | COVL | PESQ | SSNR | STOI |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['variant']} | {r['steps']} | {r['served']} "
                    f"| {r['ms_per_batch']} "
                    f"| {r['rtf']} | {r['utt_per_s']} "
                    f"| {cell('csig', r['csig'])} | {cell('cbak', r['cbak'])} "
                    f"| {cell('covl', r['covl'])} | {r['pesq']} "
                    f"| {r['ssnr']} | {r['stoi']} |\n")
        f.write("\nLatency is the slope of chained production "
                "`enhance_batch` runs ending in a scalar readback "
                "(bench.py methodology); quality is the six-metric mean "
                "over the run's test set, same files for every row. "
                "`prior-only` skips the residual DDPM entirely — its "
                "deltas to the other rows are the measured cost/benefit "
                "of each reverse-step budget.\n")
    with open(os.path.splitext(args.report)[0] + ".json", "w") as f:
        json.dump({"assets": args.assets, "doc": args.doc, "step": tr.step,
                   "serve_dtype": "bf16" if args.bf16 else "f32",
                   "pesq_mode": mode, "rows": rows}, f, indent=1)
    print(f"wrote {args.report}", flush=True)


if __name__ == "__main__":
    main()
