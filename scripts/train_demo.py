"""Speech-like convergence demo with honest metrics and staged training.

Trains the joint Prior-DiffuSE system on the synthetic speech-like
corpus (``data/synthetic.py::make_speechlike``), optionally followed by
a DDPM-only stage (``--ddpm-steps``, the reference's non-joint mode:
prior frozen, residual DDPM keeps training — the reference's own
recipe trains the residual stage far past prior convergence).  Logs the
noisy floor vs prior-only vs the full chain on all six metrics, plus
the residual-DDPM health diagnostics (sampled vs true residual energy,
cosine) every eval.

Loop efficiency on the tunneled single-chip PJRT: the per-step PRNG is
derived *inside* the jit from the step counter
(``ComplexDDPMTrainer._train_step_seeded``) and loss scalars are only
read back every ``--log-every`` steps, so steps pipeline without a
host round trip each.

PESQ regime: the real binding is absent here, so the in-repo
approximation is used and every number is labeled ``pesq=approx`` —
see ``metrics/pesq_np.py``.  CSIG/CBAK/COVL cells that sit at the
Loizou regression floor (1.0) are flagged ``(floor)``: they carry no
comparative information (see metrics/composite.py).

Usage:
  nohup python scripts/train_demo.py --steps 40000 --ddpm-steps 60000 \
      --n-train 2048 > /tmp/demo.log 2>&1 &
"""

import argparse
import json
import os
import time

os.environ.setdefault("PDT_APPROX_PESQ", "1")  # labeled approximation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

FLOOR_EPS = 5e-4  # composite regression floor detector


def _rss_gb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 2**30


def run_stage(tr, until, args, t0):
    """Drive the trainer to step ``until`` with pipelined steps."""
    import numpy as np

    while tr.step < until:
        for batch in tr.tr_loader:
            if tr.step >= until:
                break
            noisy, clean, frames = tr.put_batch(
                batch.noisy, batch.clean, batch.frame_nums
            )
            tr.state, total, l_dis, l_ddpm, gn = tr._train_step_seeded(
                tr.state, noisy, clean, frames, np.int32(tr.step)
            )
            tr.step += 1
            if tr.step % args.log_every == 0:
                tot = float(total)  # scalar readback: sync point
                tr.check_nan(tot)
                rec = {"loss_sum": tot, "dis_loss": float(l_dis),
                       "ddpm_loss": float(l_ddpm)}
                rec.update({k: float(v) for k, v in gn.items()})
                tr.metrics.log(rec, step=tr.step)
                if tr.step % (args.log_every * 10) == 0:
                    print(f"step {tr.step}: loss {tot:.4f} "
                          f"(dis {float(l_dis):.4f} ddpm {float(l_ddpm):.4f})"
                          f" [{time.time() - t0:.0f}s]", flush=True)
            if args.eval_every and tr.step % args.eval_every == 0:
                tr.evaluate()
            if tr.step % args.ckpt_every == 0:
                payload = tr.ckpt_payload()
                tr.ckpt.save_best(payload)
                tr.ckpt.save_epoch(tr.epoch, payload)  # resumable
                tr.epoch += 1
                if args.deadline and time.time() > args.deadline:
                    # clean exit between steps (never kill an axon client
                    # mid-RPC: that has taken the tunnel down before —
                    # CLAUDE.md round-3 learnings); the run is resumable
                    # from the checkpoint just saved
                    raise SystemExit(
                        f"deadline reached at step {tr.step}; checkpointed"
                    )
                if args.max_rss_gb and _rss_gb() > args.max_rss_gb:
                    # The tunneled PJRT client leaks host RSS per step
                    # (~5.8 MB/step at batch 8, CLAUDE.md round-4); a
                    # long run would get OOM-KILLED mid-RPC — which has
                    # taken the relay down before.  Exit cleanly at the
                    # checkpoint boundary instead; the queue retry
                    # resumes in a fresh process.
                    raise SystemExit(
                        f"RSS {_rss_gb():.1f} GB > --max-rss-gb "
                        f"{args.max_rss_gb:g} at step {tr.step}; "
                        "checkpointed for a fresh-process resume"
                    )
    payload = tr.ckpt_payload()
    tr.ckpt.save_best(payload)
    tr.ckpt.save_epoch(tr.epoch, payload)
    tr.epoch += 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000,
                    help="joint-stage steps (stage A)")
    ap.add_argument("--ddpm-steps", type=int, default=0,
                    help="additional DDPM-only steps (stage B, prior frozen)")
    ap.add_argument("--assets", default="assets/speech_demo")
    ap.add_argument("--doc", default="demo",
                    help="checkpoint/log namespace under --assets")
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--report", default="docs/demo_speechlike.md")
    ap.add_argument("--train-t-fast", action="store_true",
                    help="framework extension: q-sample t from the fast "
                         "inference schedule's aligned (T, alpha_bar) "
                         "pairs (DiffusionConfig.train_t_fast)")
    ap.add_argument("--n-avg", type=int, default=1,
                    help="average this many reverse chains at sampling "
                         "(posterior-mean extension; 1 = reference)")
    ap.add_argument("--zero-init", action="store_true",
                    help="start the reverse chain from zeros (posterior-"
                         "mean shortcut, the n_avg->inf limit of an "
                         "affine chain; DiffusionConfig.zero_init)")
    ap.add_argument("--cond-noisy", action="store_true",
                    help="framework extension: DDPM conditions on "
                         "[x_init, noisy spectrum] (DiffusionConfig."
                         "cond_noisy)")
    ap.add_argument("--predict-x0", action="store_true",
                    help="framework extension: DDPM regresses the "
                         "residual directly instead of the noise; the "
                         "sampler converts per step "
                         "(DiffusionConfig.predict='x0')")
    ap.add_argument("--x0-leak-drop", type=float, default=0.0,
                    help="framework extension: probability that a "
                         "training sample's x_t signal content is "
                         "hard-zeroed, closing the x0 objective's "
                         "identity leak; 1.0 = posterior-mean "
                         "regression through the unchanged sampler "
                         "(DiffusionConfig.x0_leak_drop)")
    ap.add_argument("--warm-start-doc", default="demo",
                    help="doc dir inside --warm-start-dis to copy the "
                         "prior from (e.g. demo_early)")
    ap.add_argument("--warm-start-dis", default=None, metavar="ASSETS",
                    help="initialize the (frozen) prior from another "
                         "run's best checkpoint (assets dir, doc 'demo') "
                         "instead of training stage A")
    ap.add_argument("--ckpt-every", type=int, default=2000)
    ap.add_argument("--deadline", type=float, default=0,
                    help="unix epoch seconds; exit cleanly (resumable) at "
                         "the first checkpoint boundary past this time")
    ap.add_argument("--max-rss-gb", type=float, default=80.0,
                    help="exit cleanly (resumable) at the first checkpoint "
                         "boundary where host RSS exceeds this, before the "
                         "tunneled-PJRT leak draws the OOM killer (0=off)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="full sampling eval + residual diag cadence (0=off)")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-test", type=int, default=8)
    ap.add_argument("--snr-lo", type=float, default=0.0)
    ap.add_argument("--snr-hi", type=float, default=15.0)
    ap.add_argument("--sigma", action="store_true",
                    help="PriorGrad sigma-conditioned noise (--sigma flag)")
    ap.add_argument("--lam", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--lr-ddpm", type=float, default=2e-4)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 mixed-precision model compute")
    ap.add_argument("--chunk", type=int, default=48000,
                    help="training chunk length in samples (reference: "
                         "48000; smaller for CPU-feasible runs)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tunnel-outage fallback; "
                         "sitecustomize pins axon so the env var alone "
                         "does not work)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.metrics.compare import compare
    from prior_diffuse_tpu.metrics.pesq import pesq_mode
    from prior_diffuse_tpu.training import ComplexDDPMTrainer
    from prior_diffuse_tpu.utils.logging import setup_logging

    setup_logging(os.path.join(args.assets, "log"))
    corpus = os.path.join(args.assets, "data")
    if not os.path.isdir(os.path.join(corpus, "noisy_trainset_wav")):
        print("writing speech-like corpus ...", flush=True)
        synthetic.write_corpus_speechlike(
            corpus, n_train=args.n_train, n_test=args.n_test,
            snr_range=(args.snr_lo, args.snr_hi), seed=7,
        )

    exp = ExperimentConfig(
        train=TrainConfig(batch_size=args.batch, n_epochs=1,
                          loss="com_mse_loss", chunk_length=args.chunk,
                          lam=args.lam,
                          compute_dtype="bfloat16" if args.bf16
                          else "float32"),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=args.lr),
        optim_ddpm=OptimConfig(lr=args.lr_ddpm),
        diffusion=DiffusionConfig(cond_noisy=args.cond_noisy,
                                  train_t_fast=args.train_t_fast,
                                  n_avg=args.n_avg,
                                  zero_init=args.zero_init,
                                  predict="x0" if args.predict_x0
                                  else "eps",
                                  x0_leak_drop=args.x0_leak_drop),
    )
    t0 = time.time()

    def maybe_warm_start(tr):
        """Copy the trained prior (dis params + BN stats) from another
        run's best checkpoint into this fresh trainer.  Used to explore
        residual-DDPM variants (e.g. --cond-noisy, whose DDPM shapes
        differ from the source checkpoint) without retraining stage A."""
        if not args.warm_start_dis or tr.step > 0:
            return
        src_exp = ExperimentConfig(
            train=exp.train, model=exp.model, optim=exp.optim,
            optim_ddpm=exp.optim_ddpm, diffusion=DiffusionConfig(),
        )
        src_run = RunConfig(assets=args.warm_start_dis, doc=args.warm_start_doc,
                            data_root=corpus, joint=False, retrain=True,
                            sigma=args.sigma)
        src = ComplexDDPMTrainer(src_run, src_exp)
        if src.step == 0:
            raise SystemExit(f"no checkpoint under {args.warm_start_dis}")
        print(f"warm-starting dis from {args.warm_start_dis} "
              f"(step {src.step})", flush=True)
        tr.state["dis"] = src.state["dis"]
        del src

    run_a = RunConfig(assets=args.assets, doc=args.doc, data_root=corpus,
                      joint=True, retrain=True, sigma=args.sigma)
    tr = ComplexDDPMTrainer(run_a, exp)
    if args.steps > 0:
        maybe_warm_start(tr)
    print(f"stage A (joint) from step {tr.step} to {args.steps}", flush=True)
    if tr.step < args.steps:
        run_stage(tr, args.steps, args, t0)
    print(f"stage A done at step {tr.step} [{time.time() - t0:.0f}s]",
          flush=True)

    total_steps = args.steps + args.ddpm_steps
    if args.ddpm_steps and tr.step < total_steps:
        # stage B: reference non-joint mode — dis params frozen, only the
        # residual DDPM trains (resumes from the stage-A checkpoint)
        warm = args.warm_start_dis and tr.step == 0
        del tr
        run_b = RunConfig(assets=args.assets, doc=args.doc, data_root=corpus,
                          joint=False, retrain=True, sigma=args.sigma)
        tr = ComplexDDPMTrainer(run_b, exp)
        if warm:
            maybe_warm_start(tr)
        print(f"stage B (ddpm-only) from step {tr.step} to {total_steps}",
              flush=True)
        run_stage(tr, total_steps, args, t0)
        print(f"stage B done at step {tr.step} [{time.time() - t0:.0f}s]",
              flush=True)
    print(f"trained to step {tr.step} in {time.time() - t0:.0f}s", flush=True)

    # final residual diagnostics on the CV set
    tr.evaluate()

    # --- score: noisy floor vs prior-only vs enhanced (full chain)
    clean_dir = os.path.join(corpus, "clean_testset_wav")
    noisy_dir = os.path.join(corpus, "noisy_testset_wav")
    out_dir = os.path.join(args.assets, "enhanced")
    tr.generate_wav(load_pre_train=False, data_path=noisy_dir,
                    out_dir=out_dir)
    floor = np.mean(np.asarray(compare(clean_dir, noisy_dir)), axis=0)
    enh = np.mean(np.asarray(compare(clean_dir, out_dir)), axis=0)

    # diagnostic: the discriminative prior alone (x_init, no DDPM
    # residual) — separates prior quality from residual-DDPM maturity
    import glob as _glob

    from prior_diffuse_tpu.data.wavio import read_wav, write_wav
    from prior_diffuse_tpu.serving.enhance import (enhance_files,
                                                   prior_only_server)

    paths = sorted(_glob.glob(os.path.join(noisy_dir, "*.wav")))
    wavs = [read_wav(p, 16000)[0] for p in paths]
    outs = enhance_files(prior_only_server(tr), wavs, jax.random.PRNGKey(0))
    dis_dir = os.path.join(args.assets, "prior_only")
    os.makedirs(dis_dir, exist_ok=True)
    for p, w in zip(paths, outs):
        write_wav(os.path.join(dis_dir, os.path.basename(p)), w, 16000)
    dis_res = np.mean(np.asarray(compare(clean_dir, dis_dir)), axis=0)

    names = ["CSIG", "CBAK", "COVL", "PESQ", "SSNR", "STOI"]
    clippable = {"CSIG", "CBAK", "COVL"}
    mode = pesq_mode()

    def cell(name, v):
        flag = " (floor)" if name in clippable and v <= 1.0 + FLOOR_EPS else ""
        return f"{v:.3f}{flag}"

    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write("# Speech-like convergence demo\n\n")
        f.write(f"Corpus: {args.n_train} train / {args.n_test} test "
                f"speech-like utterances (`make_speechlike`), SNR "
                f"{args.snr_lo:g} to {args.snr_hi:g} dB.\n"
                f"Model: DiffUNet prior + DiffUNet1 residual DDPM, batch "
                f"{args.batch}, {args.steps} joint steps"
                + (f" + {args.ddpm_steps} DDPM-only steps"
                   if args.ddpm_steps else "")
                + (", sigma-conditioned" if args.sigma else "")
                + (", cond_noisy extension" if args.cond_noisy else "")
                + (", train_t_fast extension" if args.train_t_fast else "")
                + (f", n_avg={args.n_avg} posterior-mean sampling"
                   if args.n_avg > 1 else "")
                + (", zero_init posterior-mean sampling"
                   if args.zero_init else "")
                + (", predict=x0 parameterization"
                   if args.predict_x0 else "")
                + (f", x0_leak_drop={args.x0_leak_drop:g}"
                   if args.x0_leak_drop else "")
                + (f", prior warm-started from {args.warm_start_dis}"
                   if args.warm_start_dis else "")
                + f", lam {args.lam:g}.\n\n")
        f.write(f"**PESQ regime: `{mode}`** — CSIG/CBAK/COVL inherit this "
                f"regime; values are comparable only within it. Cells "
                f"flagged `(floor)` sit at the Loizou regression floor "
                f"(1.0) and carry no comparative information.\n\n")
        f.write("| metric | noisy floor | prior only | full chain | "
                "delta (chain - prior) |\n")
        f.write("|---|---|---|---|---|\n")
        for n, fl, dr, en in zip(names, floor, dis_res, enh):
            both_floor = (n in clippable and fl <= 1.0 + FLOOR_EPS
                          and en <= 1.0 + FLOOR_EPS)
            delta = "n/a (floor)" if both_floor else f"{en - dr:+.3f}"
            f.write(f"| {n} | {cell(n, fl)} | {cell(n, dr)} | "
                    f"{cell(n, en)} | {delta} |\n")
        f.write("\nThe prior-only column isolates the discriminative "
                "stage; `delta (chain - prior)` is the residual DDPM's "
                "net contribution.\n")
    print(json.dumps({
        "step": tr.step, "pesq_mode": mode,
        "floor": dict(zip(names, [round(float(x), 3) for x in floor])),
        "prior_only": dict(zip(names, [round(float(x), 3) for x in dis_res])),
        "enhanced": dict(zip(names, [round(float(x), 3) for x in enh])),
    }), flush=True)
    print(f"report -> {args.report}", flush=True)


if __name__ == "__main__":
    main()
