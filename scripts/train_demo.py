"""Speech-like convergence demo with honest metrics (round-1 verdict
item 8).

Trains the joint Prior-DiffuSE system on the harder synthetic
speech-like corpus (voiced/unvoiced/silence segments + modulated noise
at controlled SNRs, ``data/synthetic.py::make_speechlike``) and logs
the noisy floor vs the enhanced output on all six metrics, the way the
reference records its floor (``scripts/cal_metrics.py:23-27``).

PESQ regime: the real binding is absent here, so the in-repo
approximation is used and every number is labeled ``pesq=approx`` —
see ``metrics/pesq_np.py`` for what that validation does and does not
claim.

Usage:
  nohup python scripts/train_demo.py --steps 3000 > /tmp/demo.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("PDT_APPROX_PESQ", "1")  # labeled approximation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--assets", default="assets/speech_demo")
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--report", default="docs/demo_speechlike.md")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--snr-lo", type=float, default=0.0)
    ap.add_argument("--snr-hi", type=float, default=15.0)
    args = ap.parse_args()

    import jax
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
            corpus, n_train=args.n_train, n_test=8,
            snr_range=(args.snr_lo, args.snr_hi), seed=7,
        )

    exp = ExperimentConfig(
        train=TrainConfig(batch_size=args.batch, n_epochs=1,
                          loss="com_mse_loss", chunk_length=48000),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=DiffusionConfig(),
    )
    run = RunConfig(assets=args.assets, doc="demo", data_root=corpus,
                    joint=True, retrain=True)
    tr = ComplexDDPMTrainer(run, exp)
    print(f"starting at step {tr.step}", flush=True)

    t0 = time.time()
    while tr.step < args.steps:
        for batch in tr.tr_loader:
            if tr.step >= args.steps:
                break
            tr.rng, k = jax.random.split(tr.rng)
            noisy, clean, frames = tr.put_batch(
                batch.noisy, batch.clean, batch.frame_nums
            )
            tr.state, total, l_dis, l_ddpm, gn = tr._train_step(
                tr.state, noisy, clean, frames, k
            )
            total = float(total)
            tr.check_nan(total)
            rec = {"loss_sum": total, "dis_loss": float(l_dis),
                   "ddpm_loss": float(l_ddpm)}
            if tr.step % 50 == 0:
                rec.update({k2: float(v) for k2, v in gn.items()})
                print(f"step {tr.step}: loss {total:.4f} "
                      f"(dis {float(l_dis):.4f} ddpm {float(l_ddpm):.4f}) "
                      f"[{time.time() - t0:.0f}s]", flush=True)
            tr.metrics.log(rec, step=tr.step)
            tr.step += 1
            if tr.step % args.ckpt_every == 0:
                payload = tr.ckpt_payload()
                tr.ckpt.save_best(payload)
                tr.ckpt.save_epoch(tr.epoch, payload)  # resumable (--retrain)
                tr.epoch += 1
    tr.ckpt.save_best(tr.ckpt_payload())
    tr.ckpt.save_epoch(tr.epoch, tr.ckpt_payload())
    print(f"trained to step {tr.step} in {time.time() - t0:.0f}s", flush=True)

    # --- score: noisy floor vs enhanced (full chain) vs prior-only
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

    import jax.numpy as jnp  # noqa: F401

    from prior_diffuse_tpu.data.wavio import read_wav, write_wav
    from prior_diffuse_tpu.serving.enhance import enhance_files
    from prior_diffuse_tpu.signal.compress import decompress_spec
    from prior_diffuse_tpu.signal.stft import istft
    from prior_diffuse_tpu.training.base import spec_features

    @jax.jit
    def _dis_impl(state, wav):
        feat = spec_features(wav, tr.cfg)
        x_init, _ = tr._dis_apply(state["dis"], feat, train=False)
        return istft(decompress_spec(x_init, tr.cfg.feat_type),
                     length=wav.shape[-1])

    class _DisOnly:
        cfg = tr.cfg

        def enhance_batch(self, wav_batch, rng):
            return _dis_impl(tr.state, tr.put_batch(wav_batch)[0])

    paths = sorted(_glob.glob(os.path.join(noisy_dir, "*.wav")))
    wavs = [read_wav(p, 16000)[0] for p in paths]
    outs = enhance_files(_DisOnly(), wavs, jax.random.PRNGKey(0))
    dis_dir = os.path.join(args.assets, "prior_only")
    os.makedirs(dis_dir, exist_ok=True)
    for p, w in zip(paths, outs):
        write_wav(os.path.join(dis_dir, os.path.basename(p)), w, 16000)
    dis_res = np.mean(np.asarray(compare(clean_dir, dis_dir)), axis=0)

    names = ["CSIG", "CBAK", "COVL", "PESQ", "SSNR", "STOI"]
    mode = pesq_mode()
    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write("# Speech-like convergence demo\n\n")
        f.write(f"Corpus: {args.n_train} train / 8 test speech-like "
                f"utterances (`make_speechlike`), SNR {args.snr_lo:g} to "
                f"{args.snr_hi:g} dB.\n"
                f"Model: joint DiffUNet + DiffUNet1, batch {args.batch}, "
                f"{tr.step} steps.\n\n")
        f.write(f"**PESQ regime: `{mode}`** — CSIG/CBAK/COVL inherit this "
                f"regime; values are comparable only within it.\n\n")
        f.write("| metric | noisy floor | prior only | full chain | "
                "delta (chain - floor) |\n")
        f.write("|---|---|---|---|---|\n")
        for n, fl, dr, en in zip(names, floor, dis_res, enh):
            f.write(f"| {n} | {fl:.3f} | {dr:.3f} | {en:.3f} | "
                    f"{en - fl:+.3f} |\n")
        f.write("\nThe prior-only column isolates the discriminative "
                "stage; the residual DDPM's contribution matures much "
                "later in training (the reference trains ~100k steps on "
                "11,572 real utterances).\n")
    print(json.dumps({
        "step": tr.step, "pesq_mode": mode,
        "floor": dict(zip(names, [round(float(x), 3) for x in floor])),
        "prior_only": dict(zip(names, [round(float(x), 3) for x in dis_res])),
        "enhanced": dict(zip(names, [round(float(x), 3) for x in enh])),
    }), flush=True)
    print(f"report -> {args.report}", flush=True)


if __name__ == "__main__":
    main()
