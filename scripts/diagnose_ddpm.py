"""Residual-DDPM diagnostic probe (round-2 verdict item 1).

Loads the latest convergence-demo checkpoint and measures *why* the
sampled residual helps or hurts, on the CV set:

  * energy calibration: E|r_samp|^2 vs E|r_true|^2 where
    r_true = label/c - x_init (the regression target the DDPM must
    match, reference trainer/complex_ddpm_trainer.py:726) and
    r_samp = chain_output/c - x_init (what the sampler actually adds);
  * direction: masked cosine(r_samp, r_true);
  * spec-domain MSE of prior-only vs full chain (chain helps iff
    chain_mse < prior_mse);
  * per-inference-step teacher-forced eps-prediction MSE vs the two
    trivial baselines (predict 0; predict x_t/sqrt(1-ab), which is
    optimal when the residual is negligible) — locates *which* steps
    of the 6-step fast schedule the denoiser has actually learned;
  * the same chain with the DDPM's BatchNorms running on *batch*
    statistics instead of the running averages — isolates BN-stat
    miscalibration (inference-time x_t marginals differ from the
    training q-sample marginals the running stats saw).

Usage:
  nohup python scripts/diagnose_ddpm.py > /tmp/diag.log 2>&1 &
"""

import argparse
import faulthandler
import json
import os

faulthandler.dump_traceback_later(600, repeat=True)  # watchdog: where are we

os.environ.setdefault("PDT_APPROX_PESQ", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="assets/speech_demo")
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--sigma", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.diffusion import inference_schedule, reverse_sample
    from prior_diffuse_tpu.losses import com_mse_loss
    from prior_diffuse_tpu.training import ComplexDDPMTrainer
    from prior_diffuse_tpu.training.base import spec_features

    exp = ExperimentConfig(
        train=TrainConfig(batch_size=args.batch, n_epochs=1,
                          loss="com_mse_loss", chunk_length=48000),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=DiffusionConfig(),
    )
    run = RunConfig(assets=args.assets, doc="demo",
                    data_root=os.path.join(args.assets, "data"),
                    joint=True, retrain=True, sigma=args.sigma)
    print("building trainer ...", flush=True)
    tr = ComplexDDPMTrainer(run, exp)
    print(f"checkpoint step {tr.step}", flush=True)
    sched = inference_schedule(exp.diffusion)
    ab_inf = np.asarray(sched.alpha_cum)  # [6]
    T_inf = np.asarray(sched.T)

    def masked_stats(a, b, frames):
        """masked (E|a|^2, E|b|^2, cos(a, b)) over valid frames."""
        t = jnp.arange(a.shape[1])[None, :]
        m = (t < frames[:, None]).astype(jnp.float32)[:, :, None, None]
        ea = jnp.sum((a * m) ** 2) / jnp.sum(m * jnp.ones_like(a))
        eb = jnp.sum((b * m) ** 2) / jnp.sum(m * jnp.ones_like(b))
        dot = jnp.sum(a * b * m)
        cos = dot / jnp.sqrt(jnp.sum((a * m) ** 2) * jnp.sum((b * m) ** 2))
        return ea, eb, cos

    def probe(state, noisy, clean, frames, rng, bn_batch_stats: bool):
        cfg = tr.cfg
        feat = spec_features(noisy, cfg)
        label = spec_features(clean, cfg)
        x_init, _ = tr._dis_apply(state["dis"], feat, train=False)
        x_init = x_init / tr.c
        lbl = label / tr.c
        r_true = lbl - x_init
        cond = feat / tr.c if tr.mode == "conditional" else x_init

        def model_fn(x, t):
            eps, _ = tr._ddpm_apply(state["ddpm"], x, cond, t,
                                    train=bn_batch_stats)
            return eps

        chain = reverse_sample(model_fn, rng, x_init, x_init.shape, sched,
                               tr.mode, None)
        r_samp = chain - x_init
        prior_mse = com_mse_loss(x_init * tr.c, label, frames)
        chain_mse = com_mse_loss(chain * tr.c, label, frames)
        e_samp, e_true, cos = masked_stats(r_samp, r_true, frames)

        # teacher-forced per-step denoiser quality
        per_step = []
        ks = jax.random.split(jax.random.fold_in(rng, 7), len(ab_inf))
        for n in range(len(ab_inf)):
            ab = ab_inf[n]
            eps = jax.random.normal(ks[n], r_true.shape)
            x_t = np.sqrt(ab) * r_true + np.sqrt(1.0 - ab) * eps
            t_vec = jnp.full((r_true.shape[0],), T_inf[n])
            eps_hat, _ = tr._ddpm_apply(state["ddpm"], x_t, cond, t_vec,
                                        train=bn_batch_stats)
            mse_model = com_mse_loss(eps_hat, eps, frames)
            mse_trivial = com_mse_loss(x_t / np.sqrt(1.0 - ab), eps, frames)
            per_step.append((mse_model, mse_trivial))
        return (prior_mse, chain_mse, e_true, e_samp, cos), per_step

    probe_jit = jax.jit(probe, static_argnames=("bn_batch_stats",))

    for bn_batch in (False, True):
        accum = None
        for bi, batch in enumerate(tr.cv_loader):
            noisy, clean, frames = tr.put_batch(
                batch.noisy, batch.clean, batch.frame_nums
            )
            rng = jax.random.fold_in(jax.random.PRNGKey(123), bi)
            (pm, cm, et, es, cos), steps = probe_jit(
                tr.state, noisy, clean, frames, rng, bn_batch
            )
            rec = {
                "bn": "batch" if bn_batch else "running",
                "batch": bi,
                "prior_mse": float(pm),
                "chain_mse": float(cm),
                "res_energy_true": float(et),
                "res_energy_sampled": float(es),
                "res_cos": float(cos),
                "eps_mse_per_step": [
                    {"n": n, "T": float(T_inf[n]),
                     "alpha_cum": float(ab_inf[n]),
                     "model": float(a), "trivial": float(b)}
                    for n, (a, b) in enumerate(steps)
                ],
            }
            print(json.dumps(rec), flush=True)
            del accum


if __name__ == "__main__":
    main()
