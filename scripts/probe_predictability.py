"""Residual predictability ceiling (round-3 root-cause experiment).

The residual DDPM can only beat the prior if the residual
``r = label/c - x_init`` is *predictable* from its conditioning — in
pirorgrad mode the conditioning is ``x_init`` alone (reference
``trainer/complex_ddpm_trainer.py:731``: ``model_ddpm(x_t, x_init, t)``).
This probe measures that ceiling directly, with no diffusion in the
way: train a fresh DiffUNet1 as a plain supervised regressor of
``r_true`` and track the validation cosine between prediction and
target.  Two variants:

  * ``cond``      — model(0, x_init, t_fix): exactly the information the
                    reference's sampler conditions on;
  * ``cond+noisy`` — model(feat/c, x_init, t_fix): upper bound if the
                    DDPM could also see the noisy spectrum.

If the best achievable val cosine stays ~0, the residual carries no
conditioning-predictable structure on this corpus and *no* residual
model with the reference's conditioning could improve on prior-only —
a corpus/scale limitation, not a framework defect.  If cos is clearly
positive, the DDPM is undertrained/miscalibrated instead.

Usage:
  nohup python scripts/probe_predictability.py --assets assets/speech2k \
      --sigma > /tmp/probe_pred.log 2>&1 &
"""

import argparse
import json
import os
import time

os.environ.setdefault("PDT_APPROX_PESQ", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="assets/speech2k")
    ap.add_argument("--doc", default="demo",
                    help="checkpoint doc dir to restore the frozen prior "
                         "from (e.g. demo_early for the 1500-step prior)")
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--sigma", action="store_true")
    ap.add_argument("--variant", choices=["cond", "cond+noisy"],
                    default="cond")
    ap.add_argument("--out", default=None,
                    help="override the output JSON path (default: "
                         "docs/probe_predictability_<doc>_<variant>.json)")
    ap.add_argument("--chunk", type=int, default=48000,
                    help="chunk length (match the checkpoint's run)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tunnel-outage fallback)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.training import ComplexDDPMTrainer
    from prior_diffuse_tpu.training.base import spec_features
    from prior_diffuse_tpu.training.optim import torch_adam

    exp = ExperimentConfig(
        train=TrainConfig(batch_size=args.batch, n_epochs=1,
                          loss="com_mse_loss", chunk_length=args.chunk),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=args.lr),
        diffusion=DiffusionConfig(),
    )
    run = RunConfig(assets=args.assets, doc=args.doc,
                    data_root=os.path.join(args.assets, "data"),
                    joint=False, retrain=True, sigma=args.sigma)
    print("building trainer (prior restored, frozen) ...", flush=True)
    tr = ComplexDDPMTrainer(run, exp)
    print(f"checkpoint step {tr.step}", flush=True)
    use_noisy = args.variant == "cond+noisy"

    # fresh regressor: same architecture as the residual DDPM
    reg = tr.ddpm_model
    t_fix = float(np.asarray(tr.num_steps - 1, np.float32))

    def init_vars(key):
        dummy = jnp.zeros((1, 301, tr.cfg.freq_bins, 2))
        return reg.init(key, dummy, dummy, jnp.zeros((1,)), train=False)

    reg_vars = jax.jit(init_vars)(jax.random.PRNGKey(77))
    tx = torch_adam(args.lr)
    opt_state = jax.jit(tx.init)(reg_vars["params"])

    def fields(state, noisy, clean):
        feat = spec_features(noisy, tr.cfg)
        label = spec_features(clean, tr.cfg)
        x_init, _ = tr._dis_apply(state["dis"], feat, train=False)
        x_init = x_init / tr.c
        r_true = label / tr.c - x_init
        x_in = feat / tr.c if use_noisy else jnp.zeros_like(x_init)
        return x_in, x_init, r_true

    def masked_mse_cos(pred, target, frames):
        t = jnp.arange(pred.shape[1])[None, :]
        m = (t < frames[:, None]).astype(jnp.float32)[:, :, None, None]
        mse = jnp.sum(((pred - target) * m) ** 2) / jnp.sum(
            m * jnp.ones_like(pred))
        dot = jnp.sum(pred * target * m)
        cos = dot / jnp.sqrt(
            jnp.sum((pred * m) ** 2) * jnp.sum((target * m) ** 2) + 1e-20)
        return mse, cos

    @jax.jit
    def train_step(reg_vars, opt_state, state, noisy, clean, frames):
        x_in, x_init, r_true = fields(state, noisy, clean)
        tvec = jnp.full((noisy.shape[0],), t_fix)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": reg_vars["batch_stats"]}
            out = reg.apply(variables, x_in, x_init, tvec, train=True,
                            mutable=["batch_stats"])
            pred, updated = out
            mse, _ = masked_mse_cos(pred, r_true, frames)
            return mse, updated.get("batch_stats",
                                    reg_vars["batch_stats"])

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(reg_vars["params"])
        updates, opt_state = tx.update(grads, opt_state,
                                       reg_vars["params"])
        params = optax.apply_updates(reg_vars["params"], updates)
        return ({"params": params, "batch_stats": new_bs}, opt_state,
                loss)

    @jax.jit
    def eval_step(reg_vars, state, noisy, clean, frames):
        x_in, x_init, r_true = fields(state, noisy, clean)
        tvec = jnp.full((noisy.shape[0],), t_fix)
        pred = reg.apply(reg_vars, x_in, x_init, tvec, train=False,
                         mutable=False)
        mse, cos = masked_mse_cos(pred, r_true, frames)
        e_pred = jnp.mean(pred ** 2)
        e_true = jnp.mean(r_true ** 2)
        return mse, cos, e_pred, e_true

    def run_eval(step):
        rows = []
        for batch in tr.cv_loader:
            noisy, clean, frames = tr.put_batch(
                batch.noisy, batch.clean, batch.frame_nums)
            rows.append([float(x) for x in eval_step(
                reg_vars, tr.state, noisy, clean, frames)])
        m = np.mean(np.asarray(rows), axis=0)
        rec = {"step": step, "variant": args.variant,
               "val_mse": round(float(m[0]), 6),
               "val_cos": round(float(m[1]), 4),
               "e_pred": round(float(m[2]), 7),
               "e_true": round(float(m[3]), 7)}
        print(json.dumps(rec), flush=True)
        return rec

    t0 = time.time()
    step = 0
    run_eval(step)
    while step < args.steps:
        for batch in tr.tr_loader:
            if step >= args.steps:
                break
            noisy, clean, frames = tr.put_batch(
                batch.noisy, batch.clean, batch.frame_nums)
            reg_vars, opt_state, loss = train_step(
                reg_vars, opt_state, tr.state, noisy, clean, frames)
            step += 1
            if step % 200 == 0:
                print(f"step {step}: loss {float(loss):.6f} "
                      f"[{time.time() - t0:.0f}s]", flush=True)
            if step % args.eval_every == 0:
                run_eval(step)
    final = run_eval(step)
    os.makedirs("docs", exist_ok=True)
    tag = args.variant.replace("+", "_")
    if args.doc != "demo":
        tag = f"{args.doc.removeprefix('demo_')}_{tag}"
    out = args.out or f"docs/probe_predictability_{tag}.json"
    with open(out, "w") as f:
        json.dump(final, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
