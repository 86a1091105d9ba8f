"""Round-4 train-step attribution: segment the backward (round-3
verdict weak #1 / next #2).

Round 3 measured that serving gains 2.55x from bf16 but the train step
only 1.32x, and stopped at the fwd/bwd split.  This harness segments
the train step into stages that nest the trainer's REAL building blocks
(`training/ddpm_trainer.py::_train_step_impl`, the hot loop analog of
reference `trainer/complex_ddpm_trainer.py:740-757`):

  stft            spec_features(noisy) + spec_features(clean)   (f32 always)
  dis_fwd         prior forward, train=True (BN stat update)
  dis_fwd_eval    prior forward, train=False (BN stat cost by difference)
  ddpm_fwd        denoiser forward, train=True (fixed x_t/cond/t inputs)
  dis_vag         value_and_grad of the dis loss alone
  ddpm_vag        value_and_grad of the ddpm loss alone
  vag             full value_and_grad of the joint loss (no optimizer)
  vag_opt         vag + both torch-Adam updates (no grad-norm logging)
  full_step       the trainer's own donated jit (adds group_grad_norms)

Derived: dis_bwd = dis_vag - dis_fwd, ddpm_bwd = ddpm_vag - ddpm_fwd,
opt = vag_opt - vag, gnorm = full_step - vag_opt.  Each segment is its
own jit timed by the slope method (chained calls ending in a scalar
readback; block_until_ready lies on this PJRT — CLAUDE.md timing rule).

Usage (queued behind the round-4 chip queue; smoke mode first):
  PDT_PROFILE_SMOKE=1 python scripts/profile_train_r4.py   # CPU validate
  python scripts/profile_train_r4.py                        # chip run
Writes docs/PERF_r4.json.
"""

import json
import os
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

CHUNK = 48000
BATCH = int(os.environ.get("PDT_PROF_BATCH", "6"))
N1, N2 = 1, 6
OUT = ("docs/PERF_r4.json" if BATCH == 6
       else f"docs/PERF_r4_b{BATCH}.json")
SMOKE = bool(os.environ.get("PDT_PROFILE_SMOKE"))
if SMOKE:
    CHUNK = 8000
    OUT = "/tmp/PERF_r4_smoke.json"


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import shutil
    import tempfile

    import jax.numpy as jnp

    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.diffusion import q_sample
    from prior_diffuse_tpu.training import ComplexDDPMTrainer
    from prior_diffuse_tpu.training.base import spec_features

    def slope(call, reps=3):
        """Median wall-seconds per op; `call(n)` runs an n-chain and ends
        in a scalar readback, returning elapsed seconds."""
        est = max((call(N2) - call(N1)) / (N2 - N1), 1e-5)
        n2 = N1 + max(N2 - N1, int(0.05 / est) + 1)
        for _ in range(4):
            vals = [(call(n2) - call(N1)) / (n2 - N1) for _ in range(reps)]
            med = statistics.median(vals)
            if med > 0:
                return med
            n2 = N1 + 2 * (n2 - N1)
        raise AssertionError(f"non-positive slope {med} at chain {n2}")

    def timed(fn, *args):
        """Slope-time a jitted fn whose output is an array or tuple."""
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(first))  # compile + settle

        def call(n):
            t0 = time.time()
            o = None
            for _ in range(n):
                o = fn(*args)
            f = o[0] if isinstance(o, tuple) else o
            float(jnp.sum(f))
            return time.time() - t0

        return slope(call)

    results = {"device": "?", "chunk": CHUNK, "batch": BATCH}
    tmpdir = tempfile.mkdtemp(prefix="pdt_prof4_")
    corpus = synthetic.write_corpus(
        f"{tmpdir}/data", n_train=BATCH, n_test=2,
        min_len=CHUNK, max_len=CHUNK + 1600, seed=0,
    )

    for dname in ("f32", "bf16"):
        exp = ExperimentConfig(
            train=TrainConfig(batch_size=BATCH, n_epochs=1,
                              loss="com_mse_loss", chunk_length=CHUNK,
                              compute_dtype="bfloat16" if dname == "bf16"
                              else "float32"),
            model=ModelConfig("DiffUNet"),
            optim=OptimConfig(lr=5e-4),
            optim_ddpm=OptimConfig(lr=2e-4),
            diffusion=DiffusionConfig(),
        )
        run = RunConfig(assets=f"{tmpdir}/assets_{dname}", doc="prof",
                        data_root=corpus, joint=True)
        tr = ComplexDDPMTrainer(run, exp)
        results["device"] = getattr(jax.devices()[0], "device_kind", "?")
        batch = next(iter(tr.tr_loader))
        noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                            batch.frame_nums)
        rng = jax.random.PRNGKey(0)
        seg = {}

        # ---- leaf stages ------------------------------------------------
        @jax.jit
        def stage_stft(noisy, clean):
            return spec_features(noisy, tr.cfg), spec_features(clean, tr.cfg)

        @jax.jit
        def stage_dis_fwd(dis_vars, feat):
            y, stats = tr._dis_apply(dis_vars, feat, train=True)
            return y, stats

        @jax.jit
        def stage_dis_fwd_eval(dis_vars, feat):
            y, _ = tr._dis_apply(dis_vars, feat, train=False)
            return y

        @jax.jit
        def stage_qsample(rng, label, x_init):
            return q_sample(rng, label / tr.c, x_init, tr.alpha_bar,
                            tr.num_steps, tr.mode, None,
                            t_grid=tr.t_grid, ab_grid=tr.ab_grid)

        @jax.jit
        def stage_ddpm_fwd(ddpm_vars, x_t, cond, t):
            y, stats = tr._ddpm_apply(ddpm_vars, x_t, cond, t, train=True)
            return y, stats

        # ---- per-net value_and_grad -------------------------------------
        @jax.jit
        def stage_dis_vag(state, feat, label, frames):
            def loss(p):
                dv = {"params": p, "batch_stats": state["dis"]["batch_stats"]}
                y, stats = tr._dis_apply(dv, feat, train=True)
                return tr.loss_fn(y.astype(jnp.float32), label, frames), stats

            (val, _), g = jax.value_and_grad(loss, has_aux=True)(
                state["dis"]["params"])
            return val, g

        @jax.jit
        def stage_ddpm_vag(state, x_t, cond, t, noise, frames):
            def loss(p):
                pv = {"params": p, "batch_stats": state["ddpm"]["batch_stats"]}
                y, stats = tr._ddpm_apply(pv, x_t, cond, t, train=True)
                return (tr.loss_fn(y.astype(jnp.float32), noise, frames),
                        stats)

            (val, _), g = jax.value_and_grad(loss, has_aux=True)(
                state["ddpm"]["params"])
            return val, g

        # ---- joint stages ------------------------------------------------
        def loss_of(params, state, feat, label, frames, rng):
            """Mirror of _train_step_impl's loss_of (joint, no sigma)."""
            dis_vars = {"params": params["dis"],
                        "batch_stats": state["dis"]["batch_stats"]}
            dis_out, dis_stats = tr._dis_apply(dis_vars, feat, train=True)
            dis_out = dis_out.astype(jnp.float32)
            loss_dis = tr.loss_fn(dis_out, label, frames)
            x_init = jax.lax.stop_gradient(dis_out) / tr.c
            x_t, noise, t = q_sample(
                rng, label / tr.c, x_init, tr.alpha_bar, tr.num_steps,
                tr.mode, None, t_grid=tr.t_grid, ab_grid=tr.ab_grid)
            ddpm_vars = {"params": params["ddpm"],
                         "batch_stats": state["ddpm"]["batch_stats"]}
            pred, ddpm_stats = tr._ddpm_apply(
                ddpm_vars, x_t, tr._cond(feat / tr.c, x_init), t, train=True)
            loss_ddpm = tr.loss_fn(pred.astype(jnp.float32), noise, frames)
            return (tr.cfg.lam * loss_ddpm + loss_dis,
                    (loss_dis, loss_ddpm, dis_stats, ddpm_stats))

        @jax.jit
        def stage_fwd(state, noisy, clean, frames, rng):
            feat = spec_features(noisy, tr.cfg)
            label = spec_features(clean, tr.cfg)
            params = {"dis": state["dis"]["params"],
                      "ddpm": state["ddpm"]["params"]}
            total, _ = loss_of(params, state, feat, label, frames, rng)
            return total

        @jax.jit
        def stage_vag(state, noisy, clean, frames, rng):
            feat = spec_features(noisy, tr.cfg)
            label = spec_features(clean, tr.cfg)
            params = {"dis": state["dis"]["params"],
                      "ddpm": state["ddpm"]["params"]}
            (total, _), grads = jax.value_and_grad(loss_of, has_aux=True)(
                params, state, feat, label, frames, rng)
            return total, grads

        @jax.jit
        def stage_vag_opt(state, noisy, clean, frames, rng):
            import optax

            feat = spec_features(noisy, tr.cfg)
            label = spec_features(clean, tr.cfg)
            params = {"dis": state["dis"]["params"],
                      "ddpm": state["ddpm"]["params"]}
            (total, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
                params, state, feat, label, frames, rng)
            up_ddpm, opt_ddpm = tr.tx_ddpm.update(
                grads["ddpm"], state["opt_ddpm"], params["ddpm"])
            new_ddpm = optax.apply_updates(params["ddpm"], up_ddpm)
            up_dis, opt_dis = tr.tx_dis.update(
                grads["dis"], state["opt_dis"], params["dis"])
            new_dis = optax.apply_updates(params["dis"], up_dis)
            return total, (new_dis, new_ddpm, opt_dis, opt_ddpm)

        # ---- inputs for leaf stages (device-resident, fixed) -------------
        feat, label = stage_stft(noisy, clean)
        x_init_f32 = stage_dis_fwd_eval(tr.state["dis"], feat) / tr.c
        x_t, noise, t = stage_qsample(rng, label, x_init_f32)
        cond = tr._cond(feat / tr.c, x_init_f32)

        seg["stft_ms"] = timed(stage_stft, noisy, clean) * 1e3
        seg["dis_fwd_ms"] = timed(stage_dis_fwd, tr.state["dis"], feat) * 1e3
        seg["dis_fwd_eval_ms"] = timed(stage_dis_fwd_eval, tr.state["dis"],
                                       feat) * 1e3
        seg["qsample_ms"] = timed(stage_qsample, rng, label, x_init_f32) * 1e3
        seg["ddpm_fwd_ms"] = timed(stage_ddpm_fwd, tr.state["ddpm"], x_t,
                                   cond, t) * 1e3
        if dname == "bf16":
            # separate the "cast f32 params in-graph" cost from the
            # tiling story: serve pre-casts params once, train casts
            # every step
            ddpm_cast = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32
                else p, tr.state["ddpm"])
            seg["ddpm_fwd_precast_ms"] = timed(
                stage_ddpm_fwd, ddpm_cast, x_t, cond, t) * 1e3
        seg["dis_vag_ms"] = timed(stage_dis_vag, tr.state, feat, label,
                                  frames) * 1e3
        seg["ddpm_vag_ms"] = timed(stage_ddpm_vag, tr.state, x_t, cond, t,
                                   noise, frames) * 1e3
        seg["fwd_ms"] = timed(stage_fwd, tr.state, noisy, clean, frames,
                              rng) * 1e3
        seg["vag_ms"] = timed(stage_vag, tr.state, noisy, clean, frames,
                              rng) * 1e3
        seg["vag_opt_ms"] = timed(stage_vag_opt, tr.state, noisy, clean,
                                  frames, rng) * 1e3

        # full donated trainer step: thread the donated state through the
        # chain (reusing a donated tree crashes on the chip)
        state = tr.state

        def full_call(n):
            nonlocal state
            t0 = time.time()
            total = None
            for i in range(n):
                state, total, *_ = tr._train_step(
                    state, noisy, clean, frames, jax.random.fold_in(rng, i))
            float(total)
            return time.time() - t0

        state, t0_, *_ = tr._train_step(state, noisy, clean, frames, rng)
        float(t0_)
        seg["full_step_ms"] = slope(full_call) * 1e3

        # derived segments
        seg["dis_bwd_ms"] = seg["dis_vag_ms"] - seg["dis_fwd_ms"]
        seg["ddpm_bwd_ms"] = seg["ddpm_vag_ms"] - seg["ddpm_fwd_ms"]
        seg["bn_stats_ms"] = seg["dis_fwd_ms"] - seg["dis_fwd_eval_ms"]
        seg["opt_ms"] = seg["vag_opt_ms"] - seg["vag_ms"]
        seg["gnorm_donate_ms"] = seg["full_step_ms"] - seg["vag_opt_ms"]
        seg["bwd_ms"] = seg["vag_ms"] - seg["fwd_ms"]
        seg["parts_vs_vag_ms"] = (seg["stft_ms"] + seg["qsample_ms"]
                                  + seg["dis_vag_ms"] + seg["ddpm_vag_ms"]
                                  - seg["vag_ms"])
        results[f"train_seg_{dname}"] = {k: round(v, 2)
                                         for k, v in seg.items()}
        print(json.dumps({f"train_seg_{dname}":
                          results[f"train_seg_{dname}"]}), flush=True)
        del tr
    shutil.rmtree(tmpdir, ignore_errors=True)

    a, b = results["train_seg_f32"], results["train_seg_bf16"]
    results["bf16_speedup"] = {
        k[:-3]: round(a[k] / b[k], 2)
        for k in a
        if k.endswith("_ms") and b.get(k) and b[k] > 0.05
    }
    print(json.dumps({"bf16_speedup": results["bf16_speedup"]}), flush=True)

    os.makedirs("docs", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
