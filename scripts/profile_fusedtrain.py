"""Chip measurement for the train-mode dual block-diagonal decoder
(PDT_FUSED_TRAIN=dual, models/fused_forward.py::dual_train_forward).

The serving fusion measured 1.53x on the decoder segment
(docs/PERF_fwdsplit_r4.json) and was adopted as the bf16 serving
default; this harness answers whether the same reformulation wins the
*training* hot loop (reference ``trainer/complex_ddpm_trainer.py:740-757``),
where the decoders also dominate the forward and the backward is ~4x
the forward.  Measured at the recommended TPU config (batch 8, bf16,
chunk 48k) in both stages of the two-stage recipe:

  joint     — stage A: eps-joint, sigma-conditioned (fs8A config)
  ddpmonly  — stage B: frozen prior, predict=x0, x0_leak_drop=1 (fs8B)

Each variant times the trainer's REAL donated train step (state threaded
through the chain — reusing a donated tree crashes on the chip) by the
slope method (CLAUDE.md timing rule), plus ddpm fwd/value_and_grad
segments for attribution of where the win (or loss) comes from.

Usage:
  PDT_PROFILE_SMOKE=1 python scripts/profile_fusedtrain.py  # CPU validate
  python scripts/profile_fusedtrain.py                      # chip run
  PDT_FUSEDTRAIN_F32=1 ... to add the f32 rows.
Writes docs/PERF_fusedtrain_r4.json.
"""

import json
import os
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

CHUNK = 48000
BATCH = int(os.environ.get("PDT_PROF_BATCH", "8"))
N1, N2 = 1, 6
OUT = "docs/PERF_fusedtrain_r4.json"
SMOKE = bool(os.environ.get("PDT_PROFILE_SMOKE"))
WITH_F32 = bool(os.environ.get("PDT_FUSEDTRAIN_F32"))
if SMOKE:
    CHUNK = 8000
    BATCH = 2
    OUT = "/tmp/PERF_fusedtrain_smoke.json"


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
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
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(first))

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
    tmpdir = tempfile.mkdtemp(prefix="pdt_fusedtrain_")
    corpus = synthetic.write_corpus(
        f"{tmpdir}/data", n_train=BATCH, n_test=2,
        min_len=CHUNK, max_len=CHUNK + 1600, seed=0,
    )

    dtypes = ("bf16", "f32") if WITH_F32 else ("bf16",)
    for dname in dtypes:
        for stage, joint in (("joint", True), ("ddpmonly", False)):
            diff = (DiffusionConfig() if joint
                    else DiffusionConfig(predict="x0", x0_leak_drop=1.0))
            exp = ExperimentConfig(
                train=TrainConfig(batch_size=BATCH, n_epochs=1,
                                  loss="com_mse_loss", chunk_length=CHUNK,
                                  compute_dtype="bfloat16"
                                  if dname == "bf16" else "float32"),
                model=ModelConfig("DiffUNet"),
                optim=OptimConfig(lr=5e-4),
                optim_ddpm=OptimConfig(lr=2e-4),
                diffusion=diff,
            )
            row = {}
            for path in ("flax", "dual"):
                if path == "dual":
                    os.environ["PDT_FUSED_TRAIN"] = "dual"
                else:
                    os.environ.pop("PDT_FUSED_TRAIN", None)
                run = RunConfig(
                    assets=f"{tmpdir}/assets_{dname}_{stage}_{path}",
                    doc="ft", data_root=corpus, joint=joint, sigma=True)
                tr = ComplexDDPMTrainer(run, exp)
                results["device"] = getattr(jax.devices()[0],
                                            "device_kind", "?")
                batch = next(iter(tr.tr_loader))
                noisy, clean, frames = tr.put_batch(
                    batch.noisy, batch.clean, batch.frame_nums)
                rng = jax.random.PRNGKey(0)

                # segment attribution (joint config only — same nets)
                if stage == "joint":
                    @jax.jit
                    def seg_ddpm_fwd(ddpm_vars, x_t, cond, t):
                        y, stats = tr._ddpm_apply(ddpm_vars, x_t, cond, t,
                                                  train=True)
                        return y

                    @jax.jit
                    def seg_ddpm_vag(state, x_t, cond, t, noise, frames):
                        def loss(p):
                            pv = {"params": p,
                                  "batch_stats": state["ddpm"]["batch_stats"]}
                            y, stats = tr._ddpm_apply(pv, x_t, cond, t,
                                                      train=True)
                            return (tr.loss_fn(y.astype(jnp.float32), noise,
                                               frames), stats)

                        (val, _), g = jax.value_and_grad(
                            loss, has_aux=True)(state["ddpm"]["params"])
                        return val, g

                    @jax.jit
                    def seg_dis_fwd(dis_vars, feat):
                        y, stats = tr._dis_apply(dis_vars, feat, train=True)
                        return y

                    @jax.jit
                    def prep(noisy, clean, rng):
                        feat = spec_features(noisy, tr.cfg)
                        label = spec_features(clean, tr.cfg)
                        x_init = feat / tr.c  # placeholder conditioning
                        x_t, noise, t = q_sample(
                            rng, label / tr.c, x_init, tr.alpha_bar,
                            tr.num_steps, tr.mode, None,
                            t_grid=tr.t_grid, ab_grid=tr.ab_grid)
                        return feat, label, x_init, x_t, noise, t

                    feat, label, x_init, x_t, noise, t = prep(noisy, clean,
                                                              rng)
                    cond = tr._cond(feat / tr.c, x_init)
                    row[f"ddpm_fwd_{path}_ms"] = timed(
                        seg_ddpm_fwd, tr.state["ddpm"], x_t, cond, t) * 1e3
                    row[f"ddpm_vag_{path}_ms"] = timed(
                        seg_ddpm_vag, tr.state, x_t, cond, t, noise,
                        frames) * 1e3
                    row[f"dis_fwd_{path}_ms"] = timed(
                        seg_dis_fwd, tr.state["dis"], feat) * 1e3

                # the trainer's real donated step, state threaded
                state = tr.state

                def full_call(n):
                    nonlocal state
                    t0 = time.time()
                    total = None
                    for i in range(n):
                        state, total, *_ = tr._train_step(
                            state, noisy, clean, frames,
                            jax.random.fold_in(rng, i))
                    float(total)
                    return time.time() - t0

                state, t0_, *_ = tr._train_step(state, noisy, clean, frames,
                                                rng)
                float(t0_)
                row[f"step_{path}_ms"] = slope(full_call) * 1e3
                del tr, state

            row["step_speedup"] = row["step_flax_ms"] / row["step_dual_ms"]
            if stage == "joint":
                row["ddpm_fwd_speedup"] = (row["ddpm_fwd_flax_ms"]
                                           / row["ddpm_fwd_dual_ms"])
                row["ddpm_vag_speedup"] = (row["ddpm_vag_flax_ms"]
                                           / row["ddpm_vag_dual_ms"])
            results[f"{stage}_{dname}"] = {k: round(v, 3)
                                           for k, v in row.items()}
            print(json.dumps({f"{stage}_{dname}":
                              results[f"{stage}_{dname}"]}), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
