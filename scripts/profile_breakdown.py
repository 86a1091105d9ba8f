"""Op-level time attribution for the enhance and train jits (round-2
verdict item 2: replace the asserted "latency-bound" story with
measurements).

The axon PJRT exposes no device-side trace, so attribution is by
*ablation*: each pipeline stage is timed as its own chained jit with the
same slope method bench.py uses (two chain lengths, scalar readback,
median slope).  Stages nest, so (full - sum of parts) exposes overhead
XLA fusion removes when the stages are compiled together.

Also sweeps the enhance batch size (1..32) to locate and bound the
batch-16 cliff from BENCH_r2_notes.md, and tries a jax.profiler trace
(kept if the backend produces one).

Usage:
  nohup python scripts/profile_breakdown.py > /tmp/profile.log 2>&1 &
  # writes docs/PERF_r3.json; summarize into docs/PERF_r3.md
"""

import json
import os
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

CHUNK = 48000
N1, N2 = 1, 6
BATCHES = (1, 2, 4, 8, 12, 16, 24, 32)
OUT = "docs/PERF_r3.json"

# smoke mode: tiny shapes on CPU to validate the harness end-to-end
# before spending hours of chip time on it (the real run is queued
# behind the TPU tunnel): PDT_PROFILE_SMOKE=1 python scripts/profile_breakdown.py
if os.environ.get("PDT_PROFILE_SMOKE"):
    CHUNK = 8000
    BATCHES = (1, 2)
    OUT = "/tmp/PERF_smoke.json"

# which measurement groups to run, e.g. PDT_PROFILE_SECTIONS=train to
# (re-)measure only the train-step attribution
SECTIONS = set(
    (os.environ.get("PDT_PROFILE_SECTIONS") or "enhance,train,trace")
    .split(",")
)


def main():
    import jax

    if os.environ.get("PDT_PROFILE_SMOKE"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from prior_diffuse_tpu.config import DiffusionConfig, TrainConfig
    from prior_diffuse_tpu.diffusion import inference_schedule, reverse_sample
    from prior_diffuse_tpu.models import DiffUNet, DiffUNet1
    from prior_diffuse_tpu.signal.compress import compress_spec, decompress_spec
    from prior_diffuse_tpu.signal.stft import istft, stft

    cfg = TrainConfig()
    diff = DiffusionConfig()
    sched = inference_schedule(diff, fast_sampling=True)

    dis = DiffUNet()
    ddpm = DiffUNet1(num_steps=diff.num_steps)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t_frames = CHUNK // cfg.win_shift + 1
    dummy = jnp.zeros((1, t_frames, cfg.freq_bins, 2))
    dis_vars = dis.init(k1, dummy)
    ddpm_vars = ddpm.init(k2, dummy, dummy, jnp.zeros((1,)))

    def slope(fn, *args, reps=3):
        """Median wall seconds per op via chained runs + scalar readback.

        Chain lengths are sized adaptively so the measured delta is
        >=50 ms of device work — fixed short chains put sub-ms stages
        inside host-timing noise (round-2 verdict item 3: a shipped
        negative timing).  Non-positive slopes are re-measured with a
        doubled chain; the final value is asserted positive.
        """
        out = fn(*args)
        float(jnp.sum(out if not isinstance(out, tuple) else out[0]))

        def chain(n):
            t0 = time.time()
            o = None
            for i in range(n):
                o = fn(*args)
            float(jnp.sum(o if not isinstance(o, tuple) else o[0]))
            return time.time() - t0

        # pilot estimate -> chain length giving a >=50 ms delta
        est = max((chain(N2) - chain(N1)) / (N2 - N1), 1e-5)
        n2 = N1 + max(N2 - N1, int(0.05 / est) + 1)
        for _ in range(4):
            vals = [(chain(n2) - chain(N1)) / (n2 - N1) for _ in range(reps)]
            med = statistics.median(vals)
            if med > 0:
                return med
            n2 = N1 + 2 * (n2 - N1)  # noise won: double the work delta
        raise AssertionError(f"non-positive slope {med} at chain {n2}")

    results = {"device": getattr(jax.devices()[0], "device_kind", "?")}

    for dname, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        if dt != jnp.float32:
            cast = lambda tree: jax.tree.map(lambda p: p.astype(dt), tree)
            dv, pv = cast(dis_vars), cast(ddpm_vars)
        else:
            dv, pv = dis_vars, ddpm_vars

        batch = 8
        wav = jax.random.normal(k3, (batch, CHUNK)) * 0.1

        @jax.jit
        def stage_stft(w):
            return compress_spec(stft(w), cfg.feat_type)

        @jax.jit
        def stage_prior(dv, feat):
            return dis.apply(dv, feat.astype(dt), mutable=False)

        @jax.jit
        def stage_one_ddpm(pv, x, c, t):
            return ddpm.apply(pv, x.astype(dt), c.astype(dt),
                              t.astype(dt), mutable=False)

        @jax.jit
        def stage_sampler(pv, x_init, rng):
            def model_fn(x, t):
                return ddpm.apply(pv, x.astype(dt), x_init, t.astype(dt),
                                  mutable=False).astype(dt)

            return reverse_sample(model_fn, rng, x_init, x_init.shape,
                                  sched, "pirorgrad", dtype=dt)

        @jax.jit
        def stage_istft(spec):
            return istft(decompress_spec(spec.astype(jnp.float32)
                                         * diff.scale_c, cfg.feat_type),
                         length=CHUNK)

        @jax.jit
        def full(dv, pv, w, rng):
            feat = compress_spec(stft(w), cfg.feat_type)
            x_init = (dis.apply(dv, feat.astype(dt), mutable=False)
                      .astype(dt) / jnp.asarray(diff.scale_c, dt))

            def model_fn(x, t):
                return ddpm.apply(pv, x.astype(dt), x_init, t.astype(dt),
                                  mutable=False).astype(dt)

            audio = reverse_sample(model_fn, rng, x_init, x_init.shape,
                                   sched, "pirorgrad", dtype=dt)
            spec = decompress_spec(audio.astype(jnp.float32) * diff.scale_c,
                                   cfg.feat_type)
            return istft(spec, length=w.shape[-1])

        feat = stage_stft(wav)
        x_init = (stage_prior(dv, feat).astype(dt)
                  / jnp.asarray(diff.scale_c, dt))
        tvec = jnp.zeros((batch,))
        r = {}
        r["full_ms"] = slope(full, dv, pv, wav, k4) * 1e3
        r["stft_compress_ms"] = slope(stage_stft, wav) * 1e3
        r["prior_ms"] = slope(stage_prior, dv, feat) * 1e3
        r["ddpm_single_call_ms"] = slope(stage_one_ddpm, pv, x_init,
                                         x_init, tvec) * 1e3
        r["sampler_6step_ms"] = slope(stage_sampler, pv, x_init, k4) * 1e3
        r["istft_ms"] = slope(stage_istft, x_init) * 1e3
        r["parts_sum_ms"] = (r["stft_compress_ms"] + r["prior_ms"]
                             + r["sampler_6step_ms"] + r["istft_ms"])
        r["scan_overhead_ms"] = (r["sampler_6step_ms"]
                                 - 6 * r["ddpm_single_call_ms"])
        results[f"enhance_{dname}"] = {k: round(v, 2) for k, v in r.items()}
        print(json.dumps({f"enhance_{dname}": results[f"enhance_{dname}"]}),
              flush=True)

    # batch-size sweep (bf16): locate the cliff
    dt = jnp.bfloat16
    cast = lambda tree: jax.tree.map(lambda p: p.astype(dt), tree)
    dv, pv = cast(dis_vars), cast(ddpm_vars)

    @jax.jit
    def full_b(dv, pv, w, rng):
        feat = compress_spec(stft(w), cfg.feat_type)
        x_init = (dis.apply(dv, feat.astype(dt), mutable=False)
                  .astype(dt) / jnp.asarray(diff.scale_c, dt))

        def model_fn(x, t):
            return ddpm.apply(pv, x.astype(dt), x_init, t.astype(dt),
                              mutable=False).astype(dt)

        audio = reverse_sample(model_fn, rng, x_init, x_init.shape,
                               sched, "pirorgrad", dtype=dt)
        spec = decompress_spec(audio.astype(jnp.float32) * diff.scale_c,
                               cfg.feat_type)
        return istft(spec, length=w.shape[-1])

    sweep = {}
    for b in BATCHES:
        w = jax.random.normal(k3, (b, CHUNK)) * 0.1
        ms = slope(full_b, dv, pv, w, k4) * 1e3
        sweep[b] = {"ms": round(ms, 2), "ms_per_utt": round(ms / b, 2)}
        print(json.dumps({"batch": b, **sweep[b]}), flush=True)
    results["batch_sweep_bf16"] = sweep

    # optimization candidate: fully unrolled 6-step sampler vs scan
    @jax.jit
    def full_unrolled(dv, pv, w, rng):
        feat = compress_spec(stft(w), cfg.feat_type)
        x_init = (dis.apply(dv, feat.astype(dt), mutable=False)
                  .astype(dt) / jnp.asarray(diff.scale_c, dt))

        def model_fn(x, t):
            return ddpm.apply(pv, x.astype(dt), x_init, t.astype(dt),
                              mutable=False).astype(dt)

        audio = reverse_sample(model_fn, rng, x_init, x_init.shape,
                               sched, "pirorgrad", dtype=dt, unroll=6)
        spec = decompress_spec(audio.astype(jnp.float32) * diff.scale_c,
                               cfg.feat_type)
        return istft(spec, length=w.shape[-1])

    w = jax.random.normal(k3, (8, CHUNK)) * 0.1
    try:
        results["enhance_bf16_unroll6_ms"] = round(
            slope(full_unrolled, dv, pv, w, k4) * 1e3, 2
        )
    except Exception as e:  # a failed candidate is a finding, not a crash
        results["enhance_bf16_unroll6_ms"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(
        {"enhance_bf16_unroll6_ms": results["enhance_bf16_unroll6_ms"]}),
        flush=True)

    # optimization candidate: pad the odd TIME extent (T=301 -> 304)
    # to a vector-tile-friendly multiple of 8 around the model calls,
    # crop after.  F (161) cannot be padded: the reference UNet's
    # encoder/decoder skip shapes are parity-locked to the exact
    # frequency extent (measured — an F-pad fails shape checking), so
    # XLA's internal padding is the only option on that axis.
    @jax.jit
    def full_padded(dv, pv, w, rng):
        feat = compress_spec(stft(w), cfg.feat_type)
        t0, f0 = feat.shape[1], feat.shape[2]
        tp = -(-t0 // 8) * 8
        featp = jnp.pad(feat, ((0, 0), (0, tp - t0), (0, 0), (0, 0)))
        x_init = (dis.apply(dv, featp.astype(dt), mutable=False)
                  .astype(dt) / jnp.asarray(diff.scale_c, dt))

        def model_fn(x, t):
            return ddpm.apply(pv, x.astype(dt), x_init, t.astype(dt),
                              mutable=False).astype(dt)

        audio = reverse_sample(model_fn, rng, x_init, x_init.shape,
                               sched, "pirorgrad", dtype=dt)
        audio = audio[:, :t0, :f0, :]
        spec = decompress_spec(audio.astype(jnp.float32) * diff.scale_c,
                               cfg.feat_type)
        return istft(spec, length=w.shape[-1])

    try:
        results["enhance_bf16_padded_ms"] = round(
            slope(full_padded, dv, pv, w, k4) * 1e3, 2
        )
    except Exception as e:
        # Known to fail for pad targets that break the reference UNet's
        # parity-locked encoder/decoder skip shapes — recording the
        # incompatibility is itself the measurement.
        results["enhance_bf16_padded_ms"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(
        {"enhance_bf16_padded_ms": results["enhance_bf16_padded_ms"]}),
        flush=True)

    # posterior-mean sampling extensions: what do they cost at serving?
    # (n_avg vmaps N whole chains; zero_init replaces the initial draw)
    def full_pm(n_avg, zero_init):
        @jax.jit
        def impl(dv, pv, w, rng):
            feat = compress_spec(stft(w), cfg.feat_type)
            x_init = (dis.apply(dv, feat.astype(dt), mutable=False)
                      .astype(dt) / jnp.asarray(diff.scale_c, dt))

            def model_fn(x, t):
                return ddpm.apply(pv, x.astype(dt), x_init, t.astype(dt),
                                  mutable=False).astype(dt)

            audio = reverse_sample(model_fn, rng, x_init, x_init.shape,
                                   sched, "pirorgrad", dtype=dt,
                                   n_avg=n_avg, zero_init=zero_init)
            spec = decompress_spec(audio.astype(jnp.float32) * diff.scale_c,
                                   cfg.feat_type)
            return istft(spec, length=w.shape[-1])

        return impl

    for key_name, kwargs in [("enhance_bf16_navg8_ms", dict(n_avg=8, zero_init=False)),
                             ("enhance_bf16_zeroinit_ms", dict(n_avg=1, zero_init=True))]:
        try:
            results[key_name] = round(
                slope(full_pm(**kwargs), dv, pv, w, k4) * 1e3, 2)
        except Exception as e:
            results[key_name] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps({key_name: results[key_name]}), flush=True)

    if "train" in SECTIONS:
        train_attribution(jax, jnp, results)

    # attempt a profiler trace (host-side at minimum)
    trace_dir = "/tmp/jax_trace_enhance"
    try:
        with jax.profiler.trace(trace_dir):
            w = jax.random.normal(k3, (8, CHUNK)) * 0.1
            for i in range(3):
                out = full_b(dv, pv, w, jax.random.fold_in(k4, i))
            float(jnp.sum(out))
        n_files = sum(len(fs) for _, _, fs in os.walk(trace_dir))
        results["profiler_trace"] = {"dir": trace_dir, "files": n_files}
    except Exception as e:
        results["profiler_trace"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    _write(results)


def _write(results):
    os.makedirs("docs", exist_ok=True)
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}", flush=True)


def train_attribution(jax, jnp, results):
    # ---- train-step attribution (verdict item 2 asks for the train jit
    # too): forward loss alone vs the full value_and_grad + adam step,
    # in both precisions.  The forward jit mirrors the trainer's
    # loss_of closure (training/ddpm_trainer.py:227-256) using the same
    # building blocks, so fwd/bwd attribution needs no trainer changes.
    import shutil
    import tempfile

    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.diffusion import q_sample
    from prior_diffuse_tpu.training import ComplexDDPMTrainer
    from prior_diffuse_tpu.training.base import spec_features

    tmpdir = tempfile.mkdtemp(prefix="pdt_prof_")
    train_batch = 6
    corpus = synthetic.write_corpus(
        f"{tmpdir}/data", n_train=train_batch, n_test=2,
        min_len=CHUNK, max_len=CHUNK + 1600, seed=0,
    )
    for dname in ("f32", "bf16"):
        exp = ExperimentConfig(
            train=TrainConfig(batch_size=train_batch, n_epochs=1,
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
        batch = next(iter(tr.tr_loader))
        noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                            batch.frame_nums)
        rng = jax.random.PRNGKey(0)

        @jax.jit
        def train_fwd(state, noisy, clean, frame_nums, rng):
            feat = spec_features(noisy, tr.cfg)
            label = spec_features(clean, tr.cfg)
            dis_out, _ = tr._dis_apply(state["dis"], feat, train=True)
            dis_out = dis_out.astype(jnp.float32)
            loss_dis = tr.loss_fn(dis_out, label, frame_nums)
            x_init = dis_out / tr.c
            x_t, noise, t = q_sample(
                rng, label / tr.c, x_init, tr.alpha_bar, tr.num_steps,
                tr.mode, None, t_grid=tr.t_grid, ab_grid=tr.ab_grid,
            )
            eps, _ = tr._ddpm_apply(
                state["ddpm"], x_t, tr._cond(feat / tr.c, x_init), t,
                train=True,
            )
            return (tr.cfg.lam
                    * tr.loss_fn(eps.astype(jnp.float32), noise, frame_nums)
                    + loss_dis)

        tsec = {}

        def fwd_chain(n):
            t0 = time.time()
            o = None
            for i in range(n):
                o = train_fwd(tr.state, noisy, clean, frames,
                              jax.random.fold_in(rng, i))
            float(o)
            return time.time() - t0

        float(train_fwd(tr.state, noisy, clean, frames, rng))  # compile
        est = max((fwd_chain(N2) - fwd_chain(N1)) / (N2 - N1), 1e-5)
        n2 = N1 + max(N2 - N1, int(0.05 / est) + 1)
        tsec["fwd_ms"] = round(statistics.median(
            [(fwd_chain(n2) - fwd_chain(N1)) / (n2 - N1) for _ in range(3)]
        ) * 1e3, 2)

        # _train_step donates its state argument (ddpm_trainer.py:162),
        # so the tree must be THREADED through every call — reusing a
        # donated tree works on CPU (donation ignored) but crashes on
        # the chip.  Same pattern as bench.py::bench_train_step.
        state = tr.state

        def full_chain(n):
            nonlocal state
            t0 = time.time()
            total = None
            for i in range(n):
                state, total, *_ = tr._train_step(
                    state, noisy, clean, frames, jax.random.fold_in(rng, i)
                )
            float(total)  # state-feedback chain ends in a scalar readback
            return time.time() - t0

        state, t0_, *_ = tr._train_step(state, noisy, clean, frames, rng)
        float(t0_)  # compile
        tsec["full_step_ms"] = round(statistics.median(
            [(full_chain(N2) - full_chain(N1)) / (N2 - N1)
             for _ in range(3)]
        ) * 1e3, 2)
        tsec["bwd_opt_ms"] = round(tsec["full_step_ms"] - tsec["fwd_ms"], 2)
        if tsec["fwd_ms"] > 0:
            tsec["bwd_over_fwd"] = round(
                tsec["bwd_opt_ms"] / tsec["fwd_ms"], 2)
        results[f"train_{dname}"] = tsec
        print(json.dumps({f"train_{dname}": tsec}), flush=True)
        del tr
    shutil.rmtree(tmpdir, ignore_errors=True)


def train_only():
    """Entry for PDT_PROFILE_SECTIONS=train: validate/measure just the
    train-step attribution without re-running the enhance sections."""
    import jax

    if os.environ.get("PDT_PROFILE_SMOKE"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    results = {"device": getattr(jax.devices()[0], "device_kind", "?")}
    train_attribution(jax, jnp, results)
    # separate artifact so a train-only rerun never clobbers the full
    # enhance+train attribution in OUT
    global OUT
    base, ext = os.path.splitext(OUT)
    OUT = f"{base}_train{ext}"
    _write(results)


if __name__ == "__main__":
    if SECTIONS == {"train"}:
        train_only()
    else:
        main()
