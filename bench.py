"""Benchmark: end-to-end Prior-DiffuSE enhancement RTF on one chip.

Measures the flagship pipeline — waveform -> STFT -> DiffUNet prior ->
6-step DiffUNet1 reverse scan -> ISTFT -> waveform — as one jit on a
batch of 3-second utterances, and prints ONE JSON line.

Measurement methodology (important on this environment): the axon PJRT
``block_until_ready`` returns before execution completes, so naive
block-based loops time only dispatch.  We therefore time two chained
runs of different lengths ending in a *scalar readback* (which provably
forces completion) and take the slope:

    step_time = (t(N2) - t(N1)) / (N2 - N1)

Baseline: the PyTorch reference's equivalent inference loop (DiffUNet +
6x DiffUNet1, batch 1, fast schedule, trainer/complex_ddpm_trainer.py:
903-1018) measured on this host's CPU (single core, torch 2.13):
2.885 s per 3 s utterance => RTF 1.04.  The reference publishes no
hardware throughput numbers (BASELINE.md), so that measured value is
the recorded comparison point.
"""

import json
import time

REFERENCE_RTF = 1.04  # torch CPU measurement, see module docstring

BATCH = 8
SECONDS = 3.0
CHUNK = 48000
N1, N2 = 1, 6


def main():
    import jax
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

    @jax.jit
    def enhance(dis_vars, ddpm_vars, wav, rng):
        feat = compress_spec(stft(wav), cfg.feat_type)
        x_init = dis.apply(dis_vars, feat, mutable=False) / diff.scale_c

        def model_fn(x, t):
            return ddpm.apply(ddpm_vars, x, x_init, t, mutable=False)

        audio = reverse_sample(
            model_fn, rng, x_init, x_init.shape, sched, "pirorgrad"
        )
        spec = decompress_spec(audio * diff.scale_c, cfg.feat_type)
        return istft(spec, length=wav.shape[-1])

    wav = jax.random.normal(k3, (BATCH, CHUNK)) * 0.1
    float(jnp.sum(enhance(dis_vars, ddpm_vars, wav, k4)))  # compile + warmup

    def chained(n):
        t0 = time.time()
        w = wav
        for i in range(n):
            w = enhance(dis_vars, ddpm_vars, w, jax.random.fold_in(k4, i))
        float(jnp.sum(w))  # scalar readback forces true completion
        return time.time() - t0

    import statistics

    steps = []
    for _ in range(3):
        t1 = chained(N1)
        t2 = chained(N2)
        steps.append((t2 - t1) / (N2 - N1))
    wall = statistics.median(steps)

    audio_seconds = BATCH * SECONDS
    rtf = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "enhance_rtf_3s_batch8",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / REFERENCE_RTF, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
