"""Chip A/B for the roofline-driven serving experiment (round 5).

docs/PERF_r5_notes.md: the dual-decoder serving forward is HBM-bound
at 2.45x its fused ceiling; the candidate addressable traffic is the
[z | skip] concat materialization feeding each stage's conv1.  This
measures, on the real chip with bench.py's slope methodology:

1. full enhance batch (8 x 3 s, bf16): fused mode ``dual`` (current
   default) vs ``dual2`` (concat-free split matmuls, MAC-identical),
2. the isolated dual-decoder segment for both formulations
   (in-jit fori_loop iteration slope — sub-ms ops are dispatch noise
   when host-chained, CLAUDE.md round-2).

Output: one JSON line + docs/PERF_dualv2_r5.json.  Adoption rule: flip
the serving default to dual2 only on a reproduced >=5 % full-batch win
(the Pallas-STFT / dual-decoder discipline).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

from prior_diffuse_tpu.config import DiffusionConfig, TrainConfig
from prior_diffuse_tpu.diffusion import inference_schedule, reverse_sample
from prior_diffuse_tpu.models import DiffUNet, DiffUNet1
from prior_diffuse_tpu.models.fused_forward import (
    dual_decoder_forward,
    fused_unet_forward,
    pack_unet,
)
from prior_diffuse_tpu.signal.compress import compress_spec, decompress_spec
from prior_diffuse_tpu.signal.stft import istft, stft

BATCH, CHUNK = 8, 48000
DTYPE = jnp.bfloat16
N1, N2 = 1, 6


def _slope(run_chain, reps=3):
    vals = []
    for _ in range(reps):
        t1 = run_chain(N1)
        t2 = run_chain(N2)
        vals.append((t2 - t1) / (N2 - N1))
    return statistics.median(vals)


def build_vars():
    cfg = TrainConfig()
    diff = DiffusionConfig()
    dis, ddpm = DiffUNet(), DiffUNet1(num_steps=diff.num_steps)
    key = jax.random.PRNGKey(0)
    t_frames = CHUNK // cfg.win_shift + 1
    dummy = jnp.zeros((1, t_frames, cfg.freq_bins, 2))
    cast = lambda t: jax.tree.map(lambda p: p.astype(DTYPE), t)
    dis_vars = cast(jax.jit(dis.init)(key, dummy))
    ddpm_vars = cast(jax.jit(
        lambda k, a, b, t: ddpm.init(k, a, b, t))(
        key, dummy, dummy, jnp.zeros((1,))))
    packed = {"ddpm": jax.jit(pack_unet)(ddpm_vars),
              "dis": jax.jit(pack_unet)(dis_vars)}
    return cfg, diff, packed, t_frames


def bench_full(cfg, diff, packed, split):
    sched = inference_schedule(diff, fast_sampling=True)

    @jax.jit
    def enhance(packed, wav, rng):
        feat = compress_spec(stft(wav), cfg.feat_type)
        x_init = fused_unet_forward(
            packed["dis"], feat.astype(DTYPE), dtype=DTYPE,
            use_pallas=False, dual_decoder=True, dual_split=split)
        x_init = x_init.astype(DTYPE) / jnp.asarray(diff.scale_c, DTYPE)

        def model_fn(x, t):
            return fused_unet_forward(
                packed["ddpm"], x.astype(DTYPE), x_init, t.astype(DTYPE),
                num_steps=diff.num_steps, dtype=DTYPE, use_pallas=False,
                dual_decoder=True, dual_split=split).astype(DTYPE)

        audio = reverse_sample(model_fn, rng, x_init, x_init.shape,
                               sched, "pirorgrad", dtype=DTYPE)
        spec = decompress_spec(audio.astype(jnp.float32) * diff.scale_c,
                               cfg.feat_type)
        return istft(spec, length=wav.shape[-1])

    wav = jax.random.normal(jax.random.PRNGKey(3), (BATCH, CHUNK)) * 0.1
    k = jax.random.PRNGKey(4)
    float(jnp.sum(enhance(packed, wav, k)))  # compile + warm

    def chained(n):
        t0 = time.time()
        w = wav
        for i in range(n):
            w = enhance(packed, w, jax.random.fold_in(k, i))
        float(jnp.sum(w))
        return time.time() - t0

    return _slope(chained)


def bench_decoder_segment(packed, t_frames, split, k1=32, k2=160):
    """In-jit fori_loop slope over the isolated dual-decoder segment.
    The loop feeds a scalar tap of each iteration's output back into
    the bottleneck input so iterations serialize without reshaping."""
    from prior_diffuse_tpu.ops.pallas.convblock_kernel import encoder_pallas

    dd = packed["ddpm"]["dual_dec"]
    xin = jnp.zeros((BATCH, t_frames, 161, 2), DTYPE)
    temb = jnp.zeros((BATCH, 512), DTYPE)
    xe_s, skips_s = jax.eval_shape(
        lambda p, a, b: encoder_pallas(a, p, b, dtype=DTYPE,
                                       use_pallas=False),
        packed["ddpm"]["enc"], xin, temb)
    x = jnp.zeros(xe_s.shape, DTYPE)
    skips = [jnp.zeros(s.shape, DTYPE) for s in skips_s]

    def make(k):
        @jax.jit
        def run(dd, x, skips, temb):
            def body(i, carry):
                out = dual_decoder_forward(
                    dd, carry, skips, temb, dtype=DTYPE, split_mm=split)
                return x + (jnp.sum(out) * 0).astype(x.dtype)
            return jax.lax.fori_loop(0, k, body, x)
        return run

    r1, r2 = make(k1), make(k2)
    float(jnp.sum(r1(dd, x, skips, temb)))
    float(jnp.sum(r2(dd, x, skips, temb)))

    def t(run):
        t0 = time.time()
        float(jnp.sum(run(dd, x, skips, temb)))
        return time.time() - t0

    vals = sorted((t(r2) - t(r1)) / (k2 - k1) for _ in range(3))
    return vals[1]


def main():
    cfg, diff, packed, t_frames = build_vars()
    res = {"device": getattr(jax.devices()[0], "device_kind", "unknown")}
    res["enhance_ms_dual"] = round(bench_full(cfg, diff, packed, False) * 1e3, 2)
    res["enhance_ms_dual2"] = round(bench_full(cfg, diff, packed, True) * 1e3, 2)
    res["decoder_ms_dual"] = round(
        bench_decoder_segment(packed, t_frames, False) * 1e3, 4)
    res["decoder_ms_dual2"] = round(
        bench_decoder_segment(packed, t_frames, True) * 1e3, 4)
    res["full_speedup_dual2"] = round(
        res["enhance_ms_dual"] / res["enhance_ms_dual2"], 3)
    res["decoder_speedup_dual2"] = round(
        res["decoder_ms_dual"] / res["decoder_ms_dual2"], 3)
    print(json.dumps(res))
    with open("docs/PERF_dualv2_r5.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
