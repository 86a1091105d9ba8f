"""Chip serving RTF for the non-flagship prior families (VERDICT r5
item 8): GCRN (complex path), GRN (mag + noisy-phase path) and
DB-AIAT ``aia_complex_trans_ri`` (complex path, dis-only serving) —
first-class systems in the reference (``conf/{gcrn,grn,dbaiat}.yml``),
previously parity-tested but never chip-benchmarked.

Methodology = bench.py: batch 8 x 3 s, chained jit runs ending in a
scalar readback, slope between two chain lengths.  Each family serves
through its production trainer ``enhance_batch`` jit (the same
``_enhance_jit`` the CLI generate path uses), f32 and bf16.

Output: one JSON line + docs/BENCH_priors_r5.json.  Any bf16 cliff
(bf16 slower than f32, or far off the family's f32 ratio) gets the
usual attribution treatment before adoption claims.
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PDT_APPROX_PESQ", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

BATCH, CHUNK, SECONDS = 8, 48000, 3.0
N1, N2 = 1, 6

FAMILIES = [
    # (label, model name, trainer, loss)
    ("gcrn", "GCRN", "ComplexTrainer", "com_mag_mse_loss"),
    ("grn", "GRN", "MagTrainer", "mag_mse_loss"),
    ("dbaiat_ri", "aia_complex_trans_ri", "ComplexTrainer",
     "com_mag_mse_loss"),
]


def _slope(run_chain, reps=3):
    vals = []
    for _ in range(reps):
        t1 = run_chain(N1)
        t2 = run_chain(N2)
        vals.append((t2 - t1) / (N2 - N1))
    return statistics.median(vals)


def bench_family(jax, jnp, model, trainer_name, loss, dtype, corpus, tmp):
    import prior_diffuse_tpu.training  # noqa: F401  (registry side effect)
    from prior_diffuse_tpu.config import (
        ExperimentConfig, ModelConfig, OptimConfig, RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.registry import TRAINERS

    exp = ExperimentConfig(
        train=TrainConfig(batch_size=BATCH, n_epochs=1, loss=loss,
                          chunk_length=CHUNK, compute_dtype=dtype),
        model=ModelConfig(model),
        optim=OptimConfig(lr=5e-4),
    )
    run = RunConfig(assets=f"{tmp}/{model}_{dtype}", doc="bench",
                    data_root=corpus)
    tr = TRAINERS.get(trainer_name)(run, exp)

    wav_np = (np.random.default_rng(1).standard_normal(
        (BATCH, CHUNK)) * 0.1).astype(np.float32)
    # build + warm the production serving jit
    first = np.asarray(tr.enhance_batch(wav_np, jax.random.PRNGKey(0)))
    assert np.isfinite(first).all(), f"{model} {dtype}: non-finite output"
    wav = tr.put_batch(wav_np)[0]

    def chained(n):
        t0 = time.time()
        w = wav
        for _ in range(n):
            w = tr._enhance_jit(tr.state, w)
        float(jnp.sum(w))  # scalar readback forces true completion
        return time.time() - t0

    chained(1)  # warm the chained shape
    return _slope(chained)


def main():
    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.data import synthetic

    res = {"device": getattr(jax.devices()[0], "device_kind", "unknown"),
           "batch": BATCH, "seconds": SECONDS}
    with tempfile.TemporaryDirectory() as tmp:
        corpus = synthetic.write_corpus(
            f"{tmp}/data", n_train=BATCH, n_test=2, min_len=CHUNK,
            max_len=CHUNK + 1600, seed=0)
        for label, model, trainer_name, loss in FAMILIES:
            for dtype in ("float32", "bfloat16"):
                key = f"{label}_{'bf16' if dtype == 'bfloat16' else 'f32'}"
                step = bench_family(jax, jnp, model, trainer_name, loss,
                                    dtype, corpus, tmp)
                res[f"enhance_ms_{key}"] = round(step * 1e3, 2)
                res[f"rtf_{key}"] = round(BATCH * SECONDS / step, 1)
    for label, *_ in FAMILIES:
        f32 = res.get(f"enhance_ms_{label}_f32")
        b16 = res.get(f"enhance_ms_{label}_bf16")
        if f32 and b16:
            res[f"bf16_speedup_{label}"] = round(f32 / b16, 2)
    print(json.dumps(res))
    with open("docs/BENCH_priors_r5.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
