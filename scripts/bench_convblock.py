"""Measure the fused Pallas encoder-stage kernel vs the XLA encoder
(round-3 verdict next #5: test the MFU ceiling instead of asserting it).

The DiffUNet1 encoder (5 conv-block stages, reference
``model/diff3.py:144-165``) is the hot serving path: round-3 attribution
(docs/PERF_r3.json) pinned 85 % of the enhance batch on the 6 DiffUNet1
forwards and blamed small-channel convs at low MXU utilization.  The
fused kernel (``ops/pallas/convblock_kernel.py``) attacks exactly that:
one VMEM-resident pass per stage instead of six XLA convs with five HBM
round-trips.

Timing follows the CLAUDE.md micro-op rule: sub-ms ops are meaningless
as host-chained slopes on this PJRT, so each path runs as a
``lax.fori_loop`` iteration-count slope inside ONE jit, ending in a
scalar readback.  Shapes are the real serving configuration: batch 8,
3 s utterances (T=301, F=161), time-conditioned, bf16 and f32.

Usage:
  PDT_CONVBLOCK_SMOKE=1 python scripts/bench_convblock.py  # CPU validate
  python scripts/bench_convblock.py                        # chip run
Writes docs/PERF_convblock_r4.json.
"""

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

SMOKE = bool(os.environ.get("PDT_CONVBLOCK_SMOKE"))
BATCH, T, F = (2, 37, 161) if SMOKE else (8, 301, 161)
OUT = "/tmp/PERF_convblock_smoke.json" if SMOKE else \
    "docs/PERF_convblock_r4.json"


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from prior_diffuse_tpu.models import layers as tl
    from prior_diffuse_tpu.models.diffunet import Encoder
    from prior_diffuse_tpu.ops.pallas.convblock_kernel import (
        encoder_pallas, pack_encoder)

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((BATCH, T, F, 2)), jnp.float32)
    temb32 = jnp.asarray(rng.standard_normal((BATCH, 512)), jnp.float32)

    en_init = Encoder(time_cond=True)
    variables = jax.jit(functools.partial(en_init.init, train=False))(
        jax.random.PRNGKey(0), x32, temb32)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    packed = pack_encoder(params, stats)

    def micro_slope(make_run, x, k1=8, k2=72, min_delta_s=0.05):
        """ms per iteration of body(x) -> x, via in-jit fori_loop slope."""
        def t(run):
            t0 = time.time()
            float(jnp.sum(run(x)))
            return time.time() - t0

        for _ in range(5):  # grow k2 until the delta clears noise
            r1, r2 = make_run(k1), make_run(k2)
            float(jnp.sum(r1(x)))
            float(jnp.sum(r2(x)))  # compile + warm
            if t(r2) - t(r1) >= min_delta_s or SMOKE:
                break
            k2 = k1 + (k2 - k1) * 4

        prev = None
        for _ in range(8):
            vals = sorted((t(r2) - t(r1)) / (k2 - k1) for _ in range(3))
            med = vals[1]
            if med > 0 and prev is not None and abs(med - prev) <= 0.2 * med:
                return med * 1e3
            prev = med if med > 0 else None
        if SMOKE and prev:
            return prev * 1e3
        raise RuntimeError(f"unstable slope (last={med}, k2={k2})")

    results = {"device": getattr(jax.devices()[0], "device_kind", "?"),
               "batch": BATCH, "t_frames": T, "f_bins": F}

    for dname, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        en = Encoder(time_cond=True, dtype=None if dtype == jnp.float32
                     else dtype)
        xd = x32.astype(dtype)
        tembd = temb32.astype(dtype)
        pvars = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}

        def feedback(x, y):
            # scalar feedback keeps the chain honest without changing shape
            return x + (jnp.sum(y) * jnp.asarray(1e-12, jnp.float32)
                        ).astype(x.dtype)

        def conv_body(x):
            y, _ = en.apply(pvars, x, tembd, False)
            return feedback(x, y)

        def chain_body(x):
            y, _ = encoder_pallas(x, packed, tembd, dtype=dtype,
                                  use_pallas=False)
            return feedback(x, y)

        def pallas_body(x):
            y, _ = encoder_pallas(x, packed, tembd, dtype=dtype,
                                  interpret=SMOKE)
            return feedback(x, y)

        def make(body):
            def build(k):
                @jax.jit
                def run(x):
                    return jax.lax.fori_loop(0, k, lambda i, v: body(v), x)
                return run
            return build

        ms_xla = micro_slope(make(conv_body), xd)
        ms_chain = micro_slope(make(chain_body), xd)
        ms_pal = micro_slope(make(pallas_body), xd)
        results[f"encoder_conv_{dname}_ms"] = round(ms_xla, 4)
        results[f"encoder_xlachain_{dname}_ms"] = round(ms_chain, 4)
        results[f"encoder_pallas_{dname}_ms"] = round(ms_pal, 4)
        results[f"chain_speedup_{dname}"] = round(ms_xla / ms_chain, 3)
        results[f"pallas_speedup_{dname}"] = round(ms_xla / ms_pal, 3)
        print(json.dumps({k: results[k] for k in results
                          if dname in k}), flush=True)

    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
