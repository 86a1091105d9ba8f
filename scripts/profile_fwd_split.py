"""DiffUNet1 serving-forward internal attribution (round 4).

PERF_r3 pinned 85 % of the enhance batch on the 6 DiffUNet1 forwards;
PERF_convblock_r4 showed the encoder is only ~1.07 ms of the ~7.4 ms
bf16 forward.  This harness splits the rest: preprocess+temb, encoder,
the 3 TCM stacks, and the two decoder branches, each timed as an
in-jit ``lax.fori_loop`` iteration-count slope (CLAUDE.md micro-op
rule) at the serving shape (batch 8, T=301, bf16 and f32).

Usage:
  PDT_FWDSPLIT_SMOKE=1 python scripts/profile_fwd_split.py  # CPU check
  python scripts/profile_fwd_split.py                       # chip run
Writes docs/PERF_fwdsplit_r4.json.
"""

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

SMOKE = bool(os.environ.get("PDT_FWDSPLIT_SMOKE"))
BATCH, T = (2, 23) if SMOKE else (8, 301)
OUT = "/tmp/PERF_fwdsplit_smoke.json" if SMOKE else \
    "docs/PERF_fwdsplit_r4.json"


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from prior_diffuse_tpu.models import layers as tl
    from prior_diffuse_tpu.models.diffunet import TCM, Decoder, DiffUNet1, Encoder

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((BATCH, T, 161, 2)), jnp.float32)
    xi32 = jnp.asarray(rng.standard_normal((BATCH, T, 161, 2)), jnp.float32)
    t32 = jnp.asarray(rng.uniform(0, 49, BATCH), jnp.float32)

    net = DiffUNet1()
    variables = jax.jit(functools.partial(net.init, train=False))(
        jax.random.PRNGKey(0), x32, xi32, t32)
    params = variables["params"]
    stats = variables["batch_stats"]

    def micro_slope(make_run, x, k1=8, k2=72, min_delta_s=0.05):
        def t(run):
            t0 = time.time()
            float(jnp.sum(run(x)))
            return time.time() - t0

        for _ in range(5):
            r1, r2 = make_run(k1), make_run(k2)
            float(jnp.sum(r1(x)))
            float(jnp.sum(r2(x)))
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

    def make(body):
        def build(k):
            @jax.jit
            def run(x):
                return jax.lax.fori_loop(0, k, lambda i, v: body(v), x)
            return run
        return build

    def fb(x, y):
        return x + (jnp.sum(y) * jnp.asarray(1e-12, jnp.float32)
                    ).astype(x.dtype)

    results = {"device": getattr(jax.devices()[0], "device_kind", "?"),
               "batch": BATCH, "t_frames": T}

    for dname, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        mdt = None if dt == jnp.float32 else dt
        netd = DiffUNet1(dtype=mdt)
        en = Encoder(time_cond=True, dtype=mdt)
        dec = Decoder(time_cond=True, dtype=mdt)

        # fixed intermediate inputs (f32 sources, cast per body)
        temb = tl.TimeEmbedding(net.num_steps).apply(
            {"params": params["time_embedding"]}, t32).astype(dt)
        w = params["preprocess"]["kernel"].reshape(4, 2)
        bias = params["preprocess"]["bias"]
        x0 = (jnp.einsum("btfc,cd->btfd",
                         jnp.concatenate([x32, xi32], -1), w)
              + bias).astype(dt)
        enc_vars = {"params": params["core"]["en"],
                    "batch_stats": stats["core"]["en"]}
        xb, skips = en.apply(enc_vars, x0, temb, False)
        b, tt, f, c = xb.shape
        flat0 = xb.transpose(0, 1, 3, 2).reshape(b, tt, c * f)

        def full_body(x):
            y = netd.apply(variables, x, xi32.astype(x.dtype),
                           t32, False)
            return fb(x, y)

        def enc_body(x):
            y, _ = en.apply(enc_vars, x, temb, False)
            return fb(x, y)

        def tcm_body(flat):
            y = flat
            for i in range(3):
                y = TCM(dtype=mdt).apply(
                    {"params": params["core"][f"tcm{i + 1}"],
                     "batch_stats": stats["core"][f"tcm{i + 1}"]},
                    y, False)
            return fb(flat, y)

        def dec_body(xbot):
            outs = []
            for name in ("de_real", "de_imag"):
                outs.append(dec.apply(
                    {"params": params["core"][name],
                     "batch_stats": stats["core"][name]},
                    xbot, skips, temb, False))
            return fb(xbot, outs[0] + outs[1])

        # candidate: the two branches are structurally identical —
        # vmap over stacked params turns every decoder conv into ONE
        # conv at 2x batch instead of two small ones
        dec_stacked = jax.tree.map(
            lambda a, b_: jnp.stack([a, b_]),
            {"params": params["core"]["de_real"],
             "batch_stats": stats["core"]["de_real"]},
            {"params": params["core"]["de_imag"],
             "batch_stats": stats["core"]["de_imag"]})
        dec_vmapped = jax.vmap(
            lambda v, xb_: dec.apply(v, xb_, skips, temb, False),
            in_axes=(0, None))

        def dec_vmap_body(xbot):
            y = dec_vmapped(dec_stacked, xbot)  # [2, B, T, 161, 1]
            return fb(xbot, y)

        # candidate 2: block-diagonal dual-branch decoder (one op chain
        # at doubled lane width, models/fused_forward.py)
        from prior_diffuse_tpu.models.fused_forward import (
            dual_decoder_forward, pack_dual_decoder)
        dual_stages = jax.jit(pack_dual_decoder)(params["core"],
                                                 stats["core"])

        def dec_dual_body(xbot):
            y = dual_decoder_forward(dual_stages, xbot, skips, temb,
                                     dtype=dt)
            return fb(xbot, y)

        seg = {}
        seg["full_ms"] = micro_slope(make(full_body), x32.astype(dt))
        seg["encoder_ms"] = micro_slope(make(enc_body), x0)
        seg["tcm3_ms"] = micro_slope(make(tcm_body), flat0)
        seg["decoders_ms"] = micro_slope(make(dec_body), xb)
        seg["decoders_vmap_ms"] = micro_slope(make(dec_vmap_body), xb)
        seg["decoders_dual_ms"] = micro_slope(make(dec_dual_body), xb)
        seg["pre_temb_residual_ms"] = (seg["full_ms"] - seg["encoder_ms"]
                                       - seg["tcm3_ms"] - seg["decoders_ms"])
        results[f"fwd_split_{dname}"] = {k: round(v, 4)
                                         for k, v in seg.items()}
        print(json.dumps({f"fwd_split_{dname}":
                          results[f"fwd_split_{dname}"]}), flush=True)

    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
