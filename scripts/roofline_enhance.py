"""Publish the serving-forward roofline (VERDICT r5 item 5).

Builds the exact production bf16 enhance program at bench.py's shapes
(batch 8 x 3 s, dual block-diagonal decoder, 6-step unrolled sampler),
traces it on CPU — tracing needs no chip — and computes the attainable
ceiling on the bench device (v5e peak 197 TF/s bf16, 819 GB/s HBM) via
``utils/roofline.py``: exact MACs, lane-quantized padded FLOPs, fused /
unfused HBM byte brackets.

Output: docs/PERF_r5_notes.md + docs/PERF_r5_roofline.json, including
the measured-vs-ceiling ratio against the BENCH enhance_batch_ms_bf16
number passed with --measured-ms.

Usage:
  python scripts/roofline_enhance.py --measured-ms 34.44 \
      --out docs/PERF_r5_notes.md --json docs/PERF_r5_roofline.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from prior_diffuse_tpu.config import DiffusionConfig, TrainConfig  # noqa: E402
from prior_diffuse_tpu.diffusion import (  # noqa: E402
    inference_schedule,
    reverse_sample,
)
from prior_diffuse_tpu.models import DiffUNet, DiffUNet1  # noqa: E402
from prior_diffuse_tpu.models.fused_forward import (  # noqa: E402
    fused_unet_forward,
    pack_unet,
)
from prior_diffuse_tpu.signal.compress import (  # noqa: E402
    compress_spec,
    decompress_spec,
)
from prior_diffuse_tpu.signal.stft import istft, stft  # noqa: E402
from prior_diffuse_tpu.utils.roofline import (  # noqa: E402
    CHIP_SPECS,
    analyze,
    format_report,
)

BATCH, CHUNK = 8, 48000
DTYPE = jnp.bfloat16


def build():
    """The bench.py bf16 dual-decoder enhance, shape-identical."""
    cfg = TrainConfig()
    diff = DiffusionConfig()
    sched = inference_schedule(diff, fast_sampling=True)
    dis, ddpm = DiffUNet(), DiffUNet1(num_steps=diff.num_steps)
    key = jax.random.PRNGKey(0)
    t_frames = CHUNK // cfg.win_shift + 1
    dummy = jnp.zeros((1, t_frames, cfg.freq_bins, 2))
    cast = lambda t: jax.tree.map(lambda p: p.astype(DTYPE), t)
    dis_vars = cast(jax.jit(dis.init)(key, dummy))
    ddpm_vars = cast(jax.jit(lambda k, a, b, t: ddpm.init(k, a, b, t))(
        key, dummy, dummy, jnp.zeros((1,))))
    packed = {"ddpm": jax.jit(pack_unet)(ddpm_vars),
              "dis": jax.jit(pack_unet)(dis_vars)}

    def enhance(packed, wav, rng):
        feat = compress_spec(stft(wav), cfg.feat_type)
        x_init = fused_unet_forward(
            packed["dis"], feat.astype(DTYPE), dtype=DTYPE,
            use_pallas=False, dual_decoder=True)
        x_init = x_init.astype(DTYPE) / jnp.asarray(diff.scale_c, DTYPE)

        def model_fn(x, t):
            return fused_unet_forward(
                packed["ddpm"], x.astype(DTYPE), x_init, t.astype(DTYPE),
                num_steps=diff.num_steps, dtype=DTYPE,
                use_pallas=False, dual_decoder=True).astype(DTYPE)

        audio = reverse_sample(model_fn, rng, x_init, x_init.shape,
                               sched, "pirorgrad", dtype=DTYPE)
        spec = decompress_spec(audio.astype(jnp.float32) * diff.scale_c,
                               cfg.feat_type)
        return istft(spec, length=wav.shape[-1])

    wav = jnp.zeros((BATCH, CHUNK), jnp.float32)
    return enhance, (packed, wav, jax.random.PRNGKey(1))


def build_segments():
    """One DiffUNet1 dual forward split at the measured-segment
    boundaries of docs/PERF_fwdsplit_r4.json: encoder / TCM x3 / dual
    decoder.  Returns {name: (fn, args)} for per-segment rooflines."""
    from prior_diffuse_tpu.models.diffunet import TCM
    from prior_diffuse_tpu.models.fused_forward import dual_decoder_forward
    from prior_diffuse_tpu.ops.pallas.convblock_kernel import encoder_pallas

    cfg = TrainConfig()
    diff = DiffusionConfig()
    ddpm = DiffUNet1(num_steps=diff.num_steps)
    key = jax.random.PRNGKey(0)
    t_frames = CHUNK // cfg.win_shift + 1
    dummy = jnp.zeros((1, t_frames, cfg.freq_bins, 2))
    cast = lambda t: jax.tree.map(lambda p: p.astype(DTYPE), t)
    ddpm_vars = cast(jax.jit(lambda k, a, b, t: ddpm.init(k, a, b, t))(
        key, dummy, dummy, jnp.zeros((1,))))
    packed = jax.jit(pack_unet)(ddpm_vars)

    x = jnp.zeros((BATCH, t_frames, cfg.freq_bins, 2), DTYPE)
    temb = jnp.zeros((BATCH, 512), DTYPE)

    def enc(packed, x, temb):
        return encoder_pallas(x, packed["enc"], temb, dtype=DTYPE,
                              use_pallas=False)

    xe, skips = jax.eval_shape(enc, packed, x, temb)
    xe = jnp.zeros(xe.shape, DTYPE)
    skips = [jnp.zeros(s.shape, DTYPE) for s in skips]

    def tcm3(packed, xe):
        b, tt, f, c = xe.shape
        flat = xe.transpose(0, 1, 3, 2).reshape(b, tt, c * f)
        for i in range(3):
            flat = TCM(dtype=DTYPE).apply(
                {"params": packed["core_params"][f"tcm{i + 1}"],
                 "batch_stats": packed["core_stats"][f"tcm{i + 1}"]},
                flat, False)
        return flat.reshape(b, tt, c, f).transpose(0, 1, 3, 2)

    def dec(packed, xb, skips, temb):
        return dual_decoder_forward(packed["dual_dec"], xb, skips, temb,
                                    dtype=DTYPE)

    return {
        "encoder": (enc, (packed, x, temb)),
        "tcm_x3": (tcm3, (packed, xe)),
        "dual_decoder": (dec, (packed, xe, skips, temb)),
    }


# measured per-forward segment times (ms), docs/PERF_fwdsplit_r4.json
_MEASURED_SPLIT_BF16 = {"encoder": 1.042, "tcm_x3": 0.1016,
                        "dual_decoder": 4.1018}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="BENCH enhance_batch_ms_bf16 to compare against")
    ap.add_argument("--chip", default="v5 lite", choices=sorted(CHIP_SPECS))
    ap.add_argument("--out", default="docs/PERF_r5_notes.md")
    ap.add_argument("--json", default="docs/PERF_r5_roofline.json")
    args = ap.parse_args()

    spec = CHIP_SPECS[args.chip]
    peak, bw = spec["peak_bf16"], spec["hbm_gbps"]

    fn, fargs = build()
    rep = analyze(fn, *fargs)
    totals = rep.totals(peak, bw)
    measured_s = args.measured_ms / 1e3 if args.measured_ms else None
    table = format_report(rep, peak, bw, measured_s=measured_s)

    seg_rows = []
    for name, (sfn, sargs) in build_segments().items():
        srep = analyze(sfn, *sargs)
        st = srep.totals(peak, bw)
        meas = _MEASURED_SPLIT_BF16.get(name)
        seg_rows.append(
            f"| {name} | {st['model_flops'] / 1e9:.2f} "
            f"| {st['lane_occupancy']:.2f} "
            f"| {st['mxu_bytes'] / 1e6:.0f} "
            f"| {st['attainable_s_fused'] * 1e3:.3f} "
            f"| {st['attainable_s_unfused'] * 1e3:.3f} "
            f"| {meas if meas is not None else '-'} "
            f"| {meas / (st['attainable_s_fused'] * 1e3):.2f}x |"
            if meas else "")

    t = totals
    gap = (measured_s / t["attainable_s_fused"]) if measured_s else None
    lines = [
        "# PERF r5 — serving-forward roofline (VERDICT r5 item 5)",
        "",
        f"Program: the production bf16 enhance jit at bench shapes "
        f"(batch {BATCH} x {CHUNK / 16000:g} s, dual block-diagonal "
        f"decoder, 6-step unrolled sampler; bench.py::bench_enhance "
        f"dual=True).  Chip model: TPU {args.chip} "
        f"({peak / 1e12:.0f} TF/s bf16, {bw / 1e9:.0f} GB/s HBM).",
        "",
        "Method: static jaxpr walk (`utils/roofline.py`) — exact MACs "
        "per MXU op, *attainable* FLOPs after (8,128) tile "
        "quantization (a Cout=32 conv pays for 128 lanes), HBM bytes "
        "for operands+results, per-op `max(compute, memory)` summed. "
        "Elementwise traffic is bracketed: 0 (perfect fusion) to "
        "write+read of every non-MXU output.",
        "",
        table,
        "",
        "## Per-segment (one DiffUNet1 forward, measured split from "
        "docs/PERF_fwdsplit_r4.json)",
        "",
        "| segment | GFLOP | occupancy | MXU MB | fused ceiling ms "
        "| unfused ms | measured ms | vs fused |",
        "|---|---|---|---|---|---|---|---|",
        *seg_rows,
        "",
        "## Reading",
        "",
        f"- Lane occupancy {t['lane_occupancy']:.3f}: the architecture's "
        "small channel counts (reference model/diff3.py:105-212 parity-"
        "pins them) leave most MXU lanes padded — this is the "
        "architecture-pinned part of the low naive MFU, now quantified.",
    ]
    if measured_s:
        lines += [
            f"- Measured {args.measured_ms:.2f} ms vs fused ceiling "
            f"{t['attainable_s_fused'] * 1e3:.2f} ms -> the program runs at "
            f"{gap:.2f}x its attainable roofline "
            f"({1 / gap:.0%} of attainable).",
        ]
        verdict = ("within ~2x of its roofline — the remaining gap is NOT "
                   "addressable without reformulating the architecture "
                   "(fewer MACs or wider channels), which parameter parity "
                   "forbids." if gap is not None and gap <= 2.0 else
                   "MORE than 2x off its roofline — an addressable gap "
                   "remains; profile the largest-roofline ops above.")
        lines.append(f"- Verdict: the pipeline sits {verdict}")
    out_doc = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(out_doc)

    payload = {
        "chip": args.chip,
        "peak_bf16": peak,
        "hbm_gbps": bw,
        "measured_ms": args.measured_ms,
        "totals": {k: v for k, v in totals.items()},
        "gap_vs_fused_ceiling": gap,
        "ops": [
            {"kind": o.kind, "shape": o.shape_sig, "count": o.count,
             "flops": o.flops, "padded_flops": o.padded_flops,
             "bytes": o.total_bytes,
             "roofline_us": o.roofline_s(peak, bw) * 1e6}
            for o in sorted(rep.ops.values(),
                            key=lambda o: -o.roofline_s(peak, bw))
        ],
    }
    with open(args.json, "w") as f:
        json.dump(payload, f, indent=1)
    print(out_doc)


if __name__ == "__main__":
    main()
