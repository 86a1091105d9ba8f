"""Roofline analyzer unit tests: exact MAC/byte accounting on known
shapes, tile-quantization padding, and scan trip-count folding
(utils/roofline.py — the VERDICT-r5 MFU-ceiling artifact's engine)."""

import jax
import jax.numpy as jnp
import numpy as np

from prior_diffuse_tpu.utils.roofline import analyze, chip_spec, format_report


def test_dot_macs_and_padding():
    a = jnp.zeros((64, 100), jnp.bfloat16)
    w = jnp.zeros((100, 32), jnp.bfloat16)

    rep = analyze(lambda x: x @ w, a)
    (op,) = rep.ops.values()
    assert op.kind == "dot_general"
    assert op.count == 1
    assert op.macs == 64 * 100 * 32
    # M=64 (already x8), K 100->128, N 32->128
    assert op.padded_macs == 64 * 128 * 128
    # bf16 operands + f32 result (jnp matmul preserves bf16 -> out bf16)
    assert op.bytes_moved == 2 * (64 * 100 + 100 * 32 + 64 * 32)


def test_conv_macs():
    x = jnp.zeros((2, 9, 20, 16), jnp.float32)  # NHWC

    def f(x):
        k = jnp.zeros((2, 3, 16, 32), jnp.float32)  # HWIO
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    rep = analyze(f, x)
    op = next(o for o in rep.ops.values() if o.kind == "conv")
    m = 2 * 9 * 20
    assert op.macs == m * (2 * 3 * 16) * 32
    # K = 2*3*16 = 96 -> 128, Cout 32 -> 128, M 360 -> 360
    assert op.padded_macs == m * 128 * 128


def test_scan_multiplies_counts():
    w = jnp.zeros((64, 64), jnp.float32)

    def f(x):
        def body(c, _):
            return c @ w, None
        y, _ = jax.lax.scan(body, x, None, length=5)
        return y

    rep = analyze(f, jnp.zeros((8, 64), jnp.float32))
    (op,) = rep.ops.values()
    assert op.count == 5
    assert op.flops == 2 * 8 * 64 * 64 * 5


def test_jit_recursed_and_elementwise_bytes():
    w = jnp.zeros((128, 128), jnp.float32)

    @jax.jit
    def f(x):
        return jax.nn.relu(x @ w)

    rep = analyze(f, jnp.zeros((8, 128), jnp.float32))
    assert len(rep.ops) == 1
    # relu (max) output: 8*128 f32, write+read bracket
    assert rep.elementwise_bytes >= 2 * 8 * 128 * 4


def test_totals_and_format():
    w = jnp.zeros((100, 32), jnp.bfloat16)
    rep = analyze(lambda x: x @ w, jnp.zeros((64, 100), jnp.bfloat16))
    spec = {"peak_bf16": 197e12, "hbm_gbps": 819e9}
    t = rep.totals(spec["peak_bf16"], spec["hbm_gbps"])
    assert t["model_flops"] == 2 * 64 * 100 * 32
    assert 0 < t["lane_occupancy"] < 1
    assert t["attainable_s_fused"] <= t["attainable_s_unfused"]
    txt = format_report(rep, spec["peak_bf16"], spec["hbm_gbps"],
                        measured_s=1e-3)
    assert "attainable ceiling" in txt and "measured" in txt


def test_chip_spec_lookup():
    class Dev:
        device_kind = "TPU v5 lite"

    assert chip_spec(Dev())["peak_bf16"] == 197e12
    assert chip_spec(None) is None

    class Unknown:
        device_kind = "TPU v99"

    assert chip_spec(Unknown()) is None
