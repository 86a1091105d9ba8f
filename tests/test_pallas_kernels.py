"""Pallas STFT/ISTFT kernels vs the XLA reference path.

These tests run interpret mode on the CPU mesh.  The Mosaic-compiled
path is validated on the real chip by `bench.py`, which compiles both
paths every run and reports timing + max numeric difference (measured
on v5e: 1.5e-7 max diff; XLA ~5x faster *inside* a jit, Pallas ~4x
faster as a standalone dispatch — see `signal.stft._pallas_eligible`
for why XLA is therefore the default and Pallas is opt-in via
`PDT_PALLAS=1`).  Dispatch behavior is pinned below."""

import numpy as np
import pytest
import jax.numpy as jnp

from prior_diffuse_tpu.ops.pallas.stft_kernel import istft_pallas, stft_pallas
from prior_diffuse_tpu.signal.stft import _pallas_eligible, istft, stft


@pytest.mark.parametrize("length", [48000, 16037])
def test_stft_pallas_matches_xla(rng, length):
    x = jnp.asarray(rng.standard_normal((2, length)).astype(np.float32))
    s_p = stft_pallas(x, interpret=True)
    s_x = stft(x)
    assert s_p.shape == s_x.shape
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), atol=3e-5)


@pytest.mark.parametrize("length", [48000, 16037])
def test_istft_pallas_matches_xla(rng, length):
    x = jnp.asarray(rng.standard_normal((1, length)).astype(np.float32))
    s = stft(x)
    y_p = istft_pallas(s, length=length, interpret=True)
    y_x = istft(s, length=length)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-5)


def test_pallas_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32))
    y = istft_pallas(stft_pallas(x, interpret=True), length=32000,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-4)


def test_pallas_dispatch_rules(monkeypatch):
    """Pallas routing is opt-in (PDT_PALLAS=1) and further restricted
    to a single non-CPU device with the default 320/160 f32 geometry;
    the default is always the XLA path."""
    monkeypatch.delenv("PDT_PALLAS", raising=False)
    assert not _pallas_eligible(2, 320, 320, 160, None, jnp.float32)
    # even opted in: geometry / dtype / layout / backend guards hold
    monkeypatch.setenv("PDT_PALLAS", "1")
    assert not _pallas_eligible(2, 512, 512, 160, None, jnp.float32)
    assert not _pallas_eligible(3, 320, 320, 160, None, jnp.float32)
    assert not _pallas_eligible(2, 320, 320, 160, None, jnp.bfloat16)
    assert not _pallas_eligible(2, 320, 320, 160, jnp.ones(320), jnp.float32)
    # on the 8-device CPU test mesh the XLA path must still win
    assert not _pallas_eligible(2, 320, 320, 160, None, jnp.float32)


@pytest.mark.slow  # interpret-mode encoder chain, ~18 s
def test_fused_encoder_stage_matches_flax(rng):
    """Fused conv-block kernel (round-3 verdict next #5) vs the flax
    Encoder, f32 interpret mode: all five stages must match the XLA
    path including folded inference-BN and PReLU."""
    import jax

    from prior_diffuse_tpu.models.diffunet import Encoder
    from prior_diffuse_tpu.ops.pallas.convblock_kernel import (
        encoder_pallas, pack_encoder)

    en = Encoder(time_cond=False)
    x = jnp.asarray(rng.standard_normal((2, 37, 161, 2)).astype(np.float32))
    variables = en.init(jax.random.PRNGKey(0), x, None, False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    # randomize BN stats so the inference fold is actually exercised
    for i in range(1, 6):
        bn = stats[f"bn{i}"]["BatchNorm_0"]
        bn["mean"] = rng.standard_normal(bn["mean"].shape).astype(np.float32) * 0.1
        bn["var"] = (0.5 + rng.random(bn["var"].shape)).astype(np.float32)

    y_ref, skips_ref = en.apply({"params": params, "batch_stats": stats},
                                x, None, False)
    packed = pack_encoder(params, stats)
    y_pal, skips_pal = encoder_pallas(x, packed, dtype=jnp.float32,
                                      tile_r=64, interpret=True)
    assert y_pal.shape == y_ref.shape
    for i, (a, b) in enumerate(zip(skips_pal, skips_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, err_msg=f"stage {i + 1}")
    # the pure-XLA matmul-chain formulation must match too
    y_xla, _ = encoder_pallas(x, packed, dtype=jnp.float32,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_ref),
                               atol=2e-4)


@pytest.mark.slow  # interpret-mode encoder chain, ~17 s
def test_fused_encoder_time_cond_matches_flax(rng):
    """Time-conditioned variant (the DiffUNet1 serving encoder): the
    per-stage Dense(512 -> Cin) t-projection must fold exactly into the
    fused stage's per-batch conv1 bias."""
    import jax

    from prior_diffuse_tpu.models.diffunet import Encoder
    from prior_diffuse_tpu.ops.pallas.convblock_kernel import (
        encoder_pallas, pack_encoder)

    en = Encoder(time_cond=True)
    x = jnp.asarray(rng.standard_normal((2, 23, 161, 2)).astype(np.float32))
    temb = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
    variables = en.init(jax.random.PRNGKey(1), x, temb, False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    y_ref, skips_ref = en.apply({"params": params, "batch_stats": stats},
                                x, temb, False)
    packed = pack_encoder(params, stats)
    assert all(tp is not None for _, tp in packed)
    y_pal, skips_pal = encoder_pallas(x, packed, temb, dtype=jnp.float32,
                                      tile_r=64, interpret=True)
    assert y_pal.shape == y_ref.shape
    for i, (a, b) in enumerate(zip(skips_pal, skips_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, err_msg=f"stage {i + 1}")
    y_xla, _ = encoder_pallas(x, packed, temb, dtype=jnp.float32,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_ref),
                               atol=3e-4)
