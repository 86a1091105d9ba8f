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
