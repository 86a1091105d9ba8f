"""Pallas STFT/ISTFT kernels vs the XLA reference path (interpret mode
on CPU; the compiled TPU path is exercised by bench/TPU runs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from prior_diffuse_tpu.ops.pallas.stft_kernel import istft_pallas, stft_pallas
from prior_diffuse_tpu.signal.stft import istft, stft


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
