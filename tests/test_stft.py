"""STFT/ISTFT parity tests against torch.stft/torch.istft (oracle only).

The reference pipeline's framing is torch.stft(n_fft=320, hop=160,
win=320, hann, center=True) and the matching torch.istft; our framed-
matmul kernels must agree to float32 tolerance for metric parity.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import prior_diffuse_tpu.signal.stft as S
import sys
S = sys.modules['prior_diffuse_tpu.signal.stft']


def _torch_stft(x: np.ndarray, n_fft=320, hop=160):
    spec = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        return_complex=False,
    )  # [B, F, T, 2]
    return spec.numpy()


def _torch_istft(spec_btfc: np.ndarray, length=None, n_fft=320, hop=160):
    # ours [B,T,F,2] -> torch [B,F,T] complex
    t = torch.from_numpy(spec_btfc)
    t = torch.complex(t[..., 0], t[..., 1]).transpose(1, 2)
    y = torch.istft(
        t,
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        length=length,
    )
    return y.numpy()


def test_hann_matches_torch():
    ours = S.hann_window(320)
    ref = torch.hann_window(320).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-7)


@pytest.mark.parametrize("length", [48000, 32000, 16037, 3200])
def test_stft_matches_torch(rng, length):
    x = rng.standard_normal((2, length)).astype(np.float32)
    ours = np.asarray(S.stft(jnp.asarray(x)))  # [B, T, F, 2]
    ref = _torch_stft(x)  # [B, F, T, 2]
    ref = np.transpose(ref, (0, 2, 1, 3))  # [B, T, F, 2]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_frame_count_formula():
    for L in [48000, 16037, 3200, 321]:
        assert S.frame_count(L) == L // 160 + 1


@pytest.mark.parametrize("length", [48000, 16037])
def test_istft_matches_torch(rng, length):
    x = rng.standard_normal((1, length)).astype(np.float32)
    spec = np.asarray(S.stft(jnp.asarray(x)))
    ours = np.asarray(S.istft(jnp.asarray(spec), length=length))
    ref = _torch_istft(spec, length=length)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_roundtrip_reconstruction(rng):
    """stft->istft must reproduce the waveform (<=1e-4, SURVEY section 4)."""
    x = rng.standard_normal((3, 48000)).astype(np.float32)
    y = np.asarray(S.istft(S.stft(jnp.asarray(x)), length=48000))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_istft_default_length_matches_torch(rng):
    x = rng.standard_normal((1, 4800)).astype(np.float32)
    spec = np.asarray(S.stft(jnp.asarray(x)))
    ours = np.asarray(S.istft(jnp.asarray(spec)))
    ref = _torch_istft(spec)  # torch default: (T-1)*hop
    assert ours.shape[-1] == ref.shape[-1] == (spec.shape[1] - 1) * 160
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_layout_converters(rng):
    x = rng.standard_normal((2, 5, 7, 2)).astype(np.float32)
    packed = S.pack_reference_layout(jnp.asarray(x))
    assert packed.shape == (2, 2, 5, 7)
    back = S.unpack_reference_layout(packed)
    np.testing.assert_array_equal(np.asarray(back), x)
