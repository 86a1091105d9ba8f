"""STFT / ISTFT as MXU-friendly framed matmuls.

Numerically matches ``torch.stft`` / ``torch.istft`` with
``center=True`` (reflect padding), periodic Hann window, ``n_fft=320``,
``hop=160``, ``win=320`` — the framing used throughout the reference
(``utils/dataset.py:61-74``, ``utils/metrics.py:557-563``,
``trainer/complex_ddpm_trainer.py:926-930,1010-1015``).

Design notes (TPU-first):

* The DFT is a dense ``[win, 2*freq]`` matmul instead of an FFT: one
  large ``[B*T, win] x [win, 2F]`` contraction that tiles directly onto
  the MXU, with ``precision=HIGHEST`` for float32-exact results.
* With ``hop == win // 2`` framing and overlap-add reduce to cheap
  reshapes: no gather/scatter, fully static shapes.
* Output layout is channels-last ``[..., T, F, 2]`` (real, imag) — the
  transpose of the reference's ``[B, 2, T, F]`` packing.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


def _pallas_eligible(ndim, fft_num, win_size, win_shift, window, dtype):
    """Opt-in routing to the fused Pallas kernels (``PDT_PALLAS=1``).

    Default is the XLA framed-matmul, on evidence (one v5e chip,
    batch 8 x 48k, numerics agree to 1.5e-7):

    * **inside a jit** (the production position — the STFT is always
      embedded in the enhance/train jits) XLA wins ~5x: 0.054 ms vs
      0.266 ms per STFT+ISTFT round-trip, measured as a fori_loop
      iteration-count slope.  XLA's single [B*T, 320]x[320, 322]
      contraction tiles the MXU perfectly, while the kernels' 8-frame
      serial tiles under-fill the 128-wide systolic array;
    * as a *standalone dispatched op* the Pallas call is ~4x faster
      (0.45 vs 1.96 ms) because one custom call beats the XLA path's
      many-op dispatch overhead on this PJRT — irrelevant in
      production, where dispatch is amortized by the surrounding jit.

    ``bench.py`` re-measures both paths every run
    (``stft_xla_ms``/``stft_pallas_ms``).  Pallas is also restricted to
    single-device computations (no GSPMD partitioning rule for the
    custom call) and the reference 320/160 geometry.
    """
    if os.environ.get("PDT_PALLAS", "0") != "1":
        return False
    if not (win_size == fft_num == 2 * win_shift and window is None):
        return False
    if ndim != 2 or dtype != jnp.float32:
        return False
    try:
        return jax.default_backend() != "cpu" and jax.device_count() == 1
    except Exception:  # backend not initializable yet
        return False


def hann_window(win_size: int = 320, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window``."""
    n = np.arange(win_size)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_size))).astype(dtype)


def frame_count(wav_len: int, win_size: int = 320, fft_num: int = 320,
                win_shift: int = 160) -> int:
    """Number of STFT frames for a centered STFT.

    Matches the reference's dataset formula
    ``(len - win + fft)//hop + 1`` (``utils/dataset.py:103``), which for
    ``win == fft`` equals ``len//hop + 1`` — the ``torch.stft``
    ``center=True`` frame count.
    """
    return (wav_len - win_size + fft_num) // win_shift + 1


@functools.lru_cache(maxsize=8)
def _dft_matrices_np(fft_num: int = 320):
    """Forward/backward real-DFT matrices.

    Returns ``(fwd, inv)`` where
      * ``fwd`` is ``[fft, 2F]``: ``frames @ fwd -> [.., 2F]`` packing
        ``[re_0..re_{F-1}, im_0..im_{F-1}]`` of the one-sided rFFT.
      * ``inv`` is ``[2F, fft]``: the exact inverse (irFFT) such that
        ``spec_packed @ inv`` reproduces the time-domain frame.
    """
    freq = fft_num // 2 + 1
    n = np.arange(fft_num)[:, None]  # [fft, 1]
    k = np.arange(freq)[None, :]  # [1, F]
    ang = 2.0 * np.pi * n * k / fft_num
    # rfft: X[k] = sum_n x[n] (cos(ang) - i sin(ang))
    fwd = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # [fft, 2F]

    # irfft: x[n] = (1/N) sum_k w_k (Re cos + (-Im)(-sin)) with w_0=w_{F-1}=1,
    # else 2 (hermitian completion for even fft_num).
    w = np.full((freq,), 2.0)
    w[0] = 1.0
    w[-1] = 1.0
    inv_re = (w[:, None] * np.cos(ang.T)) / fft_num  # [F, fft]
    inv_im = (-w[:, None] * np.sin(ang.T)) / fft_num  # [F, fft]
    inv = np.concatenate([inv_re, inv_im], axis=0)  # [2F, fft]
    return fwd, inv


def dft_matrices(fft_num: int = 320, dtype=jnp.float32):
    # numpy is cached; the jnp conversion happens per call so no traced
    # array is ever captured by the cache (tracer-leak safe under jit)
    fwd, inv = _dft_matrices_np(fft_num)
    return jnp.asarray(fwd, dtype=dtype), jnp.asarray(inv, dtype=dtype)


def _frame_centered(x: jnp.ndarray, win_size: int, hop: int) -> jnp.ndarray:
    """Reflect-pad by ``win//2`` and extract frames ``[.., T, win]``.

    Requires ``win == 2*hop`` (true for the 320/160 framing): frames are
    then two interleaved reshapes — no gathers.
    """
    assert win_size == 2 * hop, "framing fast-path requires win == 2*hop"
    length = x.shape[-1]
    if length <= win_size // 2:
        raise ValueError(
            f"signal length {length} must exceed half-window {win_size // 2} "
            "for centered (reflect-padded) STFT"
        )
    num_frames = length // hop + 1
    pad = win_size // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    # keep exactly (T+1)*hop samples (drops the tail when len % hop != 0)
    xp = xp[..., : (num_frames + 1) * hop]
    halves = xp.reshape(*x.shape[:-1], num_frames + 1, hop)
    return jnp.concatenate([halves[..., :-1, :], halves[..., 1:, :]], axis=-1)


def stft(
    x: jnp.ndarray,
    fft_num: int = 320,
    win_size: int = 320,
    win_shift: int = 160,
    window: Optional[jnp.ndarray] = None,
    precision=_HIGHEST,
) -> jnp.ndarray:
    """Centered STFT of ``x [..., L]`` -> real-packed ``[..., T, F, 2]``.

    ``T = L//hop + 1``, ``F = fft//2 + 1``.  Equals ``torch.stft(x,
    n_fft, hop, win, hann, center=True, pad_mode='reflect')`` with the
    output permuted from ``[F, T]`` to ``[T, F]``.
    """
    assert fft_num == win_size, "win < fft would need additional zero-pad"
    if _pallas_eligible(x.ndim, fft_num, win_size, win_shift, window, x.dtype):
        from prior_diffuse_tpu.ops.pallas import stft_pallas

        return stft_pallas(x, fft_num, win_shift)
    return stft_xla(x, fft_num, win_size, win_shift, window, precision)


def stft_xla(
    x: jnp.ndarray,
    fft_num: int = 320,
    win_size: int = 320,
    win_shift: int = 160,
    window: Optional[jnp.ndarray] = None,
    precision=_HIGHEST,
) -> jnp.ndarray:
    """The XLA framed-matmul STFT (bypasses the Pallas dispatch)."""
    if window is None:
        window = jnp.asarray(hann_window(win_size))
    frames = _frame_centered(x, win_size, win_shift) * window
    fwd, _ = dft_matrices(fft_num, frames.dtype)
    spec = jnp.matmul(frames, fwd, precision=precision)  # [..., T, 2F]
    freq = fft_num // 2 + 1
    return jnp.stack([spec[..., :freq], spec[..., freq:]], axis=-1)


def istft(
    spec: jnp.ndarray,
    length: Optional[int] = None,
    fft_num: int = 320,
    win_size: int = 320,
    win_shift: int = 160,
    window: Optional[jnp.ndarray] = None,
    precision=_HIGHEST,
) -> jnp.ndarray:
    """Inverse of :func:`stft`; matches ``torch.istft(center=True)``.

    ``spec``: real-packed ``[..., T, F, 2]``.  Output ``[..., L]`` with
    ``L = length`` if given else ``(T-1)*hop``.

    Implements the least-squares inverse
    ``y[n] = sum_t w[n-th] x_t[n-th] / sum_t w^2[n-th]`` followed by the
    center-pad trim — the same normalization ``torch.istft`` applies
    (relied on for metric parity, ``utils/metrics.py:557-563``).
    """
    assert win_size == 2 * win_shift and fft_num == win_size
    if _pallas_eligible(spec.ndim - 2, fft_num, win_size, win_shift, window,
                        spec.dtype):
        from prior_diffuse_tpu.ops.pallas import istft_pallas

        out_len = (length if length is not None
                   else (spec.shape[-3] - 1) * win_shift)
        return istft_pallas(spec, out_len, fft_num, win_shift)
    return istft_xla(spec, length, fft_num, win_size, win_shift, window,
                     precision)


def istft_xla(
    spec: jnp.ndarray,
    length: Optional[int] = None,
    fft_num: int = 320,
    win_size: int = 320,
    win_shift: int = 160,
    window: Optional[jnp.ndarray] = None,
    precision=_HIGHEST,
) -> jnp.ndarray:
    """The XLA framed-matmul ISTFT (bypasses the Pallas dispatch)."""
    if window is None:
        window = jnp.asarray(hann_window(win_size))
    *batch, num_frames, freq, _ = spec.shape
    packed = jnp.concatenate([spec[..., 0], spec[..., 1]], axis=-1)  # [..,T,2F]
    _, inv = dft_matrices(fft_num, packed.dtype)
    frames = jnp.matmul(packed, inv, precision=precision)  # [.., T, fft]
    frames = frames * window

    hop = win_shift
    # overlap-add: with win == 2*hop every output sample is the sum of the
    # 2nd half of frame t-1 and the 1st half of frame t.
    first = frames[..., :hop]
    second = frames[..., hop:]
    zeros = jnp.zeros((*batch, 1, hop), frames.dtype)
    acc = jnp.concatenate([first, zeros], axis=-2) + jnp.concatenate(
        [zeros, second], axis=-2
    )  # [..., T+1, hop]
    y = acc.reshape(*batch, (num_frames + 1) * hop)

    # window-square envelope (same overlap-add applied to w^2 per frame)
    wsq = np.asarray(hann_window(win_size), np.float64) ** 2
    env = np.zeros(((num_frames + 1) * hop,))
    w1, w2 = wsq[:hop], wsq[hop:]
    env[: num_frames * hop] += np.tile(w1, num_frames)
    env[hop:] += np.tile(w2, num_frames)
    env = np.where(np.abs(env) > 1e-11, env, 1.0)
    y = y / jnp.asarray(env, y.dtype)

    pad = win_size // 2
    out_len = (num_frames - 1) * hop if length is None else length
    y = y[..., pad:]
    if out_len <= y.shape[-1]:
        return y[..., :out_len]
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, out_len - y.shape[-1])])


def pack_reference_layout(spec_btfc: jnp.ndarray) -> jnp.ndarray:
    """``[B, T, F, 2] -> [B, 2, T, F]`` (reference tensor layout)."""
    return jnp.moveaxis(spec_btfc, -1, -3)


def unpack_reference_layout(spec_bctf: jnp.ndarray) -> jnp.ndarray:
    """``[B, 2, T, F] -> [B, T, F, 2]`` (our channels-last layout)."""
    return jnp.moveaxis(spec_bctf, -3, -1)
