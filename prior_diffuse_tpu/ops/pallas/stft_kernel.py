"""Fused Pallas STFT / ISTFT kernels for the 320/160 framing.

TPU-first design (see pallas guide):

* the periodic Hann window is **folded into the DFT matrix**
  (``diag(w) @ F``), so framing+window+DFT is a single MXU matmul per
  frame tile — no windowed-frame intermediate ever hits HBM;
* with ``hop == win/2`` the reflect-padded signal viewed as
  ``[S, hop]`` rows gives frame *t* as ``concat(row_t, row_{t+1})``.
  Mosaic requires sublane-aligned dynamic indexing, so the kernel takes
  the row array twice — once shifted by one row — and every ``pl.ds``
  lands on a multiple of the 8-frame tile;
* ISTFT writes the two frame halves into separate aligned accumulators;
  the single shifted add that realizes the overlap-add happens in XLA
  right after the kernel (it fuses with the envelope divide).

Numerics match the XLA framed-matmul path in ``signal.stft`` (which
matches ``torch.stft``/``istft``).  The XLA path stays the default;
these kernels are the fused fast path of the framework's kernel layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prior_diffuse_tpu.signal.stft import _dft_matrices_np, hann_window

_TILE = 8  # frames per inner step (f32 sublane tile)


@functools.lru_cache(maxsize=4)
def _windowed_dft_np(fft_num: int):
    fwd, inv = _dft_matrices_np(fft_num)
    w = hann_window(fft_num).astype(np.float64)
    return (w[:, None] * fwd).astype(np.float32), inv.astype(np.float32)


def _stft_kernel(rows_a_ref, rows_b_ref, dft_ref, out_ref):
    """One padded utterance: first/second half rows [T_pad, hop] ->
    spectra [T_pad, 2F]."""
    n_tiles = out_ref.shape[0] // _TILE

    def body(i, _):
        t0 = pl.multiple_of(i * _TILE, _TILE)
        frames = jnp.concatenate(
            [rows_a_ref[pl.ds(t0, _TILE), :], rows_b_ref[pl.ds(t0, _TILE), :]],
            axis=1,
        )  # [TILE, 2*hop]
        out_ref[pl.ds(t0, _TILE), :] = jnp.dot(
            frames, dft_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)


def stft_pallas(x: jnp.ndarray, fft_num: int = 320, win_shift: int = 160,
                interpret: bool = False) -> jnp.ndarray:
    """Centered STFT ``[B, L] -> [B, T, F, 2]`` (same contract as
    ``signal.stft`` for win == fft == 2*hop)."""
    assert fft_num == 2 * win_shift
    b, length = x.shape
    if length <= fft_num // 2:
        raise ValueError("signal too short for centered STFT")
    num_frames = length // win_shift + 1
    t_pad = -(-num_frames // _TILE) * _TILE
    freq = fft_num // 2 + 1

    pad = fft_num // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    need = (t_pad + 1) * win_shift
    xp = jnp.pad(xp[:, :need], ((0, 0), (0, max(0, need - xp.shape[1]))))
    rows = xp.reshape(b, t_pad + 1, win_shift)
    rows_a = rows[:, :-1]  # frame t first half
    rows_b = rows[:, 1:]  # frame t second half

    fwd, _ = _windowed_dft_np(fft_num)
    fwd = jnp.asarray(fwd)

    out = pl.pallas_call(
        _stft_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, 2 * freq), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t_pad, win_shift), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, win_shift), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, t_pad, 2 * freq), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows_a, rows_b, fwd)
    out = out[:, :num_frames]
    return jnp.stack([out[..., :freq], out[..., freq:]], axis=-1)


def _istft_kernel(spec_ref, inv_ref, first_ref, second_ref):
    """One utterance: spectra [T_pad, 2F] -> per-frame windowed halves
    [T_pad, hop] x2 (overlap-add happens outside)."""
    t_pad = spec_ref.shape[0]
    hop = first_ref.shape[1]
    n_tiles = t_pad // _TILE

    def body(i, _):
        t0 = pl.multiple_of(i * _TILE, _TILE)
        frames = jnp.dot(spec_ref[pl.ds(t0, _TILE), :], inv_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # [TILE, 2*hop]
        first_ref[pl.ds(t0, _TILE), :] = frames[:, :hop]
        second_ref[pl.ds(t0, _TILE), :] = frames[:, hop:]
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)


def istft_pallas(spec: jnp.ndarray, length: int, fft_num: int = 320,
                 win_shift: int = 160, interpret: bool = False) -> jnp.ndarray:
    """Inverse of :func:`stft_pallas`; ``[B, T, F, 2] -> [B, length]``."""
    assert fft_num == 2 * win_shift
    b, num_frames, freq, _ = spec.shape
    t_pad = -(-num_frames // _TILE) * _TILE
    packed = jnp.concatenate([spec[..., 0], spec[..., 1]], axis=-1)
    packed = jnp.pad(packed, ((0, 0), (0, t_pad - num_frames), (0, 0)))

    _, inv = _windowed_dft_np(fft_num)
    w = hann_window(fft_num)
    inv_win = jnp.asarray(inv * w[None, :])  # synthesis window folded in

    first, second = pl.pallas_call(
        _istft_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, win_shift), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, win_shift), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t_pad, 2 * freq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, t_pad, win_shift), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, win_shift), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(packed, inv_win)

    # overlap-add: row r of the padded signal = first[r] + second[r-1]
    zeros = jnp.zeros((b, 1, win_shift), jnp.float32)
    acc = jnp.concatenate([first, zeros], axis=1) + jnp.concatenate(
        [zeros, second], axis=1
    )
    y = acc.reshape(b, (t_pad + 1) * win_shift)

    wsq = np.asarray(hann_window(fft_num), np.float64) ** 2
    env = np.zeros(((t_pad + 1) * win_shift,))
    w1, w2 = wsq[:win_shift], wsq[win_shift:]
    env[: num_frames * win_shift] += np.tile(w1, num_frames)
    env[win_shift : (num_frames + 1) * win_shift] += np.tile(w2, num_frames)
    env = np.where(np.abs(env) > 1e-11, env, 1.0)
    y = y / jnp.asarray(env, y.dtype)

    pad = fft_num // 2
    y = y[:, pad:]
    if length <= y.shape[-1]:
        return y[:, :length]
    return jnp.pad(y, ((0, 0), (0, length - y.shape[-1])))
