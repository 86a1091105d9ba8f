"""Magnitude compression / decompression of complex spectra.

The reference compresses spectrogram magnitude before the models and
decompresses before ISTFT (four modes, duplicated across trainers —
``trainer/complex_ddpm_trainer.py:640-663`` forward and
``utils/metrics.py:534-548`` inverse):

  normal: mag          (phase re-projection only)
  sqrt:   mag ** 0.5   <->  mag ** 2
  cubic:  mag ** 0.3   <->  mag ** (10/3)
  log_1x: log(1+mag)   <->  exp(mag) - 1
  other:  identity (no re-projection)

All functions act on channels-last real-packed spectra ``[..., F, 2]``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

FEAT_TYPES = ("normal", "sqrt", "cubic", "log_1x")


def mag_phase(spec: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Magnitude and phase of a real-packed spectrum ``[..., 2]``."""
    re, im = spec[..., 0], spec[..., 1]
    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    return mag, phase


def from_mag_phase(mag: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)


def _compress_mag(mag: jnp.ndarray, feat_type: str) -> jnp.ndarray:
    if feat_type == "normal":
        return mag
    if feat_type == "sqrt":
        return jnp.sqrt(mag)
    if feat_type == "cubic":
        return mag**0.3
    if feat_type == "log_1x":
        return jnp.log1p(mag)
    raise ValueError(f"unknown feat_type {feat_type!r}")


def _decompress_mag(mag: jnp.ndarray, feat_type: str) -> jnp.ndarray:
    if feat_type == "normal":
        return mag
    if feat_type == "sqrt":
        return mag**2
    if feat_type == "cubic":
        return mag ** (10.0 / 3.0)
    if feat_type == "log_1x":
        return jnp.exp(mag) - 1.0
    raise ValueError(f"unknown feat_type {feat_type!r}")


def compress_spec(spec: jnp.ndarray, feat_type: str = "sqrt") -> jnp.ndarray:
    """Compress magnitude, keep phase (identity for unknown feat types,
    mirroring the reference's fall-through)."""
    if feat_type not in FEAT_TYPES:
        return spec
    mag, phase = mag_phase(spec)
    return from_mag_phase(_compress_mag(mag, feat_type), phase)


def decompress_spec(spec: jnp.ndarray, feat_type: str = "sqrt") -> jnp.ndarray:
    """Inverse of :func:`compress_spec` (up to phase of zero-mag bins)."""
    if feat_type not in FEAT_TYPES:
        return spec
    mag, phase = mag_phase(spec)
    return from_mag_phase(_decompress_mag(mag, feat_type), phase)
