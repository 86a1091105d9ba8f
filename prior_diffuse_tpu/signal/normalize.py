"""Waveform-level normalization.

The reference RMS-normalizes each utterance in the collate function:
``c = sqrt(len(x) / sum(x^2))``; both noisy and clean are scaled by the
*noisy* ``c`` (``utils/dataset.py:45-50``), and inference divides by the
reciprocal ``c = sqrt(sum/len)`` (``trainer/complex_ddpm_trainer.py:922``)
— the same operation.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray]


def rms_scale(x: Array, eps: float = 0.0) -> Array:
    """``c`` such that ``x * c`` has unit RMS: ``sqrt(len / sum(x^2))``."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    denom = xp.sum(x.astype(xp.float64 if xp is np else jnp.float32) ** 2, axis=-1)
    n = x.shape[-1]
    return xp.sqrt(n / (denom + eps))


def rms_normalize(noisy: Array, clean: Array) -> Tuple[Array, Array, Array]:
    """Scale the (noisy, clean) pair by the noisy RMS factor.

    Returns ``(noisy*c, clean*c, c)``.
    """
    c = rms_scale(noisy)
    return noisy * c, clean * c, c
