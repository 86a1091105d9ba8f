"""Forward diffusion (q-sample) and the PriorGrad sigma mask.

Mirrors the training-time noising block of
``trainer/complex_ddpm_trainer.py:707-733`` in our channels-last
``[B, T, F, 2]`` layout, with explicit PRNG threading.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sigma_mask(x_init: jnp.ndarray) -> jnp.ndarray:
    """Per-bin data-dependent noise scale in ``[0.5, 1]``.

    ``mask = |x_init| / max_{T,F}|x_init| / 2 + 0.5`` with the max taken
    per (batch, channel) — the reference flattens ``[B, 2, T, F]`` from
    dim 2 and maxes over it (``trainer/complex_ddpm_trainer.py:712-716``),
    i.e. over (T, F) per channel.
    """
    a = jnp.abs(x_init)
    # tiny floor: all-zero (padded) batch rows would otherwise yield 0/0
    m = jnp.maximum(jnp.max(a, axis=(1, 2), keepdims=True), 1e-12)
    return a / m / 2.0 + 0.5


def q_sample(
    rng: jax.Array,
    clean: jnp.ndarray,
    x_init: Optional[jnp.ndarray],
    alpha_bar: jnp.ndarray,
    num_steps: int,
    mode: str = "pirorgrad",
    sig_mask: Optional[jnp.ndarray] = None,
    t_grid: Optional[jnp.ndarray] = None,
    ab_grid: Optional[jnp.ndarray] = None,
    leak_drop: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw ``t``, ``eps`` and build ``x_t``.

    Returns ``(x_t, noise, t)`` where ``t`` is int32 ``[B]`` (or float32
    when drawn from ``t_grid``).

    modes (trainer/complex_ddpm_trainer.py:720-733):
      * ``pirorgrad``: x_t = sqrt(ab_t)*(clean - x_init) + sqrt(1-ab_t)*eps
      * ``deltamu``:   x_t = sqrt(ab_t)*clean + sqrt(1-ab_t)*(eps + x_init)
      * ``conditional``: x_t = sqrt(ab_t)*clean + sqrt(1-ab_t)*eps

    When ``sig_mask`` is given the noise is scaled by ``sqrt(mask)``
    before mixing (PriorGrad, lines 712-717) — note the *returned*
    noise is the scaled one, which is also the regression target.

    ``t_grid``/``ab_grid`` (framework extension, no reference
    counterpart): when given, ``t`` is drawn uniformly from these
    aligned (timestep, alpha_bar) pairs instead of the full integer
    grid — pass the fast inference schedule's ``(T, alpha_cum)`` to
    concentrate training exactly on the noise levels the fast sampler
    queries (``DiffusionConfig.train_t_fast``).

    ``leak_drop`` (framework extension, ``DiffusionConfig.x0_leak_drop``):
    with this probability per sample, the *signal* term of ``x_t`` (the
    residual in pirorgrad mode, the clean spectrum in conditional mode)
    is zeroed while the regression target is left untouched — closing
    the x0 objective's identity leak (the net can no longer read the
    target out of its own input at large alpha_bar).  The drop is hard
    (scale 0), not a soft attenuation: the sampler's per-step
    conversion ``eps = (x - sqrt(ab)*x0_hat)/sqrt(1-ab)`` assumes
    ``x0_hat`` estimates the signal at FULL scale, and a net trained on
    partially attenuated signal is miscalibrated against it — the
    closed-form affine optimum under soft U[0,1) attenuation runs a
    chain *worse than the prior* (pinned by
    tests/test_sampler_theory.py::test_leak_drop_soft_attenuation_is_miscalibrated),
    while the hard-drop p=1 optimum ignores ``x_t``, emits the
    posterior-mean residual exactly (mean-collapse law) and strictly
    dominates both the prior and the reference chain whenever any
    residual is predictable.  0.0 = reference semantics, bitwise
    identical PRNG stream.
    """
    if leak_drop > 0.0:
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
    else:
        t_rng, n_rng = jax.random.split(rng)
    batch = clean.shape[0]
    if t_grid is not None:
        idx = jax.random.randint(t_rng, (batch,), 0, len(t_grid))
        t = t_grid.astype(jnp.float32)[idx]
        ab = ab_grid.astype(clean.dtype)[idx].reshape(batch, 1, 1, 1)
    else:
        t = jax.random.randint(t_rng, (batch,), 0, num_steps)
        ab = alpha_bar.astype(clean.dtype)[t].reshape(batch, 1, 1, 1)
    noise = jax.random.normal(n_rng, clean.shape, clean.dtype)
    if sig_mask is not None:
        noise = noise * jnp.sqrt(sig_mask)

    if leak_drop > 0.0:
        if mode == "deltamu":
            raise ValueError("leak_drop is unsupported in deltamu mode")
        dropped = jax.random.bernoulli(d_rng, leak_drop, (batch,))
        sig_scale = jnp.where(dropped, 0.0, 1.0).astype(clean.dtype)
        sig_scale = sig_scale.reshape(batch, 1, 1, 1)
    else:
        sig_scale = None

    if mode == "pirorgrad":
        signal = clean - x_init
        if sig_scale is not None:
            signal = signal * sig_scale
        x_t = jnp.sqrt(ab) * signal + jnp.sqrt(1.0 - ab) * noise
    elif mode == "deltamu":
        x_t = jnp.sqrt(ab) * clean + jnp.sqrt(1.0 - ab) * (noise + x_init)
    elif mode == "conditional":
        signal = clean if sig_scale is None else clean * sig_scale
        x_t = jnp.sqrt(ab) * signal + jnp.sqrt(1.0 - ab) * noise
    else:
        raise ValueError(f"unknown diffusion mode {mode!r}")
    return x_t, noise, t
