"""Reverse DDPM sampling as a single ``lax.scan``.

The reference runs a Python loop of 6 (fast) or 50 denoiser calls per
batch (``trainer/complex_ddpm_trainer.py:462-489``).  Here the whole
loop compiles into one scan over precomputed per-step constants, so the
sampler is one XLA computation: no per-step dispatch, weights stay
resident, and XLA can overlap steps' DMA/compute.

Faithful quirks (kept deliberately, see SURVEY section 2.9):
  * ``gamma[0]`` overridden to 0.2 and step 0 adds no noise;
  * ``new_sigma = max(0, gamma - c1*gamma)`` is identically 0 because
    ``c1 = 1/sqrt(alpha) >= 1`` — the sampler is deterministic.  We
    still draw and mix the noise so behavior tracks the reference if a
    schedule with c1 < 1 is ever configured.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prior_diffuse_tpu.diffusion.schedule import InferenceSchedule

# model_fn(x_t, t_continuous[B]) -> predicted noise, with any
# conditioning (x_init / noisy feat) closed over.
ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def reverse_sample(
    model_fn: ModelFn,
    rng: jax.Array,
    x_init: Optional[jnp.ndarray],
    shape,
    sched: InferenceSchedule,
    mode: str = "pirorgrad",
    sig_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    unroll: int = 0,
    n_avg: int = 1,
    zero_init: bool = False,
    predict: str = "eps",
) -> jnp.ndarray:
    """Run the full reverse chain; returns the residual/sample estimate.

    * ``pirorgrad``: starts from N(0, I), adds ``x_init`` at the end.
    * ``deltamu``: starts from N(x_init, I), no final add.
    * ``conditional``: starts from N(0, I), no final add (conditioning
      is inside ``model_fn``).

    ``sig_mask``: PriorGrad per-bin scale; multiplies both the initial
    draw and every per-step noise by ``sqrt(mask)``.

    ``n_avg`` (framework extension, no reference counterpart): average
    ``n_avg`` independent reverse chains (vmapped — one compiled
    computation, MXU-parallel).  The reference's deterministic sampler
    maps the *random* initial draw to a sample of the model's residual
    marginal; on residuals that are weakly predictable from the
    conditioning, that sample is uncorrelated with the true residual
    and the chain's MSE floor is ``(1+abar)x`` the prior's even for a
    training-optimal model (``abar = prod(1-beta_inference)``; see
    docs/residual_capability_r3.md and tests/test_sampler_theory.py).
    Averaging N chains keeps the predictable component and shrinks the
    random component's energy by 1/N, approximating the posterior mean
    E[residual | conditioning] — harmless when nothing is predictable,
    and a strict improvement whenever anything is.  Default 1 preserves
    exact reference semantics.

    ``zero_init`` (framework extension, no reference counterpart):
    start the reverse chain from the *mean* of the initial distribution
    (zeros; ``x_init`` in deltamu mode) instead of a random draw — the
    ``n_avg -> inf`` limit of an affine chain at 1x cost.  For the
    training-optimal denoiser of a Gaussian residual the deterministic
    chain is exactly affine, ``out = sqrt(abar)*x_T + (1-abar)*m``
    (``abar = prod(1-beta_inference)``; pinned by
    tests/test_sampler_theory.py), so zeroing ``x_T`` removes the whole
    unpredictable component: chain MSE ``abar^2*e_m + e_u`` <= prior
    MSE ``e_m + e_u`` for every split — never worse than prior-only at
    the optimum, strictly better whenever anything is predictable.
    Caveat (measured, docs/residual_capability_r3.md E8): a *real*
    non-affine net sees an off-manifold all-zeros input at the first
    step and can emit junk — on the CPU mini demo zero_init scored
    approx-PESQ 1.28 vs 1.84 for the sample chain and 1.87 prior-only,
    while n_avg=8 (which stays in-distribution) was the best chain
    variant.  Prefer ``n_avg`` unless the denoiser is known to be
    near its affine optimum.

    ``predict`` (framework extension, no reference counterpart):
    ``"eps"`` treats ``model_fn``'s output as the predicted noise
    (reference semantics, ``trainer/complex_ddpm_trainer.py:479``);
    ``"x0"`` treats it as a direct prediction of the chain's clean-side
    target and converts per step with
    ``eps = (x_t - sqrt(ab_n) * x0_hat) / sqrt(1 - ab_n)`` using the
    inference schedule's own ``alpha_cum`` (the same constants the
    update's ``c2`` is built from), leaving the update identical.  See
    ``DiffusionConfig.predict`` for when this matters.
    """
    if predict not in ("eps", "x0"):
        raise ValueError(f"unknown predict parameterization {predict!r}")
    if zero_init:
        n_avg = 1  # all chains identical once the initial draw is fixed
    if n_avg > 1:
        # averaging commutes with the (linear) final x_init add, so each
        # vmapped member runs the full chain including it
        chains = jax.vmap(
            lambda r: reverse_sample(
                model_fn, r, x_init, shape, sched, mode, sig_mask,
                dtype, unroll, predict=predict
            )
        )(jax.random.split(rng, n_avg))
        return jnp.mean(chains, axis=0)
    init_rng, scan_rng = jax.random.split(rng)
    if zero_init:
        x = jnp.zeros(shape, dtype)
    else:
        x = jax.random.normal(init_rng, shape, dtype)
        if sig_mask is not None:
            x = x * jnp.sqrt(sig_mask)
    if mode == "deltamu":
        x = x + x_init

    n_steps = sched.num_steps
    batch = shape[0]
    # scan runs n = N-1 .. 0
    order = jnp.arange(n_steps - 1, -1, -1)
    # With the reference schedule new_sigma is identically 0 (c1 >= 1,
    # SURVEY 2.9) — the per-step noise would be drawn and multiplied by
    # zero.  The schedule is host data, so detect that at trace time and
    # skip the 6 threefry draws entirely; behavior is bit-identical.
    noiseless = bool((np.abs(np.asarray(sched.new_sigma)) < 1e-30).all())
    consts = {
        "c1": jnp.asarray(sched.c1, dtype)[order],
        "c2": jnp.asarray(sched.c2, dtype)[order],
        "T": jnp.asarray(sched.T, dtype)[order],
    }
    if predict == "x0":
        # Derive in f64 host numpy and cast only the FINAL values: bf16
        # has 8 mantissa bits, so alpha_cum > ~0.996 rounds to exactly
        # 1.0 if cast first, making 1/sqrt(1-abar) inf and the chain
        # NaN at every schedule except fast-2 (round-4 confirmed bug).
        # The final constants themselves are benign in any dtype
        # (1/sqrt(1-0.9999) = 100.0 is exactly bf16-representable).
        ab = np.asarray(sched.alpha_cum, np.float64)
        consts["sqrt_ab"] = jnp.asarray(np.sqrt(ab), dtype)[order]
        consts["rsqrt_1mab"] = jnp.asarray(
            1.0 / np.sqrt(1.0 - ab), dtype
        )[order]
    if not noiseless:
        consts.update({
            "new_sigma": jnp.asarray(sched.new_sigma, dtype)[order],
            "is_last": (order == 0),
            "rngs": jax.random.split(scan_rng, n_steps),
        })

    def step(x, c):
        t_vec = jnp.full((batch,), c["T"], dtype)
        out = model_fn(x, t_vec)
        if predict == "x0":
            eps = (x - c["sqrt_ab"] * out) * c["rsqrt_1mab"]
        else:
            eps = out
        x = c["c1"] * (x - c["c2"] * eps)
        if not noiseless:
            noise = jax.random.normal(c["rngs"], shape, dtype)
            if sig_mask is not None:
                noise = noise * jnp.sqrt(sig_mask)
            # step n=0 adds no noise (reference: `if n > 0`)
            x = jnp.where(c["is_last"], x, x + c["new_sigma"] * noise)
        return x, None

    # unroll > 1 trades code size for cross-step fusion/pipelining
    # headroom.  0 = auto: fully unroll short (fast-T) schedules —
    # measured 7% win on the 6-step bf16 enhance chain (46.9 vs
    # 50.6 ms/batch-8, docs/PERF_r3.json enhance_bf16_unroll6_ms) —
    # but keep the rolled scan for long (full-T) schedules, where
    # unrolling only bloats compile time on this remote-compile stack.
    if unroll == 0:
        unroll = n_steps if n_steps <= 8 else 1
    x, _ = jax.lax.scan(step, x, consts, unroll=unroll)
    if mode == "pirorgrad":
        x = x + x_init
    return x
