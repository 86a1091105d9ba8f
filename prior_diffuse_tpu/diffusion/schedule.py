"""Noise-schedule math.

Precomputes every per-step constant the sampler needs on the host
(numpy, float64) so the device-side reverse loop is a single
``lax.scan`` over stacked constants.

Matches the reference exactly:

* training ``beta``/``alpha_bar`` — ``trainer/complex_ddpm_trainer.py:42-44``
* ``inference_schedule()`` incl. the DiffWave fast-sampling continuous
  timestep alignment ``T[s]`` — ``trainer/complex_ddpm_trainer.py:105-156``
* the reference's n=0 quirk (``sigmas[0]`` computed with
  ``alpha_cum[-1]`` via Python index wrap-around, line 127-128) is kept
  bit-for-bit: it is masked in practice because ``gamma[0]`` is
  overridden to 0.2 (line 460) and step 0 adds no noise.
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np

from prior_diffuse_tpu.config import DiffusionConfig


@dataclass(frozen=True)
class DiffusionSchedule:
    """Training-time constants."""

    beta: np.ndarray  # [S]
    alpha_bar: np.ndarray  # cumprod(1 - beta), the reference's noise_level

    @property
    def num_steps(self) -> int:
        return len(self.beta)


@dataclass(frozen=True)
class InferenceSchedule:
    """Reverse-sampling constants, stacked per step.

    Arrays are indexed by schedule position ``n`` (0..N-1); the sampler
    iterates n = N-1 .. 0.
    """

    alpha: np.ndarray
    beta: np.ndarray
    alpha_cum: np.ndarray
    sigmas: np.ndarray  # sqrt(beta_tilde), with the reference n=0 quirk
    T: np.ndarray  # continuous timesteps aligned to the training grid
    gamma: np.ndarray  # sigmas with gamma[0] overridden (default 0.2)
    c1: np.ndarray  # 1 / sqrt(alpha)
    c2: np.ndarray  # beta / sqrt(1 - alpha_cum)
    new_sigma: np.ndarray  # max(0, gamma - c1*gamma); 0 when c1 >= 1

    @property
    def num_steps(self) -> int:
        return len(self.alpha)


def make_schedule(cfg: DiffusionConfig) -> DiffusionSchedule:
    beta = np.asarray(cfg.noise_schedule, dtype=np.float64)
    return DiffusionSchedule(beta=beta, alpha_bar=np.cumprod(1.0 - beta))


def inference_schedule(
    cfg: DiffusionConfig, fast_sampling: bool | None = None
) -> InferenceSchedule:
    """Compute reverse-sampling constants (fast or full schedule)."""
    if fast_sampling is None:
        fast_sampling = cfg.fast_sampling
    training = np.asarray(cfg.noise_schedule, dtype=np.float64)
    inference = (
        np.asarray(cfg.inference_noise_schedule, dtype=np.float64)
        if fast_sampling
        else training
    )

    talpha = 1.0 - training
    talpha_cum = np.cumprod(talpha)

    beta = inference
    alpha = 1.0 - beta
    alpha_cum = np.cumprod(alpha)

    # sqrt(beta_tilde); n=0 intentionally wraps to alpha_cum[-1] (reference
    # quirk, see module docstring).
    sigmas = np.zeros_like(alpha)
    for n in range(len(alpha) - 1, -1, -1):
        sigmas[n] = (
            (1.0 - alpha_cum[n - 1]) / (1.0 - alpha_cum[n]) * beta[n]
        ) ** 0.5

    # continuous timestep alignment onto the training grid
    T = []
    for s in range(len(inference)):
        for t in range(len(training) - 1):
            if talpha_cum[t + 1] <= alpha_cum[s] <= talpha_cum[t]:
                twiddle = (talpha_cum[t] ** 0.5 - alpha_cum[s] ** 0.5) / (
                    talpha_cum[t] ** 0.5 - talpha_cum[t + 1] ** 0.5
                )
                T.append(t + twiddle)
                break
    T = np.asarray(T, dtype=np.float32)
    if len(T) != len(inference):
        raise ValueError(
            "inference schedule does not embed into the training schedule: "
            f"aligned {len(T)} of {len(inference)} steps"
        )

    gamma = sigmas.copy()
    gamma[0] = cfg.gamma0_override

    c1 = 1.0 / np.sqrt(alpha)
    c2 = beta / np.sqrt(1.0 - alpha_cum)
    new_sigma = np.maximum(0.0, gamma - c1 * gamma)

    return InferenceSchedule(
        alpha=alpha,
        beta=beta,
        alpha_cum=alpha_cum,
        sigmas=sigmas,
        T=T,
        gamma=gamma,
        c1=c1,
        c2=c2,
        new_sigma=new_sigma,
    )
