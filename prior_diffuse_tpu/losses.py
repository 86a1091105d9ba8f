"""Masked spectral losses.

Re-designs of the reference's loss zoo (``utils/loss.py:10-113``) for
static shapes: instead of building a ragged mask list with
``pad_sequence`` per call, the valid-frame mask is computed from a
``frame_nums [B]`` int array with ``arange < n`` — identical values,
jit-friendly.

Layout: complex spectra are channels-last ``[B, T, F, 2]``; magnitude
tensors are ``[B, T, F]``.  Normalizers match the reference exactly:
masks are ones over the *full* frequency axis for ``frame_nums[i]``
frames, so ``mask.sum() == sum(frame_nums) * F`` (and twice that for
the complex losses).
"""

from __future__ import annotations

import jax.numpy as jnp

from prior_diffuse_tpu.registry import LOSSES


def frame_mask(frame_nums: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """``[B, T]`` 0/1 mask of valid frames (reference mask semantics)."""
    t = jnp.arange(num_frames)[None, :]
    return (t < frame_nums[:, None]).astype(jnp.float32)


def _mag_mask(esti: jnp.ndarray, frame_nums: jnp.ndarray) -> jnp.ndarray:
    # [B, T, 1] broadcast over F — equals the reference's [B, T, F] of ones
    return frame_mask(frame_nums, esti.shape[1])[..., None]


@LOSSES.register("mag_mse_loss")
def mag_mse_loss(esti, label, frame_nums):
    """Masked MSE on magnitude ``[B, T, F]`` (utils/loss.py:10-19)."""
    m = _mag_mask(esti, frame_nums)
    num = jnp.sum(((esti - label) * m) ** 2)
    den = jnp.sum(m) * esti.shape[-1]
    return num / den


@LOSSES.register("mag_mae_loss")
def mag_mae_loss(esti, label, frame_nums):
    """Masked MAE on magnitude (utils/loss.py:22-31)."""
    m = _mag_mask(esti, frame_nums)
    num = jnp.sum(jnp.abs((esti - label) * m))
    den = jnp.sum(m) * esti.shape[-1]
    return num / den


@LOSSES.register("com_mse_loss")
def com_mse_loss(esti, label, frame_nums):
    """Masked MSE on real-packed complex ``[B, T, F, 2]``
    (utils/loss.py:34-44; DDPM + GCRN default loss)."""
    m = _mag_mask(esti[..., 0], frame_nums)[..., None]  # [B, T, 1, 1]
    num = jnp.sum(((esti - label) * m) ** 2)
    den = 2.0 * jnp.sum(m) * esti.shape[-2]
    return num / den


@LOSSES.register("com_mse_sigma_loss")
def com_mse_sigma_loss(esti, label, frame_nums, sigma_mask):
    """PriorGrad Mahalanobis-weighted complex MSE (utils/loss.py:46-56):
    error squared divided once by the per-bin ``sigma_mask``."""
    m = _mag_mask(esti[..., 0], frame_nums)[..., None]
    d = (esti - label) * m
    num = jnp.sum(d * d / sigma_mask)
    den = 2.0 * jnp.sum(m) * esti.shape[-2]
    return num / den


@LOSSES.register("com_mag_mse_loss")
def com_mag_mse_loss(esti, label, frame_nums):
    """0.5 * (complex MSE + magnitude MSE) (utils/loss.py:59-71);
    GCRN / DB-AIAT config loss."""
    m = _mag_mask(esti[..., 0], frame_nums)  # [B, T, 1]
    freq = esti.shape[-2]
    m4 = m[..., None]
    loss1 = jnp.sum(((esti - label) * m4) ** 2) / (2.0 * jnp.sum(m) * freq)
    mag_e = jnp.linalg.norm(esti, axis=-1)
    mag_l = jnp.linalg.norm(label, axis=-1)
    loss2 = jnp.sum(((mag_e - mag_l) * m) ** 2) / (jnp.sum(m) * freq)
    return 0.5 * (loss1 + loss2)


def l1_loss(esti, label):
    """Plain mean absolute error (the reference's ``nn.L1Loss`` used as
    ``loss_fn_eva``, trainer/complex_ddpm_trainer.py:39)."""
    return jnp.mean(jnp.abs(esti - label))


@LOSSES.register("pesq_loss")
def pesq_loss(esti, label, frame_nums, feat_type: str = "sqrt") -> float:
    """``4.5 - mean PESQ`` over the batch (utils/loss.py:74-113).

    Host-side and non-differentiable, exactly like the reference (whose
    version runs under ``no_grad``): de-compress, ISTFT, trim to
    ``(frames-1)*hop``, score wideband PESQ per utterance.  Runs in any
    available PESQ regime (real binding, or the labeled approximation
    via ``PDT_APPROX_PESQ=1``); raises when no backend exists.
    """
    import numpy as np

    from prior_diffuse_tpu.metrics.compare import spec_batch_to_wavs
    from prior_diffuse_tpu.metrics.pesq import pesq_mode, pesq_score

    if pesq_mode() == "absent":
        raise ImportError(
            "pesq_loss requires a PESQ backend (the optional `pesq` "
            "package, or PDT_APPROX_PESQ=1 for the labeled approximation)"
        )
    esti_wavs = spec_batch_to_wavs(esti, list(np.asarray(frame_nums)), feat_type)
    label_wavs = spec_batch_to_wavs(label, list(np.asarray(frame_nums)), feat_type)
    scores = []
    for c, p in zip(label_wavs, esti_wavs):
        s = pesq_score(c, p, 16000)
        if s is not None:  # PESQ errors are swallowed per-utterance
            scores.append(s)
    return 4.5 - float(np.mean(scores))
