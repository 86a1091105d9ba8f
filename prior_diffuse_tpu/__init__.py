"""Prior-DiffuSE TPU: a TPU-native speech-enhancement framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
Prior-DiffuSE reference (complex-spectrogram speech enhancement with a
discriminative prior + residual DDPM refiner), built for TPU hardware:

* static shapes everywhere, whole reverse sampler as one ``lax.scan``
* STFT/ISTFT as MXU-friendly framed matmuls (plus Pallas kernels)
* functional models (flax.linen) with explicit PRNG threading
* data-parallel training over a ``jax.sharding.Mesh``

Layout convention: complex spectra are real-packed **channels-last**
``[B, T, F, 2]`` (the reference uses ``[B, 2, T, F]``; see
``prior_diffuse_tpu.signal.stft`` docstrings for the mapping).
"""

__version__ = "0.1.0"

from prior_diffuse_tpu import registry  # noqa: F401
