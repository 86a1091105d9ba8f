"""DiffWave — waveform-domain diffusion denoiser (legacy family).

Re-design of the reference's importable-but-unused DiffWave
(``model/diff2.py:12-52``): 1-D residual dilated-conv diffusion net
conditioned on ``x_init`` through the *shared* input projection (the
spectrogram upsampler path is bypassed, lines 37-41).

The reference would actually crash if constructed (its ``params``
AttrDict lacks ``residual_channels`` etc.), so the hyper-parameters
here are explicit constructor fields with the DiffWave-paper defaults.

Layout: waveforms ``[B, L] -> [B, L]``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from prior_diffuse_tpu.models import layers as tl
from prior_diffuse_tpu.registry import MODELS


class ResidualBlock(nn.Module):
    """(model/diff2.py:114-158, default single-output-projection path)."""

    residual_channels: int = 64
    dilation: int = 1

    @nn.compact
    def __call__(self, x, conditioner, t):
        c = self.residual_channels
        diff = nn.Dense(c, name="diffusion_projection")(t)[:, None, :]
        cond = tl.conv1d(
            2 * c, 3, dilation=self.dilation,
            padding=((self.dilation, self.dilation),),
            name="conditioner_projection",
        )(conditioner)
        y = x + diff
        y = (
            tl.conv1d(
                2 * c, 3, dilation=self.dilation,
                padding=((self.dilation, self.dilation),),
                name="dilated_conv",
            )(y)
            + cond
        )
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = tl.conv1d(2 * c, 1, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


@MODELS.register("DiffWave")
class DiffWave(nn.Module):
    residual_channels: int = 64
    residual_layers: int = 30
    dilation_cycle_length: int = 10
    num_steps: int = 50

    @nn.compact
    def __call__(self, audio, audio_init, t, train: bool = False):
        c = self.residual_channels
        in_proj = tl.conv1d(c, 1, name="input_projection")  # shared for both
        x = jax.nn.relu(in_proj(audio[..., None]))
        cond = jax.nn.relu(in_proj(audio_init[..., None]))
        temb = tl.TimeEmbedding(self.num_steps, name="diffusion_embedding")(t)

        skips = []
        for i in range(self.residual_layers):
            x, skip = ResidualBlock(
                c, 2 ** (i % self.dilation_cycle_length), name=f"res{i}"
            )(x, cond, temb)
            skips.append(skip)
        x = sum(skips) / math.sqrt(len(skips))
        x = jax.nn.relu(tl.conv1d(c, 1, name="skip_projection")(x))
        x = tl.conv1d(1, 1, name="output_projection")(x)
        return x[..., 0]
