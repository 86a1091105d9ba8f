"""DiffUNet family: the dis prior and the residual DDPM denoiser.

Re-designs of the reference UNets:

* ``DiffUNet``  — non-time-conditioned prior (``model/diff.py:13-33``)
* ``DiffUNet1`` — residual DDPM denoiser eps_theta(x_t, x_init, t)
  with DiffWave sinusoidal time embedding and per-stage t-projections
  (``model/diff3.py:14-57``)
* ``Nocon``     — unconditional ablation: eps_theta(x_t, t)
  (``model/piror_grad.py:15-40``)

Topology: 5-stage bidirectional-cross-gated GLU conv encoder (stride
(1,2) in freq, causal in time), 3x TCM dilated conv1d stacks over the
flattened ``[B, T, 256]`` bottleneck, dual real/imag transposed-GLU
decoders with skip concats.  Layout ``[B, T, F=161, C] -> [B, T, 161, 2]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prior_diffuse_tpu.models import layers as tl
from prior_diffuse_tpu.registry import MODELS


class BiConvGLU(nn.Module):
    """Bidirectional cross-gated conv GLU (model/diff.py:231-250)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = tl.conv2d(32, (1, 1), name="conv1", dtype=dt)(x)
        # l and r read the same input: fuse into one MXU conv
        left, right = tl.conv_pair_fused(
            x,
            tl.ConvParams(32, self.kernel, 32, name="l")(),
            tl.ConvParams(32, self.kernel, 32, name="r")(),
            strides=self.strides,
            dtype=dt,
        )
        lmask = jax.nn.sigmoid(tl.conv2d(32, (1, 1), name="l_conv", dtype=dt)(left))
        rmask = jax.nn.sigmoid(tl.conv2d(32, (1, 1), name="r_conv", dtype=dt)(right))
        return tl.conv2d(self.features, (1, 1), name="conv2", dtype=dt)(
            left * rmask + right * lmask
        )


class BiConvTransGLU(nn.Module):
    """Transposed variant, optionally time-conditioned
    (model/diff.py:253-272 and model/diff3.py:329-351)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    time_cond: bool = False
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, t: Optional[jnp.ndarray] = None):
        dt = self.dtype
        if self.time_cond:
            tp = nn.Dense(x.shape[-1], name="tp", dtype=dt,
                          kernel_init=tl.torch_kernel_init)(t)
            x = x + tp[:, None, None, :].astype(x.dtype)
        x = tl.ConvTranspose2d(32, (1, 1), name="conv1", dtype=dt)(x)
        left, right = tl.conv_pair_fused(
            x,
            tl.ConvParams(32, self.kernel, 32, name="l")(),
            tl.ConvParams(32, self.kernel, 32, name="r")(),
            strides=self.strides,
            transpose=True,
            dtype=dt,
        )
        lmask = jax.nn.sigmoid(tl.ConvTranspose2d(32, (1, 1), name="l_conv", dtype=dt)(left))
        rmask = jax.nn.sigmoid(tl.ConvTranspose2d(32, (1, 1), name="r_conv", dtype=dt)(right))
        return tl.ConvTranspose2d(self.features, (1, 1), name="conv2", dtype=dt)(
            left * rmask + right * lmask
        )


class Residual(nn.Module):
    """Gated dilated conv1d residual block (model/diff.py:139-181).
    Input ``[B, T, 256]``."""

    dilation: int
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        bn = lambda name: tl.BatchNorm(use_running_average=not train,
                                       name=name, dtype=dt)
        skip = x
        x = tl.conv1d(64, 1, name="conv1", dtype=dt)(x)
        pad = 2 * self.dilation
        main = tl.PReLU(name="main_prelu")(x)
        main = bn("main_bn")(main)
        main = tl.conv1d(
            64, 5, dilation=self.dilation, padding=((pad, pad),),
            name="main_conv", dtype=dt,
        )(main)
        mask = tl.PReLU(name="mask_prelu")(x)
        mask = bn("mask_bn")(mask)
        mask = jax.nn.sigmoid(
            tl.conv1d(
                64, 5, dilation=self.dilation, padding=((pad, pad),),
                name="mask_conv", dtype=dt,
            )(mask)
        )
        x = main * mask
        x = tl.PReLU(name="out_prelu")(x)
        x = bn("out_bn")(x)
        x = tl.conv1d(256, 1, name="out_conv", dtype=dt)(x)
        return x + skip


class TCM(nn.Module):
    """Six dilated residual blocks, dilations 1..32 (model/diff.py:184-201)."""

    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i, d in enumerate([1, 2, 4, 8, 16, 32]):
            x = Residual(d, name=f"residual{i + 1}", dtype=self.dtype)(x, train)
        return x


_ENC_SPECS = [
    # (features, kernel)
    (64, (2, 5)),
    (64, (2, 3)),
    (64, (2, 3)),
    (64, (2, 3)),
    (64, (2, 3)),
]


class Encoder(nn.Module):
    """5-stage causal encoder; freq 161 -> 79 -> 39 -> 19 -> 9 -> 4.

    With ``time_cond`` each stage adds a Dense(512 -> C_in) projection
    of the t-embedding to the (already causally padded) input
    (model/diff3.py:144-165 — note the reference adds t after padding;
    we match that).
    """

    time_cond: bool = False
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, t, train: bool):
        dt = self.dtype
        skips = []
        for i, (feat, kernel) in enumerate(_ENC_SPECS):
            x = tl.pad_time_causal(x, 1)
            if self.time_cond:
                tp = nn.Dense(x.shape[-1], name=f"tp{i + 1}", dtype=dt,
                              kernel_init=tl.torch_kernel_init)(t)
                x = x + tp[:, None, None, :].astype(x.dtype)
            x = BiConvGLU(feat, kernel, (1, 2), name=f"conv{i + 1}", dtype=dt)(x)
            x = tl.BatchNorm(use_running_average=not train, name=f"bn{i + 1}",
                             dtype=dt)(x)
            x = tl.PReLU(name=f"prelu{i + 1}")(x)
            skips.append(x)
        return x, skips


class Decoder(nn.Module):
    """Real-or-imag decoder branch with skip concats and time chomp
    (model/diff.py:93-136, time-conditioned variant diff3.py:169-212)."""

    time_cond: bool = False
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, skips, t, train: bool):
        for i, skip in enumerate(reversed(skips)):
            last = i == len(skips) - 1
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = BiConvTransGLU(
                1 if last else 64,
                (2, 5) if last else (2, 3),
                (1, 2),
                time_cond=self.time_cond,
                name=f"de{len(skips) - i}",
                dtype=self.dtype,
            )(x, t)
            x = tl.chomp_time_end(x, 1)
            if not last:
                x = tl.BatchNorm(use_running_average=not train,
                                 name=f"bn{len(skips) - i}", dtype=self.dtype)(x)
                x = tl.PReLU(name=f"prelu{len(skips) - i}")(x)
        return x


class _UNetCore(nn.Module):
    """Shared encoder/TCM/decoder spine."""

    time_cond: bool = False
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, t, train: bool):
        x, skips = Encoder(self.time_cond, name="en", dtype=self.dtype)(x, t, train)
        b, tt, f, c = x.shape  # f=4, c=64
        # reference flatten order is c-major: [B, C, T, F] -> [B, C*F, T]
        flat = x.transpose(0, 1, 3, 2).reshape(b, tt, c * f)
        for i in range(3):
            flat = TCM(name=f"tcm{i + 1}", dtype=self.dtype)(flat, train)
        x = flat.reshape(b, tt, c, f).transpose(0, 1, 3, 2)
        real = Decoder(self.time_cond, name="de_real", dtype=self.dtype)(x, skips, t, train)
        imag = Decoder(self.time_cond, name="de_imag", dtype=self.dtype)(x, skips, t, train)
        return jnp.concatenate([real, imag], axis=-1)  # [B, T, 161, 2]


@MODELS.register("DiffUNet")
class DiffUNet(nn.Module):
    """Discriminative prior; ``[B, T, 161, 2] -> [B, T, 161, 2]``.

    ``dtype``: compute dtype (params stay f32) — pass ``jnp.bfloat16``
    for mixed-precision training/serving."""

    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _UNetCore(time_cond=False, name="core", dtype=self.dtype)(
            x, None, train)


@MODELS.register("DiffUNet1")
class DiffUNet1(nn.Module):
    """Residual DDPM denoiser eps_theta(x_t, x_init, t).

    ``x_t``, ``x_init``: ``[B, T, 161, 2]``; ``t``: ``[B]`` float
    (fractional timesteps from the fast schedule) or int.
    """

    num_steps: int = 50
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, x_init, t, train: bool = False):
        x = tl.conv2d(2, (1, 1), name="preprocess", dtype=self.dtype)(
            jnp.concatenate([x, x_init.astype(x.dtype)], axis=-1)
        )
        temb = tl.TimeEmbedding(self.num_steps, name="time_embedding")(t)
        if self.dtype is not None:
            temb = temb.astype(self.dtype)
        return _UNetCore(time_cond=True, name="core", dtype=self.dtype)(
            x, temb, train)


@MODELS.register("Nocon")
class Nocon(nn.Module):
    """Unconditional denoiser eps_theta(x_t, t) for the deltamu ablation."""

    num_steps: int = 50
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        temb = tl.TimeEmbedding(self.num_steps, name="time_embedding")(t)
        if self.dtype is not None:
            temb = temb.astype(self.dtype)
        return _UNetCore(time_cond=True, name="core", dtype=self.dtype)(
            x, temb, train)
