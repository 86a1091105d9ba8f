"""GCRN — conv-GLU recurrent encoder-decoder prior.

Re-design of the reference GCRN (``model/gcrn.py:87-166``): five
GLU-gated conv2d stages (2->16->32->64->128->256 channels, stride (1,2)
in frequency), a grouped 2-layer LSTM bottleneck (GLSTM,
``model/gcrn.py:6-40``), dual real/imag decoders with U-Net skip
concats, per-branch final Dense(161).

Layout: ``[B, T, F, 2] -> [B, T, F, 2]`` (channels-last).  The GLSTM
bottleneck flattens (C, F) in reference order (c-major) so a future
weight transplant keeps feature identity.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from prior_diffuse_tpu.models import layers as tl
from prior_diffuse_tpu.registry import MODELS

ELU = jax.nn.elu


class GluConv2d(nn.Module):
    """Two parallel convs, one sigmoid-gated (model/gcrn.py:43-61)."""

    features: int
    kernel: tuple = (1, 3)
    strides: tuple = (1, 2)
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):
        a, g = tl.conv_pair_fused(
            x,
            tl.ConvParams(self.features, self.kernel, x.shape[-1], name="conv1")(),
            tl.ConvParams(self.features, self.kernel, x.shape[-1], name="conv2")(),
            strides=self.strides,
            dtype=self.dtype,
        )
        return a * jax.nn.sigmoid(g)


class GluConvTranspose2d(nn.Module):
    """Gated transposed conv (model/gcrn.py:64-84)."""

    features: int
    kernel: tuple = (1, 3)
    strides: tuple = (1, 2)
    output_padding: tuple = (0, 0)
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):
        a, g = tl.conv_pair_fused(
            x,
            tl.ConvParams(self.features, self.kernel, x.shape[-1], name="conv1")(),
            tl.ConvParams(self.features, self.kernel, x.shape[-1], name="conv2")(),
            strides=self.strides,
            transpose=True,
            output_padding=self.output_padding,
            dtype=self.dtype,
        )
        return a * jax.nn.sigmoid(g)


class GLSTM(nn.Module):
    """Grouped 2-layer LSTM bottleneck (model/gcrn.py:6-40).

    Input ``[B, T, F, C]``; flattens (C, F) c-major to ``hidden`` wide,
    runs ``groups`` parallel LSTMs per layer with an interleaving
    shuffle + LayerNorm between layers, and restores the (C, F) grid.
    """

    hidden: int = 1024
    groups: int = 2

    @nn.compact
    def __call__(self, x):
        b, t, f, c = x.shape
        gh = self.hidden // self.groups
        # reference order: [B, C, T, F] -> [B, T, C*F] (c-major)
        out = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)

        chunks = jnp.split(out, self.groups, axis=-1)
        outs = [tl.LSTM(gh, name=f"lstm1_{i}")(chunks[i]) for i in range(self.groups)]
        # torch: stack(dim=-1) then flatten -> interleaves the groups
        out = jnp.stack(outs, axis=-1).reshape(b, t, self.hidden)
        out = tl.LayerNorm(name="ln1")(out)

        chunks = jnp.split(out, self.groups, axis=-1)
        outs = [tl.LSTM(gh, name=f"lstm2_{i}")(chunks[i]) for i in range(self.groups)]
        out = jnp.concatenate(outs, axis=-1)
        out = tl.LayerNorm(name="ln2")(out)

        return out.reshape(b, t, c, f).transpose(0, 1, 3, 2)


class _Decoder(nn.Module):
    """One real-or-imag GCRN decoder branch with skip concats.

    Matches model/gcrn.py:150-160: ``elu(cat(bn(convT(x)), skip))`` —
    the ELU is applied after concatenation, i.e. to the skip as well.
    """

    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, skips, train: bool):
        e1, e2, e3, e4 = skips
        dt = self.dtype
        bn = lambda name: tl.BatchNorm(use_running_average=not train,
                                       name=name, dtype=dt)
        cat = lambda a, b: jnp.concatenate([a, b.astype(a.dtype)], axis=-1)
        d = GluConvTranspose2d(128, name="conv5_t", dtype=dt)(x)
        d = ELU(cat(bn("bn5_t")(d), e4))
        d = GluConvTranspose2d(64, name="conv4_t", dtype=dt)(d)
        d = ELU(cat(bn("bn4_t")(d), e3))
        d = GluConvTranspose2d(32, name="conv3_t", dtype=dt)(d)
        d = ELU(cat(bn("bn3_t")(d), e2))
        d = GluConvTranspose2d(16, output_padding=(0, 1), name="conv2_t", dtype=dt)(d)
        d = ELU(cat(bn("bn2_t")(d), e1))
        d = GluConvTranspose2d(1, name="conv1_t", dtype=dt)(d)
        d = ELU(bn("bn1_t")(d))
        # Dense(161) over the frequency axis (reference fc1/fc2)
        out = nn.Dense(161, name="fc", dtype=dt,
                       kernel_init=tl.torch_kernel_init)(d[..., 0])
        return out


@MODELS.register("GCRN")
class GCRN(nn.Module):
    """Complex-spectrum prior; ``[B, T, F=161, 2] -> [B, T, 161, 2]``.

    ``dtype``: compute dtype for the conv/dense path (params stay f32);
    the grouped-LSTM bottleneck always runs f32 — bf16 recurrence
    carries drift over long sequences."""

    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        bn = lambda name: tl.BatchNorm(use_running_average=not train,
                                       name=name, dtype=dt)
        e1 = ELU(bn("bn1")(GluConv2d(16, name="conv1", dtype=dt)(x)))
        e2 = ELU(bn("bn2")(GluConv2d(32, name="conv2", dtype=dt)(e1)))
        e3 = ELU(bn("bn3")(GluConv2d(64, name="conv3", dtype=dt)(e2)))
        e4 = ELU(bn("bn4")(GluConv2d(128, name="conv4", dtype=dt)(e3)))
        e5 = ELU(bn("bn5")(GluConv2d(256, name="conv5", dtype=dt)(e4)))

        out = GLSTM(name="glstm")(e5.astype(jnp.float32))
        out = jnp.concatenate([out.astype(e5.dtype), e5], axis=-1)

        skips = (e1, e2, e3, e4)
        real = _Decoder(name="dec_real", dtype=dt)(out, skips, train)
        imag = _Decoder(name="dec_imag", dtype=dt)(out, skips, train)
        return jnp.stack([real, imag], axis=-1)
