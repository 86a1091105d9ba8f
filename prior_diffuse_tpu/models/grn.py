"""GRN — magnitude-mask prior (gated residual network).

Re-design of the reference GRN (``model/grn.py:8-72``): 4 dilated 5x5
conv2d stages, a 1x1 conv1d to 256 channels over time, 18 GLU residual
blocks (3 groups x dilations 1..32, kernel 7), sum of all block outputs
added back, conv1d head to a sigmoid mask.

Layout: magnitude ``[B, T, F=161] -> [B, T, 161]`` (returns
``input * mask``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from prior_diffuse_tpu.models import layers as tl
from prior_diffuse_tpu.registry import MODELS

ELU = jax.nn.elu


class GLU(nn.Module):
    """1-D gated residual block (model/grn.py:76-113); in ``[B, T, 256]``.

    Returns ``(activated_residual, block_output)`` — the block outputs
    are summed into the trunk by the caller.
    """

    dilation: int
    causal: bool = False
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        bn = lambda name: tl.BatchNorm(use_running_average=not train,
                                       name=name, dtype=dt)
        inp = x
        x = tl.conv1d(64, 1, name="in_conv", dtype=dt)(x)
        x = bn("in_bn")(x)
        pad = (
            ((6 * self.dilation, 0),)
            if self.causal
            else ((3 * self.dilation, 3 * self.dilation),)
        )
        a = ELU(x)
        # left/right convs share the activated input: one fused MXU pass
        left, right = tl.conv_pair_fused(
            a,
            tl.ConvParams(64, (7,), 64, name="left_conv")(),
            tl.ConvParams(64, (7,), 64, name="right_conv")(),
            strides=(1,),
            dilation=(self.dilation,),
            padding=pad,
            dtype=dt,
        )
        left = bn("left_bn")(left)
        right = jax.nn.sigmoid(bn("right_bn")(right))
        x = left * right
        x = tl.conv1d(256, 1, name="out_conv", dtype=dt)(x)
        x = bn("out_bn")(x)
        out = x
        return ELU(x + inp.astype(x.dtype)), out


@MODELS.register("GRN")
class GRN(nn.Module):
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        bn = lambda name: tl.BatchNorm(use_running_average=not train,
                                       name=name, dtype=dt)
        inp = x  # [B, T, 161]
        h = x[..., None]  # [B, T, F, 1]
        # dilated front-end (dilation along freq: 1, 1, 2, 4)
        h = ELU(tl.conv2d(16, (5, 5), padding=((2, 2), (2, 2)), name="dila1", dtype=dt)(h))
        h = ELU(tl.conv2d(16, (5, 5), padding=((2, 2), (2, 2)), name="dila2", dtype=dt)(h))
        h = ELU(
            tl.conv2d(
                32, (5, 5), dilation=(1, 2), padding=((2, 2), (4, 4)),
                name="dila3", dtype=dt
            )(h)
        )
        h = ELU(
            tl.conv2d(
                32, (5, 5), dilation=(1, 4), padding=((2, 2), (8, 8)),
                name="dila4", dtype=dt
            )(h)
        )
        # flatten (C, F) c-major like the reference permute+reshape
        b, t, f, c = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)  # [B, T, 5152]
        h = tl.conv1d(256, 1, name="conv1d_in", dtype=dt)(h)
        h = jax.nn.relu(bn("bn_in")(h))

        outs = []
        for g in range(3):
            for i in range(6):
                h, out = GLU(2**i, name=f"glu_{g}_{i}", dtype=dt)(h, train)
                outs.append(out)
        for out in outs:
            h = h + out

        h = tl.conv1d(256, 1, name="conv1d_3", dtype=dt)(h)
        h = ELU(bn("bn3")(h))
        h = tl.conv1d(128, 1, name="conv1d_4", dtype=dt)(h)
        h = bn("bn4")(h)
        h = tl.conv1d(161, 1, name="conv1d_5", dtype=dt)(h)
        mask = jax.nn.sigmoid(bn("bn5")(h))  # [B, T, 161]
        return inp * mask.astype(inp.dtype)
