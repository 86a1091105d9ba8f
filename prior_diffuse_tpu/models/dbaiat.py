"""DB-AIAT — dual-branch attention-in-attention transformer priors.

Re-design of the reference's four DB-AIAT variants
(``model/dbaiat.py:333-478``): dense conv encoders (complex RI and
magnitude branches), a dual-path transformer applying attention along
frequency (AFA) and time (ATA) with learnable mix weights k1/k2, AHAM
attention-based merge of the per-layer outputs, and dense decoders
(real/imag + sigmoid*tanh masking decoder).

Layout ``[B, T, F=161, 2] -> [B, T, 161, 2]``.  TPU notes: both
attention passes batch the orthogonal axis (B*T rows / B*F cols) into
one big MHA — two large batched matmuls per layer; the GRU feed-forward
precomputes input projections sequence-wide (see layers.GRU).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prior_diffuse_tpu.models import layers as tl
from prior_diffuse_tpu.registry import MODELS


class LayerNormOverF(nn.Module):
    """torch ``nn.LayerNorm(F)`` on ``[B, C, T, F]`` == normalize the
    frequency axis with per-bin affine; ours acts on axis -2 of
    ``[B, T, F, C]``."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        f = x.shape[-2]
        scale = self.param("scale", nn.initializers.ones_init(), (f,))
        bias = self.param("bias", nn.initializers.zeros_init(), (f,))
        xd = x.dtype
        x = x.astype(jnp.float32)  # stats in f32 regardless of compute dtype
        mean = x.mean(axis=-2, keepdims=True)
        var = x.var(axis=-2, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale[:, None] + bias[:, None]).astype(xd)


class GroupNorm1(nn.Module):
    """torch ``nn.GroupNorm(1, C, eps=1e-8)``: per-sample normalization
    over (C, T, F) with per-channel affine."""

    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x):  # [B, T, F, C]
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        xd = x.dtype
        x = x.astype(jnp.float32)
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return out.astype(xd)


class TransformerEncoderLayer(nn.Module):
    """MHA + bidirectional-GRU feed-forward block
    (model/dbaiat.py:41-88).  Input ``[N, L, d]``."""

    d_model: int
    nhead: int = 4
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, src):
        x = tl.LayerNorm(name="norm3")(src)
        attn = tl.MultiHeadAttention(self.d_model, self.nhead,
                                     name="self_attn", dtype=self.dtype)(x)
        src = tl.LayerNorm(name="norm1")(src + attn.astype(src.dtype))
        # GRU recurrence stays f32 (bf16 carry drift)
        out = tl.GRU(self.d_model * 2, bidirectional=True,
                     name="gru")(src.astype(jnp.float32))
        out = nn.Dense(self.d_model, name="linear2", dtype=self.dtype,
                       kernel_init=tl.torch_kernel_init)(jax.nn.relu(out))
        return tl.LayerNorm(name="norm2")(src + out.astype(src.dtype))


class _DualPathLayer(nn.Module):
    """One AFA (freq-axis) + ATA (time-axis) attention pass."""

    d_model: int
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):  # [B, T, F, C]
        b, t, f, c = x.shape
        row_in = x.reshape(b * t, f, c)  # attention along F, batch (B,T)
        row = TransformerEncoderLayer(self.d_model, name="row_trans",
                                      dtype=self.dtype)(row_in)
        row = GroupNorm1(name="row_norm")(row.reshape(b, t, f, c))

        col_in = x.transpose(0, 2, 1, 3).reshape(b * f, t, c)  # along T
        col = TransformerEncoderLayer(self.d_model, name="col_trans",
                                      dtype=self.dtype)(col_in)
        col = col.reshape(b, f, t, c).transpose(0, 2, 1, 3)
        col = GroupNorm1(name="col_norm")(col)
        return row, col


class _InProj(nn.Module):
    features: int
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):
        return tl.PReLU(name="prelu")(
            tl.conv2d(self.features, (1, 1), name="conv", dtype=self.dtype)(x)
        )


class _OutProj(nn.Module):
    features: int
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):
        return tl.conv2d(self.features, (1, 1), name="conv", dtype=self.dtype)(
            tl.PReLU(name="prelu")(x)
        )


class AIATransformer(nn.Module):
    """Adaptive time-frequency attention transformer
    (model/dbaiat.py:91-154).  Returns (last_output, [per-layer outputs])."""

    input_size: int = 64
    output_size: int = 64
    num_layers: int = 4
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        d = self.input_size // 2
        k1 = self.param("k1", nn.initializers.ones_init(), (1,))
        k2 = self.param("k2", nn.initializers.ones_init(), (1,))
        out_proj = _OutProj(self.output_size, name="output", dtype=self.dtype)
        h = _InProj(d, name="input", dtype=self.dtype)(x)
        outputs = []
        for i in range(self.num_layers):
            row, col = _DualPathLayer(d, name=f"layer{i}", dtype=self.dtype)(h)
            h = h + (k1 * row + k2 * col).astype(h.dtype)
            outputs.append(out_proj(h))
        return outputs[-1], outputs


class AIATransformerMerge(nn.Module):
    """Dual-branch interactive variant (model/dbaiat.py:157-246): shared
    input projection and shared per-layer transformers run over an
    interleaved mag/ri update chain."""

    input_size: int = 128
    output_size: int = 64
    num_layers: int = 4
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x_mag, x_ri):
        d = self.input_size // 2  # 64
        k1 = self.param("k1", nn.initializers.ones_init(), (1,))
        k2 = self.param("k2", nn.initializers.ones_init(), (1,))
        in_proj = _InProj(d, name="input", dtype=self.dtype)
        out_proj = _OutProj(self.output_size, name="output", dtype=self.dtype)
        merged = jnp.concatenate([x_mag, x_ri], axis=-1)
        input_mag = in_proj(merged)
        input_ri = in_proj(merged)

        outs_mag, outs_ri = [], []
        for i in range(self.num_layers):
            layer = _DualPathLayer(d, name=f"layer{i}", dtype=self.dtype)
            h_mag = input_mag if i == 0 else outs_mag[-1] + outs_ri[-1]
            row, col = layer(h_mag)
            o_mag = out_proj(input_mag + (k1 * row + k2 * col).astype(input_mag.dtype))
            outs_mag.append(o_mag)

            h_ri = input_ri if i == 0 else outs_ri[-1] + outs_mag[-2]
            row, col = layer(h_ri)
            o_ri = out_proj(input_ri + (k1 * row + k2 * col).astype(input_ri.dtype))
            outs_ri.append(o_ri)
        return outs_mag[-1], outs_mag, outs_ri[-1], outs_ri


class AHAM(nn.Module):
    """Attention-based multi-scale merge of the 4 per-layer outputs
    (model/dbaiat.py:249-330; AHAM and AHAM_ori compute identically —
    both share one 1x1 conv across scales)."""

    input_channel: int = 64

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray]):
        # unused in the forward pass, kept for 1:1 parameter parity with
        # the reference's dead `k3` weight (model/dbaiat.py:253)
        self.param("k3", nn.initializers.zeros_init(), (1,))
        conv = tl.conv2d(1, (1, 1), name="conv1")
        ys = []
        for x in inputs:
            pooled = x.mean(axis=(1, 2), keepdims=True)  # [B,1,1,C]
            ys.append(conv(pooled)[:, 0, 0, 0])  # [B]
        w = jax.nn.softmax(jnp.stack(ys, axis=-1), axis=-1)  # [B, G]
        merged = sum(
            w[:, g, None, None, None] * inputs[g] for g in range(len(inputs))
        )
        return inputs[-1] + merged


class DenseBlock(nn.Module):
    """Dilated dense conv block (model/dbaiat.py:605-631): depth stages
    of causal-time dilated (2,3) convs with channel concat growth."""

    depth: int = 4
    width: int = 64
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):
        skip = x
        out = x
        for i in range(self.depth):
            dil = 2**i
            pad_len = 2 + (dil - 1) - 1  # == dil
            h = jnp.pad(skip, ((0, 0), (pad_len, 0), (1, 1), (0, 0)))
            h = tl.conv2d(
                self.width, (2, 3), dilation=(dil, 1), name=f"conv{i + 1}",
                dtype=self.dtype,
            )(h)
            h = LayerNormOverF(name=f"norm{i + 1}")(h)
            out = tl.PReLU(self.width, name=f"prelu{i + 1}")(h)
            skip = jnp.concatenate([out, skip.astype(out.dtype)], axis=-1)
        return out


class DenseEncoder(nn.Module):
    """(model/dbaiat.py:481-524); in_channels 2 (RI) or 1 (mag)."""

    width: int = 64
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):
        h = tl.conv2d(self.width, (1, 1), name="inp_conv", dtype=self.dtype)(x)
        h = LayerNormOverF(name="inp_norm")(h)
        h = tl.PReLU(self.width, name="inp_prelu")(h)
        h = DenseBlock(4, self.width, name="enc_dense1", dtype=self.dtype)(h)
        h = tl.conv2d(self.width, (1, 3), (1, 2), name="enc_conv1",
                      dtype=self.dtype)(h)  # F: 161->80
        h = LayerNormOverF(name="enc_norm1")(h)
        return tl.PReLU(self.width, name="enc_prelu1")(h)


class SPConvTranspose2d(nn.Module):
    """Sub-pixel upsample along frequency (model/dbaiat.py:587-602)."""

    features: int
    r: int = 2
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):  # [B, T, F, C]
        h = tl.conv2d(self.features * self.r, (1, 3), name="conv",
                      dtype=self.dtype)(x)
        b, t, f, _ = h.shape
        h = h.reshape(b, t, f, self.r, self.features)
        return h.reshape(b, t, f * self.r, self.features)


class DenseDecoder(nn.Module):
    """(model/dbaiat.py:527-548); F: 80 -> 161, C: 64 -> 1."""

    width: int = 64
    masking: bool = False
    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = DenseBlock(4, self.width, name="dec_dense1", dtype=dt)(x)
        h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))  # F pad
        h = SPConvTranspose2d(self.width, 2, name="dec_conv1", dtype=dt)(h)
        h = jnp.pad(h, ((0, 0), (0, 0), (1, 0), (0, 0)))  # -> 161
        h = LayerNormOverF(name="dec_norm1")(h)
        h = tl.PReLU(self.width, name="dec_prelu1")(h)
        h = tl.conv2d(1, (1, 1), name="out_conv", dtype=dt)(h)
        if self.masking:
            g1 = jax.nn.sigmoid(tl.conv2d(1, (1, 1), name="mask1", dtype=dt)(h))
            g2 = jnp.tanh(tl.conv2d(1, (1, 1), name="mask2", dtype=dt)(h))
            h = g1 * g2
            h = jax.nn.sigmoid(tl.conv2d(1, (1, 1), name="maskconv", dtype=dt)(h))
        return h  # [B, T, 161, 1]


def _mag_phase_ch(x):
    mag = jnp.linalg.norm(x, axis=-1)
    phase = jnp.arctan2(x[..., 1], x[..., 0])
    return mag, phase


@MODELS.register("aia_complex_trans_ri")
class AiaComplexTransRI(nn.Module):
    """RI-branch-only variant (model/dbaiat.py:450-478) — the one named
    in conf/dbaiat.yml."""

    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h = DenseEncoder(name="en_ri", dtype=dt)(x)
        _, outs = AIATransformer(64, 64, 4, name="dual_trans", dtype=dt)(h)
        h = AHAM(name="aham")(outs)
        real = DenseDecoder(name="de1", dtype=dt)(h)[..., 0]
        imag = DenseDecoder(name="de2", dtype=dt)(h)[..., 0]
        return jnp.stack([real, imag], axis=-1)


@MODELS.register("aia_complex_trans_mag")
class AiaComplexTransMag(nn.Module):
    """Magnitude-mask-only variant (model/dbaiat.py:416-447)."""

    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        mag, phase = _mag_phase_ch(x)
        h = DenseEncoder(name="en_mag", dtype=dt)(mag[..., None])
        _, outs = AIATransformer(64, 64, 4, name="dual_trans_mag", dtype=dt)(h)
        h = AHAM(name="aham_mag")(outs)
        mask = DenseDecoder(masking=True, name="de_mag_mask", dtype=dt)(h)[..., 0]
        out_mag = mask.astype(mag.dtype) * mag
        return jnp.stack(
            [out_mag * jnp.cos(phase), out_mag * jnp.sin(phase)], axis=-1
        )


@MODELS.register("dual_aia_complex_trans")
class DualAiaComplexTrans(nn.Module):
    """Independent dual-branch variant (model/dbaiat.py:333-370)."""

    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        mag, _ = _mag_phase_ch(x)
        h_ri = DenseEncoder(name="en_ri", dtype=dt)(x)
        _, outs_ri = AIATransformer(64, 64, 4, name="dual_trans", dtype=dt)(h_ri)
        h_ri = AHAM(name="aham")(outs_ri)
        h_mag = DenseEncoder(name="en_mag", dtype=dt)(mag[..., None])
        _, outs_mag = AIATransformer(64, 64, 4, name="dual_trans_mag", dtype=dt)(h_mag)
        h_mag = AHAM(name="aham_mag")(outs_mag)
        mag_mask = DenseDecoder(masking=True, name="de_mag_mask",
                                dtype=dt)(h_mag)[..., 0].astype(mag.dtype)
        masked_mag = mag_mask * mag
        real = DenseDecoder(name="de1", dtype=dt)(h_ri)[..., 0].astype(mag.dtype)
        imag = DenseDecoder(name="de2", dtype=dt)(h_ri)[..., 0].astype(mag.dtype)
        com = jnp.stack([real, imag], axis=-1)
        pre_mag, pre_phase = _mag_phase_ch(com)
        out_mag = (masked_mag + pre_mag) / 2.0
        return jnp.stack(
            [out_mag * jnp.cos(pre_phase), out_mag * jnp.sin(pre_phase)], axis=-1
        )


@MODELS.register("dual_aia_trans_merge_crm")
class DualAiaTransMergeCRM(nn.Module):
    """Interactive merge variant with complex refinement
    (model/dbaiat.py:373-413)."""

    dtype: tl.Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        mag, phase = _mag_phase_ch(x)
        h_ri = DenseEncoder(name="en_ri", dtype=dt)(x)
        h_mag = DenseEncoder(name="en_mag", dtype=dt)(mag[..., None])
        _, outs_mag, _, outs_ri = AIATransformerMerge(
            128, 64, 4, name="aia_trans_merge", dtype=dt
        )(h_mag, h_ri)
        h_ri = AHAM(name="aham")(outs_ri)
        h_mag = AHAM(name="aham_mag")(outs_mag)
        mag_mask = DenseDecoder(masking=True, name="de_mag_mask",
                                dtype=dt)(h_mag)[..., 0].astype(mag.dtype)
        real = DenseDecoder(name="de1", dtype=dt)(h_ri)[..., 0].astype(mag.dtype)
        imag = DenseDecoder(name="de2", dtype=dt)(h_ri)[..., 0].astype(mag.dtype)
        out_mag = mag_mask * mag
        return jnp.stack(
            [
                out_mag * jnp.cos(phase) + real,
                out_mag * jnp.sin(phase) + imag,
            ],
            axis=-1,
        )
