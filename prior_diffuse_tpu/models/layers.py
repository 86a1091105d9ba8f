"""Shared building blocks for the model zoo.

Everything is flax.linen, channels-last (NHWC: ``[B, T, F, C]`` for 2-D
convs, ``[B, T, C]`` for 1-D).  Parameter *shapes* match the reference's
torch modules one-to-one (including torch's separate ``b_ih``/``b_hh``
recurrent biases) so parameter counts are comparable layer by layer,
and initializer *distributions* follow torch's defaults (kaiming-uniform
kernels, uniform fan-in biases, xavier MHA in-proj) so training dynamics
are comparable too.

TPU notes:
* recurrent cells precompute the input projection for the whole
  sequence as one big matmul (MXU), scanning only the ``h @ W_hh``
  recurrence;
* conv-transpose is implemented via ``lax.conv_general_dilated`` with
  LHS dilation so output-padding semantics are explicit.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def silu(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# torch-matching initializers: conv/linear kernels ~ kaiming_uniform(a=sqrt(5))
# == U(-1/sqrt(fan_in), 1/sqrt(fan_in)); biases the same bound.  Matching the
# reference's init distributions keeps training dynamics comparable.
# ---------------------------------------------------------------------------

def torch_kernel_init(key, shape, dtype=jnp.float32):
    """Kernel shapes [*window, in, out] or [in, out]: fan_in = prod(:-1)."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class PReLU(nn.Module):
    """torch-style PReLU: one learnable slope, or one per channel."""

    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha",
            lambda k, s: jnp.full(s, self.init, jnp.float32),
            (self.num_parameters,),
        )
        if self.num_parameters > 1:
            # broadcast over the channel (last) axis
            a = a.reshape((1,) * (x.ndim - 1) + (self.num_parameters,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class BatchNorm(nn.Module):
    """BatchNorm over all but the channel (last) axis, torch semantics
    (momentum 0.1 -> flax momentum 0.9, eps 1e-5, affine + running stats).

    Cross-replica behavior: pass ``axis_name='dp'`` to sync batch stats
    across a data-parallel mesh (the reference is single-GPU; syncing is
    the multi-chip-correct generalization).
    """

    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)


def conv2d(
    features: int,
    kernel: Tuple[int, int],
    strides: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
    padding="VALID",
    name: Optional[str] = None,
    dtype: Dtype = None,
) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=kernel,
        strides=strides,
        kernel_dilation=dilation,
        padding=padding,
        kernel_init=torch_kernel_init,
        dtype=dtype,
        name=name,
    )


def conv1d(
    features: int,
    kernel: int,
    strides: int = 1,
    dilation: int = 1,
    padding="VALID",
    name: Optional[str] = None,
    dtype: Dtype = None,
) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(kernel,),
        strides=(strides,),
        kernel_dilation=(dilation,),
        padding=padding,
        kernel_init=torch_kernel_init,
        dtype=dtype,
        name=name,
    )


class ConvParams(nn.Module):
    """Bare conv parameter holder (same param names/shapes as nn.Conv:
    ``kernel [kh, kw, in, out]`` + ``bias``), used where sibling convs
    that share an input are fused into one MXU pass with concatenated
    weights — identical math, half the input reads."""

    features: int
    kernel: Tuple[int, int]
    in_features: int

    @nn.compact
    def __call__(self):
        shape = (*self.kernel, self.in_features, self.features)
        k = self.param("kernel", torch_kernel_init, shape)
        fan_in = int(np.prod(shape[:-1]))
        b = self.param("bias", torch_bias_init(fan_in), (self.features,))
        return k, b


def _conv_transpose_f2(x, w, b, op_f: int):
    """Transposed conv, stride (1, 2), odd frequency kernel, via phase
    decomposition: two ordinary VALID convs (even/odd output columns)
    interleaved.  Numerically identical to the lhs-dilated formulation
    but with standard (fast) convolution gradients — the lhs-dilated
    weight-grad path dominated the train-step profile (~45 of 70 ms per
    model backward).

    ``x [B, T, F, Cin]``, ``w [kh, kw, Cin, Cout]`` (kw odd),
    output ``[B, T + kh - 1, 2F + kw - 2 + op_f, Cout]``.
    """
    kh, kw = w.shape[:2]
    assert kw % 2 == 1
    he = (kw - 1) // 2  # even-phase taps - 1 == F pad
    ho = (kw - 3) // 2  # odd-phase pad

    def phase(offset, pad_f):
        kern = w[:, offset::2]  # [kh, taps, Cin, Cout]
        xp = jnp.pad(x, ((0, 0), (kh - 1, kh - 1), (pad_f, pad_f), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp.astype(w.dtype), kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    even = phase(0, he)  # [B, T', F + he, Cout]
    odd = phase(1, ho)  # [B, T', F + ho, Cout]  (one column fewer)
    odd = jnp.pad(odd, ((0, 0), (0, 0), (0, 1), (0, 0)))
    inter = jnp.stack([even, odd], axis=-2)  # [B, T', F+he, 2, Cout]
    bsz, tp, fe, _, c = inter.shape
    out = inter.reshape(bsz, tp, fe * 2, c)[:, :, : 2 * x.shape[2] + kw - 2]
    if op_f:
        # output-padding columns receive no kernel contributions (the
        # needed input index is out of range) — bias-only, added below
        out = jnp.pad(out, ((0, 0), (0, 0), (0, op_f), (0, 0)))
    return out + b


def conv_transpose(x, w, b, strides=(1, 1), output_padding=(0, 0),
                   dtype=None):
    """torch-semantics transposed conv; picks the phase-decomposed fast
    path for the models' stride-(1,2) odd-kernel case, else the general
    lhs-dilated formulation."""
    if dtype is not None:
        w, b = w.astype(dtype), b.astype(dtype)
    kh, kw = w.shape[:2]
    if strides == (1, 2) and kw % 2 == 1 and output_padding[0] == 0:
        return _conv_transpose_f2(x, w, b, output_padding[1])
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(1, 1),
        padding=((kh - 1, kh - 1 + output_padding[0]),
                 (kw - 1, kw - 1 + output_padding[1])),
        lhs_dilation=strides,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def conv_pair_fused(x, kb1, kb2, strides=(1, 1), transpose=False,
                    output_padding=(0, 0), dilation=None, padding="VALID",
                    dtype=None):
    """Run two same-input convs as one (weights concatenated on the
    output-channel axis) and split the result.  Handles 1-D (``[B, T,
    C]`` with kernel ``[k, in, out]``) and 2-D NHWC."""
    (k1, b1), (k2, b2) = kb1, kb2
    k = jnp.concatenate([k1, k2], axis=-1)
    b = jnp.concatenate([b1, b2], axis=-1)
    if dtype is not None:
        k, b = k.astype(dtype), b.astype(dtype)
    n1 = k1.shape[-1]
    x = x.astype(k.dtype)
    if k.ndim == 3:  # 1-D conv
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=strides if len(strides) == 1 else (1,),
            padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b
        return y[..., :n1], y[..., n1:]
    if transpose:
        y = conv_transpose(x, k, b, strides, output_padding)
    else:
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
    return y[..., :n1], y[..., n1:]


class ConvTranspose2d(nn.Module):
    """Fractionally-strided conv with torch ConvTranspose2d shape
    semantics: ``out = (in - 1)*stride + kernel + output_padding``
    (padding=0).  Implemented as an LHS-dilated convolution."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        sh, sw = self.strides
        oph, opw = self.output_padding
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", torch_kernel_init, (kh, kw, in_ch, self.features)
        )
        b = self.param(
            "bias", torch_bias_init(kh * kw * in_ch), (self.features,)
        )
        return conv_transpose(x, w, b, (sh, sw), (oph, opw), dtype=self.dtype)


class Dense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, kernel_init=torch_kernel_init)(x)


class LSTM(nn.Module):
    """Single-layer unidirectional LSTM, torch parameterization
    (``W_ih [4h, in]``, ``W_hh [4h, h]``, separate ``b_ih``/``b_hh``).

    Input ``[B, T, in] -> [B, T, h]``.  The input projection for the
    whole sequence runs as one matmul; the scan carries only the
    recurrence.
    """

    hidden: int

    @nn.compact
    def __call__(self, x):
        h = self.hidden
        in_dim = x.shape[-1]
        rnn_init = torch_bias_init(h)  # torch RNN init: U(+-1/sqrt(h)) for all
        w_ih = self.param("w_ih", rnn_init, (in_dim, 4 * h))
        w_hh = self.param("w_hh", rnn_init, (h, 4 * h))
        b_ih = self.param("b_ih", rnn_init, (4 * h,))
        b_hh = self.param("b_hh", rnn_init, (4 * h,))

        xw = jnp.einsum("bti,ij->btj", x, w_ih) + b_ih + b_hh  # [B, T, 4h]

        def step(carry, xt):
            hprev, cprev = carry
            gates = xt + hprev @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            c = f * cprev + i * jnp.tanh(g)
            hnew = o * jnp.tanh(c)
            return (hnew, c), hnew

        batch = x.shape[0]
        init = (
            jnp.zeros((batch, h), x.dtype),
            jnp.zeros((batch, h), x.dtype),
        )
        _, ys = jax.lax.scan(step, init, jnp.swapaxes(xw, 0, 1))
        return jnp.swapaxes(ys, 0, 1)


class GRU(nn.Module):
    """Single-layer GRU, torch parameterization (gate order r, z, n;
    ``b_hn`` applied inside the reset gate).  Optionally bidirectional
    (output ``[B, T, 2h]``)."""

    hidden: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        h = self.hidden
        in_dim = x.shape[-1]

        def direction(name, xs):
            rnn_init = torch_bias_init(h)
            w_ih = self.param(f"w_ih_{name}", rnn_init, (in_dim, 3 * h))
            w_hh = self.param(f"w_hh_{name}", rnn_init, (h, 3 * h))
            b_ih = self.param(f"b_ih_{name}", rnn_init, (3 * h,))
            b_hh = self.param(f"b_hh_{name}", rnn_init, (3 * h,))

            xw = jnp.einsum("bti,ij->btj", xs, w_ih) + b_ih  # [B, T, 3h]

            def step(hprev, xt):
                hw = hprev @ w_hh + b_hh
                xr, xz, xn = jnp.split(xt, 3, axis=-1)
                hr, hz, hn = jnp.split(hw, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                hnew = (1.0 - z) * n + z * hprev
                return hnew, hnew

            init = jnp.zeros((xs.shape[0], h), xs.dtype)
            _, ys = jax.lax.scan(step, init, jnp.swapaxes(xw, 0, 1))
            return jnp.swapaxes(ys, 0, 1)

        fwd = direction("fwd", x)
        if not self.bidirectional:
            return fwd
        bwd = direction("bwd", jnp.flip(x, axis=1))
        return jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)


class MultiHeadAttention(nn.Module):
    """torch ``nn.MultiheadAttention``-shaped self-attention:
    packed qkv in-projection ``[d, 3d] (+ 3d bias)`` and out-projection
    ``[d, d] (+ d bias)``.  Input/output ``[B, L, d]``."""

    d_model: int
    num_heads: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        nh = self.num_heads
        hd = d // nh
        # torch MultiheadAttention: xavier_uniform in-proj, zero biases
        w_in = self.param("w_in", nn.initializers.xavier_uniform(), (d, 3 * d))
        b_in = self.param("b_in", nn.initializers.zeros_init(), (3 * d,))
        w_out = self.param("w_out", torch_kernel_init, (d, d))
        b_out = self.param("b_out", nn.initializers.zeros_init(), (d,))
        if self.dtype is not None:
            w_in, b_in = w_in.astype(self.dtype), b_in.astype(self.dtype)
            w_out, b_out = w_out.astype(self.dtype), b_out.astype(self.dtype)
            x = x.astype(self.dtype)

        qkv = x @ w_in + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [B, L, d] -> [B, nh, L, hd]
            b, l, _ = t.shape
            return t.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        b, _, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return out @ w_out + b_out


class LayerNorm(nn.Module):
    """LayerNorm over the last axis (torch ``nn.LayerNorm(dim)``)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon)(x)


class TimeEmbedding(nn.Module):
    """DiffWave sinusoidal timestep embedding with linear interpolation
    for fractional steps (reference ``model/diff3.py:62-95``): table
    ``[max_steps, 128]`` of ``sin/cos(t * 10^(dim*4/63))``, then two
    Dense->SiLU to 512."""

    max_steps: int

    def setup(self):
        import numpy as np

        # Phase arithmetic must be bit-identical to the reference's
        # torch f32 computation (model/diff3.py:90-95): at phases of
        # ~5e5 rad a 1-ulp phase difference moves sin() by up to ~0.06.
        # torch evaluates f32 pow/sin with double-precision internals,
        # so: exponent in f32, pow in f64 cast back to f32 (== torch
        # bit-exactly), phase product in f32, sin/cos in f64 of the f32
        # phase, rounded to f32.
        steps = np.arange(self.max_steps, dtype=np.float32)[:, None]  # [S, 1]
        dims = np.arange(64, dtype=np.float32)[None, :]  # [1, 64]
        exp = dims * np.float32(4.0) / np.float32(63.0)
        pow_ = np.power(10.0, exp.astype(np.float64)).astype(np.float32)
        phase = (steps * pow_).astype(np.float64)
        self.table = jnp.asarray(
            np.concatenate([np.sin(phase), np.cos(phase)], axis=1),
            jnp.float32,
        )  # [S, 128]
        self.proj1 = nn.Dense(512)
        self.proj2 = nn.Dense(512)

    def __call__(self, t):
        """``t [B]`` float (fractional allowed) or int -> ``[B, 512]``."""
        if jnp.issubdtype(t.dtype, jnp.integer):
            x = self.table[t]
        else:
            low = jnp.floor(t).astype(jnp.int32)
            high = jnp.ceil(t).astype(jnp.int32)
            frac = (t - low)[:, None]
            x = self.table[low] + (self.table[high] - self.table[low]) * frac
        x = silu(self.proj1(x))
        return silu(self.proj2(x))


def pad_time_causal(x: jnp.ndarray, amount: int = 1) -> jnp.ndarray:
    """Zero-pad ``amount`` frames at the start of the time axis of
    ``[B, T, F, C]`` (the reference's ``ConstantPad2d((0,0,1,0))``)."""
    return jnp.pad(x, ((0, 0), (amount, 0), (0, 0), (0, 0)))


def chomp_time_end(x: jnp.ndarray, amount: int = 1) -> jnp.ndarray:
    """Drop ``amount`` frames from the end of the time axis (Chomp_T)."""
    return x[:, :-amount] if amount else x
