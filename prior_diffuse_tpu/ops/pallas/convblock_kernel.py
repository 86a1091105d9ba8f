"""Fused Pallas encoder-stage kernel for the DiffUNet family.

One encoder stage (``models/diffunet.py::Encoder`` — causal pad +
``BiConvGLU`` + inference BatchNorm + PReLU; reference
``model/diff.py:87-166`` / ``model/diff3.py:144-165``) is six separate
convolutions on the XLA path: conv1 (1x1, Cin->32), the l/r pair conv
((2,k), stride (1,2), fused to 32->64), two 1x1 gate convs, conv2
(1x1, 32->64), then BN + PReLU.  XLA compiles each conv as its own
fusion, so five stage-internal intermediates round-trip HBM per stage.
This kernel computes the whole stage in VMEM as a chain of five MXU
matmuls — the only HBM traffic is the stage input and output.

TPU-first construction (see the pallas guide):

* the (1,2) frequency stride never becomes a strided gather: the input
  is pre-split (in XLA, where it fuses) into even/odd frequency
  columns, and every window element is then a *static contiguous*
  slice.  With VALID padding and odd F/k the natural even/odd extents
  are exactly what the windows need (no frequency padding at all);
* the time-kernel (2) neighbor row comes from passing the array twice,
  once shifted by one frame (the stft_kernel trick) — blocks stay
  non-overlapping and sublane-aligned;
* the two 32-wide gate convs run as ONE 64-wide matmul with a
  block-diagonal weight (half the MACs are structural zeros, but one
  64-lane MXU pass beats two 32-lane passes);
* time conditioning (DiffUNet1 adds a Dense(512 -> Cin) projection of
  the t-embedding to the padded stage input, reference
  ``model/diff3.py:150-153``) folds through the 1x1 conv1:
  ``conv1(x + tp) = conv1(x) + tp @ w1`` — a per-batch bias row, so the
  fused stage needs no extra in-kernel work at all;
* inference BatchNorm is folded into conv2's weights/bias on the host
  side of the call (scale absorbed into w2, shift into b2), and PReLU
  is applied in-register before the single output store.

Serving-path only (forward; training keeps the XLA path and its
autodiff).  Parity vs the flax Encoder is pinned by
``tests/test_pallas_kernels.py``; adoption is measurement-gated like
the Pallas STFT (``PDT_PALLAS=1``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GATE = 32  # BiConvGLU internal width (reference model/diff.py:231-250)


def _stage_kernel(xe0, xe1, xo0, xo1, w1, b1, wp, bp, wg, bg, w2, b2, a,
                  out_ref, *, k: int, fo: int, tb: int, cin: int,
                  dtype):
    """One (batch-row, time-tile) block of a full encoder stage."""

    def conv1(ref):
        v = ref[0]  # [tb, fe, cin]
        fe = v.shape[1]
        y = jnp.dot(v.reshape(tb * fe, cin).astype(dtype), w1[:],
                    preferred_element_type=jnp.float32)
        return (y + b1[0]).reshape(tb, fe, _GATE)

    e0, o0 = conv1(xe0), conv1(xo0)   # time offset 0
    e1, o1 = conv1(xe1), conv1(xo1)   # time offset 1
    parts = []
    for e, o in ((e0, o0), (e1, o1)):       # kt = 0, 1
        for kf in range(k):                  # freq window elements
            src = e if kf % 2 == 0 else o
            off = kf // 2
            parts.append(src[:, off:off + fo, :])
    col = jnp.concatenate(parts, axis=-1).reshape(tb * fo, 2 * k * _GATE)
    y = jnp.dot(col.astype(dtype), wp[:],
                preferred_element_type=jnp.float32) + bp[:]
    left, right = y[:, :_GATE], y[:, _GATE:]
    m = jnp.dot(y.astype(dtype), wg[:],
                preferred_element_type=jnp.float32) + bg[:]
    lmask = jax.nn.sigmoid(m[:, :_GATE])   # sigmoid(l_conv(left))
    rmask = jax.nn.sigmoid(m[:, _GATE:])   # sigmoid(r_conv(right))
    comb = left * rmask + right * lmask
    y2 = jnp.dot(comb.astype(dtype), w2[:],
                 preferred_element_type=jnp.float32) + b2[:]
    alpha = a[0, 0]
    y2 = jnp.where(y2 >= 0, y2, alpha * y2)
    out_ref[0] = y2.reshape(tb, fo, out_ref.shape[-1]).astype(out_ref.dtype)


def _fold_bn(w2, b2, bn, eps=1e-5):
    """Fold inference BatchNorm (flax param/batch_stats dicts) into the
    conv2 weight/bias: y*g/sqrt(v+eps) + (beta - mean*g/sqrt(v+eps))."""
    scale = bn["scale"] / np.sqrt(bn["var"] + eps)
    return w2 * scale[None, :], b2 * scale + bn["bias"] - bn["mean"] * scale


@functools.partial(
    jax.jit,
    static_argnames=("kernel_f", "tile_t", "dtype", "interpret"),
)
def fused_enc_stage(x, w1, b1, wp, bp, wg, bg, w2, b2, alpha,
                    tproj=None, *, kernel_f: int, tile_t: int = 64,
                    dtype=jnp.bfloat16, interpret: bool = False):
    """One encoder stage on ``x [B, T, F, Cin]`` -> ``[B, T, Fo, Cout]``.

    Weights are pre-reshaped 2-D matmul operands (see
    :func:`encoder_stage_params`); BN must already be folded into
    ``w2/b2``.  ``kernel_f`` is the frequency kernel width (time kernel
    is always 2 with causal padding, per the reference encoder).
    ``tproj [B, Cin]`` is the optional time-embedding projection added
    to the (padded) stage input — folded into a per-batch conv1 bias.
    """
    b, t, f, cin = x.shape
    k = kernel_f
    fo = (f - k) // 2 + 1
    cout = w2.shape[-1]
    tb = min(tile_t, t)
    t_pad = -(-t // tb) * tb

    # causal pad (1 left in T), tile pad (right), even/odd freq split,
    # and the one-row time shift — all cheap XLA slices that fuse.
    xp = jnp.pad(x, ((0, 0), (1, t_pad - t), (0, 0), (0, 0)))
    xe, xo = xp[:, :, 0::2, :], xp[:, :, 1::2, :]
    fe, fon = xe.shape[2], xo.shape[2]
    need_e, need_o = fo + (k - 1) // 2, fo + max((k - 2) // 2, 0)
    assert fe >= need_e and fon >= need_o, (f, k, fe, fon)
    xe, xo = xe[:, :, :need_e, :], xo[:, :, :need_o, :]

    args = (xe[:, :-1], xe[:, 1:], xo[:, :-1], xo[:, 1:])
    cast = lambda w: w.astype(dtype)
    # conv1 bias as one [B, 1, 32] row per batch: the time-embedding
    # projection folds through the 1x1 conv (see module docstring).
    # Kept 3-D so the per-batch block is (1, 1, 32) — TPU block rules
    # need the last two dims divisible by (8, 128) OR equal to the
    # array's; (1, 32) on a [B, 32] array satisfies neither.
    b1b = jnp.broadcast_to(b1.astype(jnp.float32)[None, :], (b, _GATE))
    if tproj is not None:
        b1b = b1b + jnp.dot(tproj.astype(dtype), cast(w1),
                            preferred_element_type=jnp.float32)
    b1b = b1b[:, None, :]
    weights = (cast(w1), b1b,
               cast(wp), bp.astype(jnp.float32).reshape(1, -1),
               cast(wg), bg.astype(jnp.float32).reshape(1, -1),
               cast(w2), b2.astype(jnp.float32).reshape(1, -1))
    alpha2d = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    grid = (b, t_pad // tb)
    x_spec = lambda fdim, c: pl.BlockSpec(
        (1, tb, fdim, c), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM)
    w_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda bi, ti: (0,) * arr.ndim,
        memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, 1, _GATE), lambda bi, ti: (bi, 0, 0),
                           memory_space=pltpu.VMEM)

    w_specs = [w_spec(w) for w in weights]
    w_specs[1] = b1_spec

    out = pl.pallas_call(
        functools.partial(_stage_kernel, k=k, fo=fo, tb=tb, cin=cin,
                          dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, fo, cout), dtype),
        grid=grid,
        in_specs=[x_spec(need_e, cin), x_spec(need_e, cin),
                  x_spec(need_o, cin), x_spec(need_o, cin)]
        + w_specs
        + [pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                        memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, tb, fo, cout),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args, *weights, alpha2d)
    return out[:, :t]


def encoder_stage_params(stage, bn, prelu, kernel_f: int):
    """Pack one flax Encoder stage's params (``convN`` BiConvGLU dict +
    ``bnN`` param/batch_stats + ``preluN``) into the kernel's 2-D
    matmul operands.  Returns (w1,b1,wp,bp,wg,bg,w2,b2,alpha)."""
    g = _GATE

    def kb(p):
        return np.asarray(p["kernel"]), np.asarray(p["bias"])

    w1, b1 = kb(stage["conv1"])            # [1,1,cin,32]
    wl, bl = kb(stage["l"])                # [2,k,32,32]
    wr, br = kb(stage["r"])
    wgl, bgl = kb(stage["l_conv"])         # [1,1,32,32]
    wgr, bgr = kb(stage["r_conv"])
    w2, b2 = kb(stage["conv2"])            # [1,1,32,cout]

    cin = w1.shape[2]
    wp = np.concatenate([wl, wr], axis=-1)          # [2,k,32,64]
    wp2 = wp.reshape(2 * kernel_f * g, 2 * g)       # (kt,kf,ci) major
    bp = np.concatenate([bl, br])
    # block-diagonal gate weight: [l r] @ [[wgl 0],[0 wgr]]
    wg = np.zeros((2 * g, 2 * g), wgl.dtype)
    wg[:g, :g] = wgl.reshape(g, g)
    wg[g:, g:] = wgr.reshape(g, g)
    bg = np.concatenate([bgl, bgr])
    w2f, b2f = _fold_bn(
        w2.reshape(g, -1), b2,
        {"scale": np.asarray(bn["scale"]), "bias": np.asarray(bn["bias"]),
         "mean": np.asarray(bn["mean"]), "var": np.asarray(bn["var"])},
    )
    alpha = float(np.asarray(prelu["alpha"]).reshape(()))
    return (w1.reshape(cin, g), b1, wp2, bp, wg, bg, w2f, b2f, alpha)


_ENC_KERNELS = (5, 3, 3, 3, 3)  # frequency kernel per stage (_ENC_SPECS)


def pack_encoder(params, batch_stats):
    """Pack all 5 stages of a DiffUNet ``encoder`` params subtree (with
    matching batch_stats) for :func:`encoder_pallas`.  Each entry is
    ``(stage_ops, tp)`` where ``tp`` is the stage's time-projection
    Dense ``(kernel [512, Cin], bias [Cin])`` or ``None`` (DiffUNet's
    unconditioned encoder has no ``tp*`` Dense)."""
    packed = []
    for i, kf in enumerate(_ENC_KERNELS, start=1):
        ops = encoder_stage_params(
            params[f"conv{i}"],
            {**params[f"bn{i}"]["BatchNorm_0"],
             **batch_stats[f"bn{i}"]["BatchNorm_0"]},
            params[f"prelu{i}"], kf)
        tp = params.get(f"tp{i}")
        tp = (np.asarray(tp["kernel"]), np.asarray(tp["bias"])) \
            if tp is not None else None
        packed.append((ops, tp))
    return packed


def encoder_pallas(x, packed, temb=None, *, dtype=jnp.bfloat16,
                   tile_t: int = 64, interpret: bool = False):
    """Full 5-stage encoder forward (inference) on the fused kernels.
    ``temb [B, 512]`` is the time embedding for conditioned encoders
    (DiffUNet1); the tiny per-stage Dense runs in XLA, the projection
    folds into the stage kernel's per-batch conv1 bias."""
    skips = []
    for kf, (sp, tp) in zip(_ENC_KERNELS, packed):
        tproj = None
        if tp is not None and temb is not None:
            tproj = jnp.dot(temb, tp[0]) + tp[1]
        x = fused_enc_stage(x, *sp, tproj, kernel_f=kf, tile_t=tile_t,
                            dtype=dtype, interpret=interpret)
        skips.append(x)
    return x, skips
