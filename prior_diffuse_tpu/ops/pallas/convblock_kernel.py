"""Fused encoder-stage kernels for the DiffUNet family.

One encoder stage (``models/diffunet.py::Encoder`` — causal pad +
``BiConvGLU`` + inference BatchNorm + PReLU; reference
``model/diff.py:87-166`` / ``model/diff3.py:144-165``) is six separate
convolutions on the XLA path: conv1 (1x1, Cin->32), the l/r pair conv
((2,k), stride (1,2), fused to 32->64), two 1x1 gate convs, conv2
(1x1, 32->64), then BN + PReLU.  XLA compiles each conv as its own
fusion, so five stage-internal intermediates round-trip HBM per stage.

TPU-first construction (see the pallas guide).  A first design kept
the whole stage in one kernel with rank-3 blocks and in-kernel
``[tb, fe, cin] -> [tb*fe, cin]`` reshapes; Mosaic rejects that cast
("infer-vector-layout: unsupported shape cast") because with Cin=2 the
channels-last layout leaves the lane dimension 2/128 occupied and the
merge needs a full relayout.  The shipped design splits the work by
what each compiler is good at:

* **XLA does the data movement**: causal pad, the stride-(1,2) window
  gather (im2col — static strided slices that fuse into one copy), and
  the row-flatten ``[B, T, Fo, K] -> [B, T*Fo, K]`` that is free at the
  XLA layout level and unsupported inside Mosaic;
* **the Pallas kernel does the math**: a rank-2-only chain of three MXU
  matmuls (window matmul -> block-diagonal gate matmul -> conv2) with
  the GLU cross-gate, folded inference BN, and PReLU applied
  in-register — one HBM read (the im2col block) and one write (the
  stage output) instead of five intermediate round-trips;
* conv1 composes away where it shrinks the contraction: for Cin<32
  (stage 1: Cin=2) the 1x1 conv1 commutes with the window gather, so
  ``window(conv1(x)) @ Wp == window(x) @ (W1 compose Wp)`` with
  K=2k*Cin=20 instead of 2k*32=320 — conv1 costs *negative* time.  For
  Cin=64 composition would double K, so conv1 runs as its own XLA 1x1
  matmul (a shape XLA already handles at full MXU tile) and only the
  window chain is fused;
* the two 32-wide gate convs run as ONE 64-wide matmul with a
  block-diagonal weight (half the MACs are structural zeros, but one
  64-lane MXU pass beats two 32-lane passes);
* time conditioning (DiffUNet1 adds a Dense(512 -> Cin) projection of
  the t-embedding to the padded stage input, reference
  ``model/diff3.py:150-153``) folds through the 1x1 conv1 / the
  composed window weight into a per-batch bias row — no in-kernel work;
* inference BatchNorm folds into conv2's weight/bias; PReLU applies
  before the single output store.

``encoder_xla`` runs the *same* math (im2col + matmul chain) entirely
in XLA — the ablation that separates "matmul-chain formulation" from
"Pallas fusion" when the two are benchmarked against the flax conv
path (``scripts/bench_convblock.py``).

Serving-path only (forward; training keeps the flax path and its
autodiff).  Parity vs the flax Encoder is pinned by
``tests/test_pallas_kernels.py``; adoption is measurement-gated like
the Pallas STFT (``PDT_PALLAS=1``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GATE = 32  # BiConvGLU internal width (reference model/diff.py:231-250)


# ---------------------------------------------------------------------------
# XLA-side data movement
# ---------------------------------------------------------------------------


def _im2col(xp, k: int, fo: int):
    """Window-gather the causally padded ``xp [B, T+1, F, C]`` for a
    (2, k) kernel with stride (1, 2) VALID: returns ``[B, T, fo, 2*k*C]``
    with (kt, kf, c) row-major element order (c innermost), matching
    the packed window weights."""
    t = xp.shape[1] - 1
    cols = []
    for kt in range(2):
        xt = xp[:, kt : kt + t]
        for kf in range(k):
            cols.append(xt[:, :, kf : kf + 2 * (fo - 1) + 1 : 2, :])
    return jnp.concatenate(cols, axis=-1)


def _glu_chain_xla(col2, bias_b, wg, bg, w2, b2, alpha, dtype):
    """The stage math after im2col, in plain XLA: window matmul ->
    block-diag gate matmul -> cross gate -> folded conv2+BN -> PReLU.
    ``col2 [B, R, K]`` (rows already weight-multiplied? no: raw cols),
    ``bias_b [B, 1, 64]``."""
    y = col2 + bias_b.astype(col2.dtype)
    m = jnp.einsum("brk,kj->brj", y.astype(dtype), wg.astype(dtype)
                   ).astype(jnp.float32) + bg
    left, right = y[..., :_GATE], y[..., _GATE:]
    lmask = jax.nn.sigmoid(m[..., :_GATE])
    rmask = jax.nn.sigmoid(m[..., _GATE:])
    comb = left * rmask + right * lmask
    y2 = jnp.einsum("brk,kj->brj", comb.astype(dtype), w2.astype(dtype)
                    ).astype(jnp.float32) + b2
    return jnp.where(y2 >= 0, y2, alpha * y2)


# ---------------------------------------------------------------------------
# Pallas kernel: rank-2 matmul chain
# ---------------------------------------------------------------------------


def _chain_kernel(col, w, b, wg, bg, w2, b2, a, out_ref, *, dtype):
    """One (batch, row-tile) block: [rt, K] @ [K, 64] -> gate -> conv2.
    Strictly rank-2 in-kernel (Mosaic-safe)."""
    v = col[0]  # [rt, K]
    y = jnp.dot(v.astype(dtype), w[:],
                preferred_element_type=jnp.float32) + b[0]
    m = jnp.dot(y.astype(dtype), wg[:],
                preferred_element_type=jnp.float32) + bg[:]
    left, right = y[:, :_GATE], y[:, _GATE:]
    lmask = jax.nn.sigmoid(m[:, :_GATE])
    rmask = jax.nn.sigmoid(m[:, _GATE:])
    comb = left * rmask + right * lmask
    y2 = jnp.dot(comb.astype(dtype), w2[:],
                 preferred_element_type=jnp.float32) + b2[:]
    alpha = a[0, 0]
    out_ref[0] = jnp.where(y2 >= 0, y2, alpha * y2).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_r", "dtype", "interpret"),
)
def _chain_pallas(col, w, bias_b, wg, bg, w2, b2, alpha, *,
                  tile_r: int = 256, dtype=jnp.bfloat16,
                  interpret: bool = False):
    """Run the post-im2col chain on ``col [B, R, K]`` with per-batch
    bias ``bias_b [B, 1, 64]`` -> ``[B, R, 64]``."""
    b, r, k = col.shape
    cout = w2.shape[-1]
    rt = min(tile_r, r)
    r_pad = -(-r // rt) * rt
    if r_pad != r:
        col = jnp.pad(col, ((0, 0), (0, r_pad - r), (0, 0)))

    cast = lambda a_: a_.astype(dtype)
    weights = (cast(w), bias_b.astype(jnp.float32),
               cast(wg), bg.astype(jnp.float32).reshape(1, -1),
               cast(w2), b2.astype(jnp.float32).reshape(1, -1))
    alpha2d = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    grid = (b, r_pad // rt)
    w_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda bi, ri: (0,) * arr.ndim,
        memory_space=pltpu.VMEM)
    w_specs = [w_spec(w_) for w_ in weights]
    # per-batch bias: block (1, 1, 64) — last two dims equal the array's
    w_specs[1] = pl.BlockSpec((1, 1, weights[1].shape[-1]),
                              lambda bi, ri: (bi, 0, 0),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_chain_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, cout), dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((1, rt, k), lambda bi, ri: (bi, ri, 0),
                               memory_space=pltpu.VMEM)]
        + w_specs
        + [pl.BlockSpec((1, 1), lambda bi, ri: (0, 0),
                        memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, rt, cout), lambda bi, ri: (bi, ri, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(col, *weights, alpha2d)
    return out[:, :r]


# ---------------------------------------------------------------------------
# Stage + encoder drivers
# ---------------------------------------------------------------------------


def fused_enc_stage(x, ops, tproj=None, *, kernel_f: int,
                    tile_r: int = 256, dtype=jnp.bfloat16,
                    interpret: bool = False, use_pallas: bool = True):
    """One encoder stage on ``x [B, T, F, Cin]`` -> ``[B, T, Fo, 64]``.

    ``ops`` comes from :func:`encoder_stage_params`.  ``tproj [B, Cin]``
    is the optional time-embedding projection added to the padded stage
    input.  ``kernel_f`` is static (shape math) and deliberately NOT in
    ``ops`` so the whole ``ops`` pytree can be a jit *argument*.
    ``use_pallas=False`` runs the identical math in XLA (the
    formulation ablation).
    """
    b, t, f, cin = x.shape
    k = kernel_f
    fo = (f - k) // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))

    if ops["pre"] is not None:  # separate XLA conv1 (Cin >= 32)
        w1, b1 = ops["pre"]
        bias1 = b1[None, None, None, :]
        if tproj is not None:
            bias1 = bias1 + jnp.einsum(
                "bc,cg->bg", tproj.astype(x.dtype), w1.astype(x.dtype)
            )[:, None, None, :].astype(jnp.float32)
        xp = (jnp.einsum("btfc,cg->btfg", xp.astype(dtype),
                         w1.astype(dtype)).astype(jnp.float32)
              + bias1).astype(x.dtype)
        bias_b = jnp.broadcast_to(ops["bmain"][None, None, :], (b, 1, 64))
    else:  # conv1 composed into the window weight (Cin < 32)
        bias_b = jnp.broadcast_to(ops["bmain"][None, None, :], (b, 1, 64))
        if tproj is not None:
            bias_b = bias_b + jnp.einsum(
                "bc,cj->bj", tproj.astype(x.dtype),
                ops["wcsum"].astype(x.dtype)
            )[:, None, :].astype(jnp.float32)

    col = _im2col(xp, k, fo)                       # [B, T, fo, K]
    col2 = col.reshape(b, t * fo, -1)              # free in XLA

    if use_pallas:
        out = _chain_pallas(col2, ops["wmain"], bias_b, ops["wg"],
                            ops["bg"], ops["w2"], ops["b2"], ops["alpha"],
                            tile_r=tile_r, dtype=dtype, interpret=interpret)
    else:
        y = jnp.einsum("brk,kj->brj", col2.astype(dtype),
                       ops["wmain"].astype(dtype)).astype(jnp.float32)
        out = _glu_chain_xla(y, bias_b, ops["wg"], ops["bg"], ops["w2"],
                             ops["b2"], ops["alpha"], dtype).astype(dtype)
    return out.reshape(b, t, fo, -1)


def _fold_bn(w2, b2, bn, eps=1e-5):
    """Fold inference BatchNorm (flax param/batch_stats dicts) into the
    conv2 weight/bias: y*g/sqrt(v+eps) + (beta - mean*g/sqrt(v+eps))."""
    scale = bn["scale"] / jnp.sqrt(bn["var"] + eps)
    return w2 * scale[None, :], b2 * scale + bn["bias"] - bn["mean"] * scale


def encoder_stage_params(stage, bn, prelu, kernel_f: int):
    """Pack one flax Encoder stage's params (``convN`` BiConvGLU dict +
    ``bnN`` param/batch_stats + ``preluN``) into matmul-chain operands.

    Pure jnp ops so the whole pack runs under ONE jit when the params
    live on the TPU (per-leaf device->host readbacks are ruinous on
    this stack — CLAUDE.md)."""
    g = _GATE

    def kb(p):
        return jnp.asarray(p["kernel"]), jnp.asarray(p["bias"])

    w1, b1 = kb(stage["conv1"])            # [1,1,cin,32]
    wl, bl = kb(stage["l"])                # [2,k,32,32]
    wr, br = kb(stage["r"])
    wgl, bgl = kb(stage["l_conv"])         # [1,1,32,32]
    wgr, bgr = kb(stage["r_conv"])
    w2, b2 = kb(stage["conv2"])            # [1,1,32,cout]

    cin = w1.shape[2]
    w1 = w1.reshape(cin, g)
    wp = jnp.concatenate([wl, wr], axis=-1)         # [2,k,32,64]
    bp = jnp.concatenate([bl, br])                  # [64]

    ops = {}
    if cin < g:
        # compose conv1 into the window weight: K = 2*k*cin
        wc = jnp.einsum("cg,tkgo->tkco", w1, wp)    # [2,k,cin,64]
        ops["pre"] = None
        ops["wmain"] = wc.reshape(2 * kernel_f * cin, 2 * g)
        ops["bmain"] = bp + jnp.einsum("g,tkgo->o", b1, wp)
        ops["wcsum"] = wc.sum(axis=(0, 1))          # [cin, 64] for tproj
    else:
        ops["pre"] = (w1, b1)
        ops["wmain"] = wp.reshape(2 * kernel_f * g, 2 * g)
        ops["bmain"] = bp
        ops["wcsum"] = None

    # block-diagonal gate weight: [l r] @ [[wgl 0],[0 wgr]]
    wg = jnp.zeros((2 * g, 2 * g), wgl.dtype)
    wg = wg.at[:g, :g].set(wgl.reshape(g, g))
    wg = wg.at[g:, g:].set(wgr.reshape(g, g))
    ops["wg"] = wg
    ops["bg"] = jnp.concatenate([bgl, bgr])
    ops["w2"], ops["b2"] = _fold_bn(
        w2.reshape(g, -1), b2,
        {"scale": jnp.asarray(bn["scale"]), "bias": jnp.asarray(bn["bias"]),
         "mean": jnp.asarray(bn["mean"]), "var": jnp.asarray(bn["var"])},
    )
    ops["alpha"] = jnp.asarray(prelu["alpha"]).reshape(())
    return ops


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
        tp = (jnp.asarray(tp["kernel"]), jnp.asarray(tp["bias"])) \
            if tp is not None else None
        packed.append((ops, tp))
    return packed


def encoder_pallas(x, packed, temb=None, *, dtype=jnp.bfloat16,
                   tile_r: int = 256, interpret: bool = False,
                   use_pallas: bool = True):
    """Full 5-stage encoder forward (inference) on the fused kernels.
    ``temb [B, 512]`` is the time embedding for conditioned encoders
    (DiffUNet1); the tiny per-stage Dense runs in XLA, the projection
    folds into the stage's per-batch bias row."""
    skips = []
    for (ops, tp), kf in zip(packed, _ENC_KERNELS):
        tproj = None
        if tp is not None and temb is not None:
            tproj = jnp.dot(temb, tp[0].astype(temb.dtype)) + tp[1]
        x = fused_enc_stage(x, ops, tproj, kernel_f=kf, tile_r=tile_r,
                            dtype=dtype, interpret=interpret,
                            use_pallas=use_pallas)
        skips.append(x)
    return x, skips


def encoder_xla(x, packed, temb=None, *, dtype=jnp.bfloat16):
    """The matmul-chain formulation entirely in XLA (no Pallas) — the
    ablation separating formulation from fusion."""
    return encoder_pallas(x, packed, temb, dtype=dtype, use_pallas=False)
