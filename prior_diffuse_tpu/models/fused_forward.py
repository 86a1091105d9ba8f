"""Hybrid serving forward for the DiffUNet family: fused encoder,
flax remainder.

Round-3 attribution (docs/PERF_r3.json) pinned 85 % of the enhance
batch on the 6 DiffUNet1 forwards (reference hot loop
``trainer/complex_ddpm_trainer.py:456-493``); the encoder's
small-channel convs are the low-MXU-utilization part.  This module
rebuilds the *inference* forward functionally so the encoder can run on
the matmul-chain formulation (``ops/pallas/convblock_kernel.py`` —
Pallas-fused or pure-XLA, measurement-picked) while the TCM stacks and
decoders keep their flax implementations applied as standalone
submodules on the same parameter subtrees.

Training and default serving keep the flax path; this is opt-in via
the serving layer once ``scripts/bench_convblock.py`` shows a win
(the Pallas-STFT adoption discipline).

Parity vs ``DiffUNet1.apply`` / ``DiffUNet.apply`` is pinned by
``tests/test_fused_forward.py``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from prior_diffuse_tpu.models import layers as tl
from prior_diffuse_tpu.models.diffunet import TCM, Decoder, Encoder
from prior_diffuse_tpu.ops.pallas.convblock_kernel import (
    encoder_pallas,
    pack_encoder,
)


_DEC_KERNELS = {5: 3, 4: 3, 3: 3, 2: 3, 1: 5}  # freq kernel per stage
_G = 32  # BiConvTransGLU internal width


def _dual_dec_stage(dr, di, bn, prelu, last: bool, cout: int,
                    fold_bn: bool = True):
    """Block-diagonally merge one decoder stage's de_real/de_imag
    BiConvTransGLU params into dual-branch operands.  Channel layout is
    branch-major throughout: ``[real | imag]``.  ``fold_bn=False`` packs
    the conv chain only (train mode: BN runs on batch statistics and
    cannot be folded into weights; the caller applies it)."""
    g = _G

    def kb(p):
        return jnp.asarray(p["kernel"]), jnp.asarray(p["bias"])

    st: Dict[str, Any] = {}
    w1r, b1r = kb(dr["conv1"])  # [1,1,128,32]
    w1i, b1i = kb(di["conv1"])
    cin = w1r.shape[2]          # 128 = branch x (64) || skip (64)
    half = cin // 2
    w1r = w1r.reshape(cin, g)
    w1i = w1i.reshape(cin, g)
    w1 = jnp.zeros((cin + half, 2 * g), w1r.dtype)
    w1 = w1.at[:half, :g].set(w1r[:half])          # z_real rows
    w1 = w1.at[half : cin, g:].set(w1i[:half])     # z_imag rows
    w1 = w1.at[cin:, :g].set(w1r[half:])           # shared skip rows
    w1 = w1.at[cin:, g:].set(w1i[half:])
    st["w1"], b1 = w1, jnp.concatenate([b1r, b1i])
    if "tp" in dr:  # fold the per-branch t-projection through conv1
        tpw_r, tpb_r = kb(dr["tp"])  # [512,128],[128]
        tpw_i, tpb_i = kb(di["tp"])
        st["tp2b"] = jnp.concatenate(
            [tpw_r @ w1r, tpw_i @ w1i], axis=1)    # [512, 64]
        b1 = b1 + jnp.concatenate([tpb_r @ w1r, tpb_i @ w1i])
    st["b1"] = b1

    def pair(d):
        (wl, bl), (wr_, br_) = kb(d["l"]), kb(d["r"])  # [2,k,32,32]
        return jnp.concatenate([wl, wr_], -1), jnp.concatenate([bl, br_])

    wp_r, bp_r = pair(dr)
    wp_i, bp_i = pair(di)
    kh, kw = wp_r.shape[:2]
    wp = jnp.zeros((kh, kw, 2 * g, 4 * g), wp_r.dtype)
    wp = wp.at[:, :, :g, : 2 * g].set(wp_r)
    wp = wp.at[:, :, g:, 2 * g :].set(wp_i)
    st["wp"], st["bp"] = wp, jnp.concatenate([bp_r, bp_i])

    wg = jnp.zeros((4 * g, 4 * g), wp_r.dtype)
    bg = []
    for bi, d in enumerate((dr, di)):
        for gi, name in enumerate(("l_conv", "r_conv")):
            wk, bk = kb(d[name])  # [1,1,32,32]
            off = (2 * bi + gi) * g
            wg = wg.at[off : off + g, off : off + g].set(wk.reshape(g, g))
            bg.append(bk)
    st["wg"], st["bg"] = wg, jnp.concatenate(bg)

    w2r, b2r = kb(dr["conv2"])  # [1,1,32,cout]
    w2i, b2i = kb(di["conv2"])
    w2 = jnp.zeros((2 * g, 2 * cout), w2r.dtype)
    w2 = w2.at[:g, :cout].set(w2r.reshape(g, cout))
    w2 = w2.at[g:, cout:].set(w2i.reshape(g, cout))
    b2 = jnp.concatenate([b2r, b2i])
    if not last and fold_bn:  # fold inference BN (commutes with the time chomp)
        bnr, bni = bn
        cat = lambda k: jnp.concatenate(
            [jnp.asarray(bnr[k]), jnp.asarray(bni[k])])
        scale = cat("scale") / jnp.sqrt(cat("var") + 1e-5)
        w2 = w2 * scale[None, :]
        b2 = b2 * scale + cat("bias") - cat("mean") * scale
        ar = jnp.asarray(prelu[0]["alpha"]).reshape(())
        ai = jnp.asarray(prelu[1]["alpha"]).reshape(())
        st["alpha"] = jnp.concatenate(
            [jnp.broadcast_to(ar, (cout,)), jnp.broadcast_to(ai, (cout,))])
    st["w2"], st["b2"] = w2, b2
    return st


def pack_dual_decoder(core_params, core_stats=None, *, fold_bn: bool = True):
    """Pack the two Decoder branches (``de_real``/``de_imag``) into one
    block-diagonal dual-branch stage list: every conv in the two
    structurally identical branches becomes ONE op at doubled lane
    width (the encoder-kernel gate trick at branch scale).  Pure jnp —
    jit the call when params live on device.

    ``fold_bn=True`` (serving): inference BN + PReLU are folded into the
    stage operands (needs ``core_stats``).  ``fold_bn=False`` (training):
    conv chain only — BN must run on batch statistics, the caller applies
    it (:func:`dual_decoder_train_forward`)."""
    pr, pi = core_params["de_real"], core_params["de_imag"]
    if fold_bn:
        sr, si = core_stats["de_real"], core_stats["de_imag"]
    stages = []
    for idx in (5, 4, 3, 2, 1):
        last = idx == 1
        bn = prelu = (None, None)
        if not last and fold_bn:
            bn = ({**pr[f"bn{idx}"]["BatchNorm_0"],
                   **sr[f"bn{idx}"]["BatchNorm_0"]},
                  {**pi[f"bn{idx}"]["BatchNorm_0"],
                   **si[f"bn{idx}"]["BatchNorm_0"]})
            prelu = (pr[f"prelu{idx}"], pi[f"prelu{idx}"])
        stages.append(_dual_dec_stage(
            pr[f"de{idx}"], pi[f"de{idx}"], bn, prelu, last,
            1 if last else 64, fold_bn=fold_bn))
    return stages


def _mm(a, w, b, dtype):
    cd = dtype or a.dtype
    return (jnp.einsum("btfc,cd->btfd", a.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32)
            + b).astype(a.dtype)


def _dual_stage_chain(st, z, skip, temb, dtype, *, split_mm=False,
                      first=False):
    """One dual-decoder stage's conv chain: skip concat -> conv1 (+ the
    folded t-projection) -> paired conv-transpose -> cross gate -> conv2
    -> time chomp.  BN/PReLU are the caller's: folded into the operands
    for serving, train-mode flax BatchNorm for training.

    ``split_mm`` (PDT_DUAL_V2 serving experiment): the roofline
    (docs/PERF_r5_notes.md) shows this chain HBM-bound at 2.45x its
    fused ceiling — avoid materializing the [z | skip] concat by
    splitting conv1 into z@w1_z + skip@w1_s (identical MACs, f32
    accumulation per part), and on the first stage fold the duplicated
    [x | x] branch input into one matmul with summed kernel halves
    (halves that op's reads AND MACs)."""
    b1 = st["b1"]
    if temb is not None and "tp2b" in st:
        cd = dtype or temb.dtype
        b1 = b1 + jnp.einsum("bc,cd->bd", temb.astype(cd),
                             st["tp2b"].astype(cd),
                             preferred_element_type=jnp.float32)
        b1 = b1[:, None, None, :]
    if split_mm:
        cz = z.shape[-1] if not first else 2 * z.shape[-1]
        w1z, w1s = st["w1"][:cz], st["w1"][cz:]
        if first:  # z would be [x | x]: fold the kernel halves instead
            half = cz // 2
            w1z = w1z[:half] + w1z[half:]
        cd = dtype or z.dtype
        h = jnp.einsum("btfc,cd->btfd", z.astype(cd), w1z.astype(cd),
                       preferred_element_type=jnp.float32)
        h = h + jnp.einsum("btfc,cd->btfd", skip.astype(cd),
                           w1s.astype(cd),
                           preferred_element_type=jnp.float32)
        h = (h + b1).astype(z.dtype)
    else:
        inp = jnp.concatenate([z, skip.astype(z.dtype)], axis=-1)
        h = _mm(inp, st["w1"], b1, dtype)
    y = tl.conv_transpose(h, st["wp"], st["bp"], (1, 2), (0, 0),
                          dtype=dtype).astype(z.dtype)
    gate = jax.nn.sigmoid(_mm(y, st["wg"], st["bg"], dtype))
    return _gate_combine_out(st, y, gate, dtype)


def _gate_combine_out(st, y, gate, dtype):
    g = _G
    comb = jnp.concatenate(
        [y[..., :g] * gate[..., g : 2 * g]
         + y[..., g : 2 * g] * gate[..., :g],
         y[..., 2 * g : 3 * g] * gate[..., 3 * g :]
         + y[..., 3 * g :] * gate[..., 2 * g : 3 * g]],
        axis=-1)
    out = _mm(comb, st["w2"], st["b2"], dtype)
    return tl.chomp_time_end(out, 1)


def dual_decoder_forward(stages, x, skips, temb=None, *,
                         dtype=jnp.bfloat16, split_mm=False):
    """Both decoder branches in one op chain (inference: BN folded).
    ``x [B, T, 4, 64]`` is the bottleneck, ``skips`` the encoder
    outputs; returns ``[B, T, 161, 2]`` with channels ``[real | imag]``
    — exactly the flax ``concat([de_real(...), de_imag(...)], -1)``.

    ``split_mm`` routes every stage through the concat-free conv1
    formulation (see ``_dual_stage_chain``) — the PDT_DUAL_V2
    HBM-traffic experiment; MAC-identical, fp-reassociated."""
    first = True
    z = x if split_mm else jnp.concatenate([x, x], axis=-1)
    for st, skip in zip(stages, reversed(skips)):
        out = _dual_stage_chain(st, z, skip, temb, dtype,
                                split_mm=split_mm, first=first)
        if "alpha" in st:
            a = st["alpha"].astype(out.dtype)
            out = jnp.where(out >= 0, out, a * out)
        z = out
        first = False
    return z


def dual_decoder_train_forward(stages, core_params, core_stats, x, skips,
                               temb=None, *, dtype=None):
    """Train-mode dual decoder: the same block-diagonal op chain as
    :func:`dual_decoder_forward`, but with BatchNorm unfolded and run in
    train mode over the concatenated ``[real | imag]`` channels.  BN
    statistics are per-channel, so one 128-channel BatchNorm over the
    concatenation is *exactly* the two per-branch 64-channel BatchNorms
    (same normalization, same running-stat update); the updated stats
    are split back into the two canonical branch subtrees.

    ``stages`` must come from ``pack_dual_decoder(..., fold_bn=False)``
    — pack inside the loss so gradients flow through the block-diagonal
    scatter back to the canonical ``de_real``/``de_imag`` leaves.

    Returns ``(y, de_real_stats, de_imag_stats)``."""
    pr, pi = core_params["de_real"], core_params["de_imag"]
    sr, si = core_stats["de_real"], core_stats["de_imag"]
    new_r, new_i = {}, {}
    z = jnp.concatenate([x, x], axis=-1)
    for st, idx, skip in zip(stages, (5, 4, 3, 2, 1), reversed(skips)):
        out = _dual_stage_chain(st, z, skip, temb, dtype)
        if idx != 1:
            cout = out.shape[-1] // 2
            br = pr[f"bn{idx}"]["BatchNorm_0"]
            bi = pi[f"bn{idx}"]["BatchNorm_0"]
            mr = sr[f"bn{idx}"]["BatchNorm_0"]
            mi = si[f"bn{idx}"]["BatchNorm_0"]
            cat = lambda a, b, k: jnp.concatenate(
                [jnp.asarray(a[k]), jnp.asarray(b[k])])
            bn_vars = {
                "params": {"BatchNorm_0": {"scale": cat(br, bi, "scale"),
                                           "bias": cat(br, bi, "bias")}},
                "batch_stats": {"BatchNorm_0": {"mean": cat(mr, mi, "mean"),
                                                "var": cat(mr, mi, "var")}},
            }
            out, mut = tl.BatchNorm(use_running_average=False,
                                    dtype=dtype).apply(
                bn_vars, out, mutable=["batch_stats"])
            upd = mut["batch_stats"]["BatchNorm_0"]
            new_r[f"bn{idx}"] = {"BatchNorm_0": {
                "mean": upd["mean"][:cout], "var": upd["var"][:cout]}}
            new_i[f"bn{idx}"] = {"BatchNorm_0": {
                "mean": upd["mean"][cout:], "var": upd["var"][cout:]}}
            ar = jnp.asarray(pr[f"prelu{idx}"]["alpha"]).reshape(())
            ai = jnp.asarray(pi[f"prelu{idx}"]["alpha"]).reshape(())
            a = jnp.concatenate(
                [jnp.broadcast_to(ar, (cout,)),
                 jnp.broadcast_to(ai, (cout,))]).astype(out.dtype)
            out = jnp.where(out >= 0, out, a * out)
        z = out
    return z, new_r, new_i


def dual_train_forward(variables, x, x_init=None, t=None, *,
                       num_steps: int = 50, dtype=None):
    """Train-mode forward for the DiffUNet family with the dual
    block-diagonal decoder: numerically equivalent to
    ``model.apply(..., train=True, mutable=["batch_stats"])`` on
    ``DiffUNet1(x, x_init, t)``, ``Nocon(x, t)`` (``x_init=None``) or
    ``DiffUNet(x)`` (``x_init=None, t=None``), but with the two decoder
    branches fused into one op chain at doubled lane occupancy — the
    serving formulation that measured 1.53x on the decoder segment
    (docs/PERF_fwdsplit_r4.json), applied to the training hot loop
    (reference ``trainer/complex_ddpm_trainer.py:740-757``).

    Preprocess, time embedding, encoder and TCM stacks run as the flax
    submodules on their canonical parameter subtrees (train mode,
    mutable batch stats); only the decoder pair is reformulated.

    Returns ``(y, new_batch_stats)`` with ``new_batch_stats`` in the
    canonical variable-tree structure (drop-in for the flax
    ``updated["batch_stats"]``)."""
    params, stats = variables["params"], variables["batch_stats"]
    core_p, core_s = params["core"], stats["core"]
    if "preprocess" in params:  # DiffUNet1's x/x_init merge conv
        xcat = jnp.concatenate([x, x_init.astype(x.dtype)], axis=-1)
        x = tl.conv2d(2, (1, 1), dtype=dtype).apply(
            {"params": params["preprocess"]}, xcat)
    temb = None
    if "time_embedding" in params:
        temb = tl.TimeEmbedding(num_steps).apply(
            {"params": params["time_embedding"]}, t)
        if dtype is not None:
            temb = temb.astype(dtype)
    time_cond = temb is not None

    (xe, skips), mut = Encoder(time_cond, dtype=dtype).apply(
        {"params": core_p["en"], "batch_stats": core_s["en"]},
        x, temb, True, mutable=["batch_stats"])
    new_core = {"en": mut["batch_stats"]}

    b, tt, f, c = xe.shape  # f=4, c=64
    flat = xe.transpose(0, 1, 3, 2).reshape(b, tt, c * f)
    for i in range(3):
        flat, mut = TCM(dtype=dtype).apply(
            {"params": core_p[f"tcm{i + 1}"],
             "batch_stats": core_s[f"tcm{i + 1}"]},
            flat, True, mutable=["batch_stats"])
        new_core[f"tcm{i + 1}"] = mut["batch_stats"]
    xb = flat.reshape(b, tt, c, f).transpose(0, 1, 3, 2)

    stages = pack_dual_decoder(core_p, fold_bn=False)
    y, de_r, de_i = dual_decoder_train_forward(
        stages, core_p, core_s, xb, skips, temb, dtype=dtype)
    new_core["de_real"], new_core["de_imag"] = de_r, de_i
    return y, {"core": new_core}


def pack_unet(variables) -> Dict[str, Any]:
    """Pack a ``DiffUNet``/``DiffUNet1``/``Nocon`` variable tree for
    :func:`fused_unet_forward`.  Host-side, once per weight change; the
    result is a pytree of arrays safe to pass as a jit *argument* (never
    close over it — CLAUDE.md constant-reshipping trap)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    packed: Dict[str, Any] = {
        "enc": pack_encoder(params["core"]["en"],
                            stats["core"]["en"]),
        "core_params": {k: params["core"][k] for k in params["core"]
                        if k != "en"},
        "core_stats": {k: stats["core"][k] for k in stats["core"]
                       if k != "en"},
        "dual_dec": pack_dual_decoder(params["core"], stats["core"]),
    }
    if "preprocess" in params:  # DiffUNet1's x/x_init merge conv
        k = jnp.asarray(params["preprocess"]["kernel"])  # [1,1,Cin,2]
        packed["pre_w"] = k.reshape(k.shape[2], k.shape[3])
        packed["pre_b"] = jnp.asarray(params["preprocess"]["bias"])
    if "time_embedding" in params:
        packed["temb_params"] = params["time_embedding"]
    return packed


def fused_unet_forward(packed, x, x_init=None, t=None, *,
                       num_steps: int = 50, dtype=jnp.bfloat16,
                       use_pallas: bool = True,
                       dual_decoder: bool = False,
                       dual_split: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """Inference forward matching ``DiffUNet1(x, x_init, t)`` (both
    conditioning inputs), ``Nocon(x, t)`` (``x_init=None``), or
    ``DiffUNet(x)`` (``x_init=None, t=None``)."""
    if "pre_w" in packed:
        xcat = jnp.concatenate([x, x_init.astype(x.dtype)], axis=-1)
        x = (jnp.einsum("btfc,cd->btfd", xcat.astype(dtype),
                        packed["pre_w"].astype(dtype))
             .astype(jnp.float32) + packed["pre_b"]).astype(x.dtype)

    temb = None
    if t is not None:
        temb = tl.TimeEmbedding(num_steps).apply(
            {"params": packed["temb_params"]}, t).astype(x.dtype)

    x, skips = encoder_pallas(x, packed["enc"], temb, dtype=dtype,
                              use_pallas=use_pallas, interpret=interpret)

    core_vars = lambda name: {
        "params": packed["core_params"][name],
        "batch_stats": packed["core_stats"].get(name, {}),
    }
    b, tt, f, c = x.shape  # f=4, c=64
    flat = x.transpose(0, 1, 3, 2).reshape(b, tt, c * f)
    time_cond = temb is not None
    dt = None if dtype == jnp.float32 else dtype
    for i in range(3):
        flat = TCM(dtype=dt).apply(
            {"params": packed["core_params"][f"tcm{i + 1}"],
             "batch_stats": packed["core_stats"][f"tcm{i + 1}"]},
            flat, False)
    x = flat.reshape(b, tt, c, f).transpose(0, 1, 3, 2)
    if dual_decoder:
        return dual_decoder_forward(packed["dual_dec"], x, skips, temb,
                                    dtype=dtype, split_mm=dual_split)
    real = Decoder(time_cond, dtype=dt).apply(
        core_vars("de_real"), x, skips, temb, False)
    imag = Decoder(time_cond, dtype=dt).apply(
        core_vars("de_imag"), x, skips, temb, False)
    return jnp.concatenate([real, imag], axis=-1)
