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

import jax.numpy as jnp

from prior_diffuse_tpu.models import layers as tl
from prior_diffuse_tpu.models.diffunet import TCM, Decoder
from prior_diffuse_tpu.ops.pallas.convblock_kernel import (
    encoder_pallas,
    pack_encoder,
)


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
    real = Decoder(time_cond, dtype=dt).apply(
        core_vars("de_real"), x, skips, temb, False)
    imag = Decoder(time_cond, dtype=dt).apply(
        core_vars("de_imag"), x, skips, temb, False)
    return jnp.concatenate([real, imag], axis=-1)
