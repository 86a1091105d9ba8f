"""Parity of the hybrid serving forward (fused/matmul-chain encoder +
flax TCM/decoders) vs the flax DiffUNet family apply."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prior_diffuse_tpu.models.diffunet import DiffUNet, DiffUNet1
from prior_diffuse_tpu.models.fused_forward import (
    fused_unet_forward,
    pack_unet,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _randomize_bn(stats, rng):
    def visit(tree):
        for k, v in tree.items():
            if k == "BatchNorm_0":
                v["mean"] = rng.standard_normal(
                    v["mean"].shape).astype(np.float32) * 0.1
                v["var"] = (0.5 + rng.random(v["var"].shape)
                            ).astype(np.float32)
            elif isinstance(v, dict):
                visit(v)
    visit(stats)
    return stats


def test_fused_forward_diffunet1(rng):
    """Full DiffUNet1 (x, x_init, t) hybrid forward == flax apply."""
    net = DiffUNet1()
    x = jnp.asarray(rng.standard_normal((2, 23, 161, 2)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((2, 23, 161, 2)).astype(np.float32))
    t = jnp.asarray([3.7, 12.2], jnp.float32)
    variables = jax.jit(functools.partial(net.init, train=False))(
        jax.random.PRNGKey(0), x, xi, t)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = _randomize_bn(jax.tree.map(np.asarray,
                                       variables["batch_stats"]), rng)
    v = {"params": params, "batch_stats": stats}
    y_ref = net.apply(v, x, xi, t, False)
    packed = pack_unet(v)
    y = fused_unet_forward(packed, x, xi, t, num_steps=net.num_steps,
                           dtype=jnp.float32, use_pallas=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-4)
    y_pal = fused_unet_forward(packed, x, xi, t, num_steps=net.num_steps,
                               dtype=jnp.float32, use_pallas=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=3e-4)
    # block-diagonal dual-branch decoder (both branches in one op chain)
    y_dd = fused_unet_forward(packed, x, xi, t, num_steps=net.num_steps,
                              dtype=jnp.float32, use_pallas=False,
                              dual_decoder=True)
    np.testing.assert_allclose(np.asarray(y_dd), np.asarray(y_ref),
                               atol=3e-4)
    # concat-free split-matmul variant (PDT_FUSED_ENC=dual2, the
    # roofline-driven HBM-traffic experiment): MAC-identical, only fp
    # reassociation differs
    y_d2 = fused_unet_forward(packed, x, xi, t, num_steps=net.num_steps,
                              dtype=jnp.float32, use_pallas=False,
                              dual_decoder=True, dual_split=True)
    np.testing.assert_allclose(np.asarray(y_d2), np.asarray(y_ref),
                               atol=3e-4)


def test_enhance_batch_fused_matches_default(tmp_path, rng, monkeypatch):
    """PDT_FUSED_ENC=xla serving must reproduce the default flax path
    (same rng => same sampler draws; only the denoiser formulation
    changes)."""
    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    corpus = synthetic.write_corpus(
        str(tmp_path / "c"), n_train=2, n_test=1, min_len=6000,
        max_len=8000, seed=5,
    )
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=2, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=DiffusionConfig(),
    )
    run = RunConfig(assets=str(tmp_path / "a"), doc="t", data_root=corpus,
                    joint=True)
    tr = ComplexDDPMTrainer(run, exp)

    wav = np.zeros((2, 8000), np.float32)
    wav[0, :6000] = rng.standard_normal(6000).astype(np.float32) * 0.2
    wav[1] = rng.standard_normal(8000).astype(np.float32) * 0.2
    key = jax.random.PRNGKey(42)

    monkeypatch.delenv("PDT_FUSED_ENC", raising=False)
    out_ref = np.asarray(tr.enhance_batch(wav, key))
    for mode in ("xla", "dual", "dual2"):
        monkeypatch.setenv("PDT_FUSED_ENC", mode)
        out_fused = np.asarray(tr.enhance_batch(wav, key))
        assert out_fused.shape == out_ref.shape
        rel = (np.sqrt(np.mean((out_fused - out_ref) ** 2))
               / max(np.sqrt(np.mean(out_ref ** 2)), 1e-12))
        assert rel < 2e-3, (mode, rel)


@pytest.mark.parametrize("mode_kw", [
    {"deltamu": True},            # Nocon denoiser: eps(x_t, t)
    {"cond_noisy": True},         # 4-channel conditioning concat
])
def test_enhance_batch_fused_other_modes(tmp_path, rng, monkeypatch,
                                         mode_kw):
    """The fused serving route must reproduce the flax path in the
    deltamu (Nocon, no x_init arg) and cond_noisy (4-channel
    preprocess) modes too — the model_fn arg routing differs per
    mode."""
    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    corpus = synthetic.write_corpus(
        str(tmp_path / "c"), n_train=2, n_test=1, min_len=6000,
        max_len=8000, seed=9,
    )
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=2, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=DiffusionConfig(**mode_kw),
    )
    run = RunConfig(assets=str(tmp_path / "a"), doc="t", data_root=corpus,
                    joint=True)
    tr = ComplexDDPMTrainer(run, exp)
    wav = (rng.standard_normal((2, 8000)) * 0.2).astype(np.float32)
    key = jax.random.PRNGKey(4)
    monkeypatch.delenv("PDT_FUSED_ENC", raising=False)
    out_ref = np.asarray(tr.enhance_batch(wav, key))
    monkeypatch.setenv("PDT_FUSED_ENC", "dual")
    out_fused = np.asarray(tr.enhance_batch(wav, key))
    rel = (np.sqrt(np.mean((out_fused - out_ref) ** 2))
           / max(np.sqrt(np.mean(out_ref ** 2)), 1e-12))
    assert rel < 2e-3, rel


def test_fused_default_rule():
    """bf16 serving defaults to the dual decoder (measured 1.53x on
    the dominant segment); f32 keeps exact-flax; 'flax' forces off."""
    from prior_diffuse_tpu.training.ddpm_trainer import _resolve_fused

    assert _resolve_fused("", jnp.float32) == ""
    assert _resolve_fused("", jnp.bfloat16) == "dual"
    assert _resolve_fused("flax", jnp.bfloat16) == ""
    assert _resolve_fused("xla", jnp.float32) == "xla"
    assert _resolve_fused("pallas", jnp.bfloat16) == "pallas"


def test_fused_forward_prior(rng):
    """Unconditioned DiffUNet prior hybrid forward == flax apply."""
    net = DiffUNet()
    x = jnp.asarray(rng.standard_normal((2, 19, 161, 2)).astype(np.float32))
    variables = jax.jit(functools.partial(net.init, train=False))(
        jax.random.PRNGKey(1), x)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = _randomize_bn(jax.tree.map(np.asarray,
                                       variables["batch_stats"]), rng)
    v = {"params": params, "batch_stats": stats}
    y_ref = net.apply(v, x, False)
    packed = pack_unet(v)
    y = fused_unet_forward(packed, x, dtype=jnp.float32, use_pallas=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-4)
    y_dd = fused_unet_forward(packed, x, dtype=jnp.float32,
                              use_pallas=False, dual_decoder=True)
    np.testing.assert_allclose(np.asarray(y_dd), np.asarray(y_ref),
                               atol=3e-4)
