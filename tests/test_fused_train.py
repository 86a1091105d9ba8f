"""Train-mode dual-decoder parity: the block-diagonal fused forward
(``models/fused_forward.py::dual_train_forward``) must reproduce the
flax ``apply(train=True, mutable=["batch_stats"])`` — outputs, updated
batch statistics, and parameter gradients — for the DiffUNet family.

The fusion claim rests on BatchNorm statistics being per-channel: one
128-channel train-mode BN over the concatenated [real | imag] decoder
channels is exactly the two per-branch 64-channel BNs.  These tests pin
that equivalence end to end, including through ``jax.grad``."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prior_diffuse_tpu.models.diffunet import DiffUNet, DiffUNet1
from prior_diffuse_tpu.models.fused_forward import dual_train_forward


@pytest.fixture
def rng():
    return np.random.default_rng(11)


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


def _tree_allclose(a, b, atol):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): x
          for p, x in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for p, x in la:
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(lb[jax.tree_util.keystr(p)]),
            atol=atol, err_msg=jax.tree_util.keystr(p))


def _diffunet1_vars(rng):
    net = DiffUNet1()
    x = jnp.asarray(rng.standard_normal((2, 9, 161, 2)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((2, 9, 161, 2)).astype(np.float32))
    t = jnp.asarray([3.7, 12.2], jnp.float32)
    variables = jax.jit(functools.partial(net.init, train=False))(
        jax.random.PRNGKey(0), x, xi, t)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = _randomize_bn(jax.tree.map(np.asarray,
                                       variables["batch_stats"]), rng)
    return net, {"params": params, "batch_stats": stats}, x, xi, t


def test_dual_train_forward_diffunet1(rng):
    """Output and updated batch stats match the flax train apply."""
    net, v, x, xi, t = _diffunet1_vars(rng)
    y_ref, mut_ref = net.apply(v, x, xi, t, True, mutable=["batch_stats"])
    y, new_stats = dual_train_forward(v, x, xi, t, num_steps=net.num_steps)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-4)
    # identical tree structure (drop-in for the state update / donation)
    assert (jax.tree_util.tree_structure(new_stats)
            == jax.tree_util.tree_structure(mut_ref["batch_stats"]))
    _tree_allclose(new_stats, mut_ref["batch_stats"], atol=2e-4)


def test_dual_train_forward_grads(rng):
    """Parameter gradients through the block-diagonal repack equal the
    flax path's — every canonical leaf, including the decoder convs the
    scatter re-packs, the BN affines, and the PReLU slopes."""
    net, v, x, xi, t = _diffunet1_vars(rng)
    stats = v["batch_stats"]

    def loss_flax(params):
        y, _ = net.apply({"params": params, "batch_stats": stats},
                         x, xi, t, True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    def loss_fused(params):
        y, _ = dual_train_forward({"params": params, "batch_stats": stats},
                                  x, xi, t, num_steps=net.num_steps)
        return jnp.sum(y ** 2)

    g_ref = jax.grad(loss_flax)(v["params"])
    g = jax.grad(loss_fused)(v["params"])
    assert (jax.tree_util.tree_structure(g)
            == jax.tree_util.tree_structure(g_ref))
    gmax = max(float(np.abs(np.asarray(x)).max())
               for x in jax.tree_util.tree_leaves(g_ref))
    for (p, a), b in zip(jax.tree_util.tree_leaves_with_path(g),
                         jax.tree_util.tree_leaves(g_ref)):
        key = jax.tree_util.keystr(p)
        a, b = np.asarray(a), np.asarray(b)
        # A bias feeding straight into a train-mode BatchNorm has an
        # analytically ZERO gradient (mean subtraction cancels constant
        # channel shifts) — both paths produce only fp summation noise
        # there; pin the analytic property instead of noise-vs-noise.
        # encoder: conv{1..5}.conv2 -> bn; decoder: de{2..5}.conv2 -> bn
        # (de1 is the last stage, no BN -> genuinely nonzero grad)
        if key.endswith("['conv2']['bias']") and "['de1']" not in key:
            assert np.abs(a).max() < 0.05 * gmax, key
            assert np.abs(b).max() < 0.05 * gmax, key
            continue
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=key)


def test_dual_train_forward_nocon(rng):
    """Nocon (deltamu's unconditional denoiser: no preprocess conv,
    x_init=None, time conditioning only) through the fused train path —
    the trainer's bf16 default routes deltamu here
    (ddpm_trainer._ddpm_apply), so pin output + stats + grads parity
    like the DiffUNet1 case."""
    from prior_diffuse_tpu.models.diffunet import Nocon

    net = Nocon()
    x = jnp.asarray(rng.standard_normal((2, 9, 161, 2)).astype(np.float32))
    t = jnp.asarray([1.4, 40.9], jnp.float32)
    variables = jax.jit(functools.partial(net.init, train=False))(
        jax.random.PRNGKey(2), x, t)
    stats = _randomize_bn(jax.tree.map(np.asarray,
                                       variables["batch_stats"]), rng)
    v = {"params": variables["params"], "batch_stats": stats}
    y_ref, mut_ref = net.apply(v, x, t, True, mutable=["batch_stats"])
    y, new_stats = dual_train_forward(v, x, None, t,
                                      num_steps=net.num_steps)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-4)
    assert (jax.tree_util.tree_structure(new_stats)
            == jax.tree_util.tree_structure(mut_ref["batch_stats"]))
    _tree_allclose(new_stats, mut_ref["batch_stats"], atol=2e-4)

    g_ref = jax.grad(lambda p: jnp.sum(net.apply(
        {"params": p, "batch_stats": stats}, x, t, True,
        mutable=["batch_stats"])[0] ** 2))(v["params"])
    g = jax.grad(lambda p: jnp.sum(dual_train_forward(
        {"params": p, "batch_stats": stats}, x, None, t,
        num_steps=net.num_steps)[0] ** 2))(v["params"])
    assert (jax.tree_util.tree_structure(g)
            == jax.tree_util.tree_structure(g_ref))
    for (p, a), b in zip(jax.tree_util.tree_leaves_with_path(g),
                         jax.tree_util.tree_leaves(g_ref)):
        key = jax.tree_util.keystr(p)
        a, b = np.asarray(a), np.asarray(b)
        if key.endswith("['conv2']['bias']") and "['de1']" not in key:
            continue  # analytically-zero grad (see grads test above)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=key)


def test_dual_train_forward_cond_noisy(rng):
    """The cond_noisy extension widens DiffUNet1's conditioner to 4
    channels ([x_init, feat/c]) before the preprocess merge conv —
    the fused path's xcat concat must match the flax apply with the
    same widened variables."""
    net = DiffUNet1()
    x = jnp.asarray(rng.standard_normal((2, 9, 161, 2)).astype(np.float32))
    cond = jnp.asarray(
        rng.standard_normal((2, 9, 161, 4)).astype(np.float32))
    t = jnp.asarray([3.7, 12.2], jnp.float32)
    variables = jax.jit(functools.partial(net.init, train=False))(
        jax.random.PRNGKey(4), x, cond, t)
    assert variables["params"]["preprocess"]["kernel"].shape[-2] == 6
    stats = _randomize_bn(jax.tree.map(np.asarray,
                                       variables["batch_stats"]), rng)
    v = {"params": variables["params"], "batch_stats": stats}
    y_ref, mut_ref = net.apply(v, x, cond, t, True,
                               mutable=["batch_stats"])
    y, new_stats = dual_train_forward(v, x, cond, t,
                                      num_steps=net.num_steps)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-4)
    _tree_allclose(new_stats, mut_ref["batch_stats"], atol=2e-4)


def test_dual_train_forward_prior(rng):
    """DiffUNet (no time conditioning, no preprocess): the dis-model
    train forward routes through the same fused path."""
    net = DiffUNet()
    x = jnp.asarray(rng.standard_normal((2, 9, 161, 2)).astype(np.float32))
    variables = jax.jit(functools.partial(net.init, train=False))(
        jax.random.PRNGKey(1), x)
    stats = _randomize_bn(jax.tree.map(np.asarray,
                                       variables["batch_stats"]), rng)
    v = {"params": variables["params"], "batch_stats": stats}
    y_ref, mut_ref = net.apply(v, x, True, mutable=["batch_stats"])
    y, new_stats = dual_train_forward(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-4)
    _tree_allclose(new_stats, mut_ref["batch_stats"], atol=2e-4)


def test_train_step_fused_on_8_device_mesh(tmp_path, monkeypatch):
    """The fused train step's new op classes (block-diagonal scatter
    repack inside the loss, concat-channel train-mode BN, stat
    split-back) must compile and run under GSPMD on the dp mesh —
    the multi-chip deployment path."""
    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.parallel import make_mesh
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    monkeypatch.setenv("PDT_FUSED_TRAIN", "dual")
    corpus = synthetic.write_corpus(
        str(tmp_path / "c"), n_train=8, n_test=2, min_len=6000,
        max_len=8000, seed=17,
    )
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=8, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=DiffusionConfig(),
    )
    run = RunConfig(assets=str(tmp_path / "m"), doc="ft", data_root=corpus,
                    joint=True, sigma=True)
    tr = ComplexDDPMTrainer(run, exp, mesh=make_mesh(dp=8))
    assert tr.fused_train
    batch = next(iter(tr.tr_loader))
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    assert len(noisy.sharding.device_set) == 8
    tr.state, total, l_dis, l_ddpm, _ = tr._train_step(
        tr.state, noisy, clean, frames, jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(l_dis) > 0.0 and float(l_ddpm) > 0.0


def test_train_step_fused_matches_flax(tmp_path, rng, monkeypatch):
    """One joint train step with PDT_FUSED_TRAIN=dual reproduces the
    default flax step: same losses, same updated parameters (within fp
    reassociation), same batch-stat updates."""
    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    corpus = synthetic.write_corpus(
        str(tmp_path / "c"), n_train=2, n_test=1, min_len=6000,
        max_len=8000, seed=13,
    )
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=2, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=DiffusionConfig(),
    )

    def one_step(fused, assets):
        if fused:
            monkeypatch.setenv("PDT_FUSED_TRAIN", "dual")
        else:
            monkeypatch.delenv("PDT_FUSED_TRAIN", raising=False)
        run = RunConfig(assets=str(tmp_path / assets), doc="ft",
                        data_root=corpus, joint=True, sigma=True)
        tr = ComplexDDPMTrainer(run, exp)
        assert tr.fused_train is fused
        batch = next(iter(tr.tr_loader))
        noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                            batch.frame_nums)
        state, total, l_dis, l_ddpm, _ = tr._train_step(
            tr.state, noisy, clean, frames, jax.random.PRNGKey(3))
        return state, float(total), float(l_dis), float(l_ddpm)

    s_ref, t_ref, d_ref, p_ref = one_step(False, "a_flax")
    s, t, d, p = one_step(True, "a_dual")
    assert np.isclose(t, t_ref, atol=1e-5)
    assert np.isclose(d, d_ref, atol=1e-5)
    assert np.isclose(p, p_ref, atol=1e-5)
    lr = 5e-4
    for side in ("dis", "ddpm"):
        la = jax.tree_util.tree_leaves_with_path(s[side]["params"])
        lb = {jax.tree_util.keystr(q): x for q, x in
              jax.tree_util.tree_leaves_with_path(s_ref[side]["params"])}
        for q, a in la:
            key = jax.tree_util.keystr(q)
            b = lb[key]
            if key.endswith("['conv2']['bias']") and "['de1']" not in key:
                # analytically-zero gradient (BN-preceding bias, see
                # test_dual_train_forward_grads): Adam normalizes the fp
                # noise to a full ±lr step in an arbitrary direction, so
                # the two paths only agree to the update size.
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=3 * lr, err_msg=key)
            else:
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=5e-5, err_msg=key)
        _tree_allclose(s[side]["batch_stats"], s_ref[side]["batch_stats"],
                       atol=5e-5)


def test_fused_train_default_follows_dtype(tmp_path, monkeypatch):
    """Measured-default resolution (docs/PERF_fusedtrain_r4.json): bf16
    training defaults to the dual block-diagonal decoder (1.37x full
    step on-chip), f32 keeps the exact flax path, and PDT_FUSED_TRAIN
    overrides in either direction — mirroring the bf16 serving
    adoption."""
    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    corpus = synthetic.write_corpus(
        str(tmp_path / "c"), n_train=1, n_test=1, min_len=5000,
        max_len=6000, seed=5,
    )

    def build(dtype, env, assets):
        if env is None:
            monkeypatch.delenv("PDT_FUSED_TRAIN", raising=False)
        else:
            monkeypatch.setenv("PDT_FUSED_TRAIN", env)
        exp = ExperimentConfig(
            train=TrainConfig(batch_size=1, n_epochs=1,
                              loss="com_mse_loss", chunk_length=4800,
                              compute_dtype=dtype),
            model=ModelConfig("DiffUNet"),
            optim=OptimConfig(lr=5e-4),
            optim_ddpm=OptimConfig(lr=2e-4),
            diffusion=DiffusionConfig(),
        )
        run = RunConfig(assets=str(tmp_path / assets), doc="ft",
                        data_root=corpus, joint=True, sigma=True)
        return ComplexDDPMTrainer(run, exp)

    assert build("bfloat16", None, "d1").fused_train is True
    assert build("float32", None, "d2").fused_train is False
    assert build("bfloat16", "flax", "d3").fused_train is False
    assert build("float32", "dual", "d4").fused_train is True
    # train has exactly two paths — a typo ('Dual', '1', 'on') must be
    # loud, not a silent flax fallback (ADVICE r4)
    with pytest.raises(ValueError, match="PDT_FUSED_TRAIN"):
        build("bfloat16", "Dual", "d5")
