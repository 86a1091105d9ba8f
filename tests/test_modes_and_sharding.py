"""Diffusion-mode variants (deltamu / conditional / non-joint) and
multi-device sharding of the real train step."""

import numpy as np
import pytest
import jax

from prior_diffuse_tpu.config import (
    DiffusionConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
    TrainConfig,
)
from prior_diffuse_tpu.data import synthetic


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("modes")
    return synthetic.write_corpus(
        str(root), n_train=4, n_test=2, min_len=6000, max_len=9000, seed=21
    )


def _exp(diffusion=None):
    return ExperimentConfig(
        train=TrainConfig(batch_size=2, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=diffusion or DiffusionConfig(),
    )


def _one_step(tmp_path, corpus, exp, **flags):
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    run = RunConfig(assets=str(tmp_path / "a"), doc="m", data_root=corpus,
                    **flags)
    tr = ComplexDDPMTrainer(run, exp)
    batch = next(iter(tr.tr_loader))
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    tr.state, total, l_dis, l_ddpm = tr._train_step(
        tr.state, noisy, clean, frames, jax.random.PRNGKey(0)
    )
    return tr, float(total), float(l_dis), float(l_ddpm)


def test_deltamu_mode_uses_nocon(tmp_path, corpus):
    diff = DiffusionConfig(pirorgrad=False, deltamu=True)
    tr, total, l_dis, l_ddpm = _one_step(tmp_path, corpus, _exp(diff))
    assert type(tr.ddpm_model).__name__ == "Nocon"
    assert np.isfinite(total) and l_dis == 0.0


def test_conditional_mode(tmp_path, corpus):
    diff = DiffusionConfig(pirorgrad=False, deltamu=False)
    tr, total, l_dis, l_ddpm = _one_step(tmp_path, corpus, _exp(diff),
                                         joint=True)
    assert tr.mode == "conditional"
    assert np.isfinite(total) and l_dis > 0.0


def test_non_joint_freezes_dis(tmp_path, corpus):
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    run = RunConfig(assets=str(tmp_path / "nj"), doc="m", data_root=corpus)
    tr = ComplexDDPMTrainer(run, _exp())
    before = [np.asarray(x) for x in jax.tree.leaves(tr.state["dis"]["params"])]
    batch = next(iter(tr.tr_loader))
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    tr.state, total, l_dis, l_ddpm = tr._train_step(
        tr.state, noisy, clean, frames, jax.random.PRNGKey(0)
    )
    after = jax.tree.leaves(tr.state["dis"]["params"])
    assert l_dis == 0.0
    assert all(np.array_equal(b, np.asarray(a)) for b, a in zip(before, after))
    # DDPM params did move
    # (compare one leaf before/after requires a second step; just check loss)
    assert np.isfinite(float(l_ddpm)) and float(l_ddpm) > 0.0


def test_train_step_shards_over_8_devices(tmp_path, corpus):
    from prior_diffuse_tpu.parallel import make_mesh
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    assert jax.device_count() >= 8
    mesh = make_mesh(dp=8)
    exp = _exp()
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=4, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("DiffUNet"),
        optim_ddpm=OptimConfig(lr=2e-4),
    )
    run = RunConfig(assets=str(tmp_path / "sh"), doc="m", data_root=corpus,
                    joint=True, sigma=True)
    tr = ComplexDDPMTrainer(run, exp, mesh=mesh)
    batch = next(iter(tr.tr_loader))  # batch 4 -> padded to 8
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    assert noisy.shape[0] == 8
    assert len(noisy.sharding.device_set) == 8
    tr.state, total, l_dis, l_ddpm = tr._train_step(
        tr.state, noisy, clean, frames, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(total))
    # replicated state stays replicated after the update
    leaf = jax.tree.leaves(tr.state["ddpm"]["params"])[0]
    assert len(leaf.sharding.device_set) == 8
