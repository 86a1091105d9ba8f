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
    tr.state, total, l_dis, l_ddpm, _ = tr._train_step(
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


def test_cond_noisy_extension(tmp_path, corpus):
    """cond_noisy (framework extension): the residual DDPM conditions on
    concat([x_init, feat/c]) — the preprocess conv widens to 6 input
    channels, train + eval + enhance run end to end."""
    diff = DiffusionConfig(cond_noisy=True)
    tr, total, l_dis, l_ddpm = _one_step(tmp_path, corpus, _exp(diff),
                                         joint=True)
    assert tr.cond_noisy
    kernel = tr.state["ddpm"]["params"]["preprocess"]["kernel"]
    assert kernel.shape == (1, 1, 6, 2)  # x_t(2) + x_init(2) + feat(2)
    assert np.isfinite(total) and l_ddpm > 0.0
    cv = tr.evaluate()
    assert np.isfinite(cv)


def test_train_t_fast_extension(tmp_path, corpus):
    """train_t_fast (framework extension): one joint step runs with t
    drawn from the fast schedule's aligned pairs."""
    diff = DiffusionConfig(train_t_fast=True)
    tr, total, l_dis, l_ddpm = _one_step(tmp_path, corpus, _exp(diff),
                                         joint=True)
    assert tr.t_grid is not None and tr.t_grid.shape == (6,)
    assert np.isfinite(total) and l_ddpm > 0.0


def test_cond_noisy_requires_pirorgrad(tmp_path, corpus):
    diff = DiffusionConfig(pirorgrad=False, deltamu=True, cond_noisy=True)
    with pytest.raises(ValueError, match="pirorgrad"):
        _one_step(tmp_path, corpus, _exp(diff))


def test_predict_x0_extension(tmp_path, corpus):
    """predict='x0' (framework extension): the DDPM regresses the
    residual directly; train + sigma-weighted loss + sampling eval run
    end to end and the sampler applies the per-step conversion."""
    diff = DiffusionConfig(predict="x0")
    tr, total, l_dis, l_ddpm = _one_step(tmp_path, corpus, _exp(diff),
                                         joint=True, sigma=True)
    assert tr.predict == "x0"
    assert np.isfinite(total) and l_ddpm > 0.0
    cv = tr.evaluate()
    assert np.isfinite(cv)


def test_predict_x0_rejects_deltamu(tmp_path, corpus):
    diff = DiffusionConfig(pirorgrad=False, deltamu=True, predict="x0")
    with pytest.raises(ValueError, match="deltamu"):
        _one_step(tmp_path, corpus, _exp(diff))


def test_non_joint_freezes_dis(tmp_path, corpus):
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    run = RunConfig(assets=str(tmp_path / "nj"), doc="m", data_root=corpus)
    tr = ComplexDDPMTrainer(run, _exp())
    before = [np.asarray(x) for x in jax.tree.leaves(tr.state["dis"]["params"])]
    batch = next(iter(tr.tr_loader))
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    tr.state, total, l_dis, l_ddpm, _ = tr._train_step(
        tr.state, noisy, clean, frames, jax.random.PRNGKey(0)
    )
    after = jax.tree.leaves(tr.state["dis"]["params"])
    assert l_dis == 0.0
    assert all(np.array_equal(b, np.asarray(a)) for b, a in zip(before, after))
    # DDPM params did move
    # (compare one leaf before/after requires a second step; just check loss)
    assert np.isfinite(float(l_ddpm)) and float(l_ddpm) > 0.0


def test_evaluate_on_8_device_mesh_ragged_batch(tmp_path, corpus):
    """Full evaluate() (scan sampler + compare_complex scoring) on the
    8-device mesh with a ragged batch: 2 eval utterances pad to 8 rows
    in put_batch; pad rows must not contaminate loss or metrics."""
    from prior_diffuse_tpu.parallel import make_mesh
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    mesh = make_mesh(dp=8)
    run = RunConfig(assets=str(tmp_path / "ev"), doc="m", data_root=corpus,
                    joint=True)
    tr = ComplexDDPMTrainer(run, _exp(), mesh=mesh)
    # the cv loader yields one batch of 2 -> put_batch pads to 8
    batch = next(iter(tr.cv_loader))
    assert batch.noisy.shape[0] == 2
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    assert noisy.shape[0] == 8 and len(noisy.sharding.device_set) == 8
    cv = tr.evaluate()
    assert np.isfinite(cv)
    # pad-row isolation: garbage in the 6 pad rows (frame_num 0) must
    # change neither the masked loss nor the real rows' sampled audio
    rng = jax.random.PRNGKey(99)
    audio_z, label_z, loss_z, _ = tr._eval_step(tr.state, noisy, clean,
                                                frames, rng)
    garbage = np.asarray(noisy).copy()
    garbage[2:] = 3.7
    noisy_g, = tr.put_batch(garbage)
    audio_g, _, loss_g, _ = tr._eval_step(tr.state, noisy_g, clean, frames,
                                          rng)
    assert float(loss_z) == pytest.approx(float(loss_g), rel=1e-6)
    np.testing.assert_allclose(np.asarray(audio_z)[:2], np.asarray(audio_g)[:2],
                               atol=1e-5)
    # metric scoring covers exactly the 2 real utterances
    from prior_diffuse_tpu.metrics.compare import spec_batch_to_wavs

    wavs = spec_batch_to_wavs(audio_z, batch.frame_nums, tr.cfg.feat_type)
    assert len(wavs) == 2


def test_enhance_batch_on_8_device_mesh(tmp_path, corpus):
    """Production serving path (enhance_batch: STFT -> prior -> scan
    sampler -> ISTFT in one jit) on the dp mesh: the padded wav batch
    shards over 8 devices, output is deterministic for a fixed rng and
    row-independent (each utterance's result must not depend on what
    shares the batch — the dp guarantee serving relies on)."""
    from prior_diffuse_tpu.parallel import make_mesh
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    mesh = make_mesh(dp=8)
    run = RunConfig(assets=str(tmp_path / "eh"), doc="m", data_root=corpus,
                    joint=True)
    tr = ComplexDDPMTrainer(run, _exp(), mesh=mesh)
    g = np.random.default_rng(11)
    wav = (g.standard_normal((8, 8000)) * 0.2).astype(np.float32)
    sharded = tr.put_batch(wav)[0]
    assert len(sharded.sharding.device_set) == 8
    rng = jax.random.PRNGKey(5)
    out = np.asarray(tr.enhance_batch(wav, rng))
    assert out.shape == wav.shape and np.isfinite(out).all()
    out2 = np.asarray(tr.enhance_batch(wav, rng))
    np.testing.assert_array_equal(out, out2)
    # row independence: perturbing row 7 must not change row 0
    wav_b = wav.copy()
    wav_b[7] = g.standard_normal(8000).astype(np.float32) * 0.2
    out_b = np.asarray(tr.enhance_batch(wav_b, rng))
    np.testing.assert_allclose(out_b[0], out[0], atol=1e-5)


def test_checkpoint_roundtrip_sharded_state(tmp_path, corpus):
    """Save -> restore of mesh-sharded training state resumes
    bit-identically: the restored trainer's next step equals the
    original's next step exactly."""
    from prior_diffuse_tpu.parallel import make_mesh
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    mesh = make_mesh(dp=8)
    run = RunConfig(assets=str(tmp_path / "ck"), doc="m", data_root=corpus,
                    joint=True)
    tr = ComplexDDPMTrainer(run, _exp(), mesh=mesh)
    batch = next(iter(tr.tr_loader))
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    tr.state, *_ = tr._train_step(tr.state, noisy, clean, frames,
                                  jax.random.PRNGKey(0))
    tr.step = 1
    tr.ckpt.save_best(tr.ckpt_payload())

    run2 = RunConfig(assets=str(tmp_path / "ck"), doc="m", data_root=corpus,
                     joint=True)
    tr2 = ComplexDDPMTrainer(run2, _exp(), mesh=mesh)
    assert tr2.load_best()
    assert tr2.step == 1
    a = jax.tree.leaves(tr.state)
    b = jax.tree.leaves(tr2.state)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))
    # one more identical step from each stays bit-identical
    _, t1, *_ = tr._train_step(tr.state, noisy, clean, frames,
                               jax.random.PRNGKey(1))
    _, t2, *_ = tr2._train_step(tr2.state, noisy, clean, frames,
                                jax.random.PRNGKey(1))
    assert float(t1) == float(t2)


def test_dataset_shard_disjoint_cover(corpus):
    """PairedWavDataset(shard=) gives each host a disjoint slice whose
    union is the full corpus (multi-host data parallelism)."""
    from prior_diffuse_tpu.data import PairedWavDataset

    full = PairedWavDataset(f"{corpus}/noisy_trainset_wav",
                            f"{corpus}/clean_trainset_wav")
    shards = [
        PairedWavDataset(f"{corpus}/noisy_trainset_wav",
                         f"{corpus}/clean_trainset_wav", shard=(i, 2))
        for i in range(2)
    ]
    names = [set(s.names) for s in shards]
    assert names[0] & names[1] == set()
    assert names[0] | names[1] == set(full.names)
    assert abs(len(names[0]) - len(names[1])) <= 1


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
    tr.state, total, l_dis, l_ddpm, _ = tr._train_step(
        tr.state, noisy, clean, frames, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(total))
    # replicated state stays replicated after the update
    leaf = jax.tree.leaves(tr.state["ddpm"]["params"])[0]
    assert len(leaf.sharding.device_set) == 8


def test_x0_leak_drop_extension(tmp_path, corpus):
    """x0_leak_drop (framework extension): trains end to end under the
    sigma-weighted loss and the leak knob requires the x0 target."""
    diff = DiffusionConfig(predict="x0", x0_leak_drop=0.5)
    tr, total, l_dis, l_ddpm = _one_step(tmp_path, corpus, _exp(diff),
                                         joint=True, sigma=True)
    assert tr.x0_leak_drop == 0.5
    assert np.isfinite(total) and l_ddpm > 0.0


def test_x0_leak_drop_rejects_eps(tmp_path, corpus):
    diff = DiffusionConfig(predict="eps", x0_leak_drop=0.5)
    with pytest.raises(ValueError, match="x0_leak_drop"):
        _one_step(tmp_path, corpus, _exp(diff))
