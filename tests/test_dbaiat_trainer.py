"""DB-AIAT prior under the ComplexTrainer (the conf/dbaiat.yml setup)."""

import numpy as np
import jax

from prior_diffuse_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
    TrainConfig,
)
from prior_diffuse_tpu.data import synthetic


def test_dbaiat_complex_trainer_step(tmp_path):
    corpus = synthetic.write_corpus(
        str(tmp_path / "c"), n_train=2, n_test=2, min_len=5000, max_len=6000,
        seed=9,
    )
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=2, n_epochs=1, loss="com_mag_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("aia_complex_trans_ri"),
        optim=OptimConfig(lr=5e-4),
    )
    run = RunConfig(assets=str(tmp_path / "a"), doc="d", data_root=corpus)
    from prior_diffuse_tpu.training import ComplexTrainer

    tr = ComplexTrainer(run, exp)
    batch = next(iter(tr.tr_loader))
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    tr.state, loss, _ = tr._train_step(tr.state, noisy, clean, frames)
    assert np.isfinite(float(loss))
