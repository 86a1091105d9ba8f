"""Mixed-precision (bf16 compute, f32 params/losses) training path."""

import numpy as np
import jax
import jax.numpy as jnp

from prior_diffuse_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
    TrainConfig,
)
from prior_diffuse_tpu.data import synthetic
from prior_diffuse_tpu.models import DiffUNet, DiffUNet1


def test_dtype_threading_outputs_bf16(rng):
    x = jnp.asarray(rng.standard_normal((1, 5, 161, 2)).astype(np.float32))
    model = DiffUNet(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    # params stay f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(variables["params"]))
    out = model.apply(variables, x, mutable=False)
    assert out.dtype == jnp.bfloat16

    m1 = DiffUNet1(dtype=jnp.bfloat16)
    v1 = m1.init(jax.random.PRNGKey(0), x, x, jnp.zeros((1,)))
    out1 = m1.apply(v1, x, x, jnp.asarray([3.5]), mutable=False)
    assert out1.dtype == jnp.bfloat16


def test_bf16_close_to_f32(rng):
    x = jnp.asarray(rng.standard_normal((1, 5, 161, 2)).astype(np.float32))
    f32 = DiffUNet()
    variables = f32.init(jax.random.PRNGKey(0), x)
    ref = f32.apply(variables, x, mutable=False)
    bf = DiffUNet(dtype=jnp.bfloat16)
    out = bf.apply(variables, x, mutable=False).astype(jnp.float32)
    # bf16 has ~2-3 significant digits; outputs O(0.1)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05


def test_mixed_precision_training_reduces_loss(tmp_path):
    corpus = synthetic.write_corpus(
        str(tmp_path / "c"), n_train=2, n_test=2, min_len=5000, max_len=6000,
        seed=13,
    )
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=2, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800, compute_dtype="bfloat16",
                          lam=1.0),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=1e-3),
        optim_ddpm=OptimConfig(lr=1e-3),
    )
    run = RunConfig(assets=str(tmp_path / "a"), doc="m", data_root=corpus,
                    joint=True)
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    tr = ComplexDDPMTrainer(run, exp)
    assert tr.dis_model.dtype == jnp.bfloat16
    batch = next(iter(tr.tr_loader))
    noisy, clean, frames = tr.put_batch(batch.noisy, batch.clean,
                                        batch.frame_nums)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(6):
        key, k = jax.random.split(key)
        tr.state, total, l_dis, l_ddpm, _ = tr._train_step(
            tr.state, noisy, clean, frames, k
        )
        losses.append(float(l_dis))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # optimizer state stays f32
    assert all(
        p.dtype == jnp.float32
        for p in jax.tree.leaves(tr.state["dis"]["params"])
    )
