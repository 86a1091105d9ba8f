"""Worker for the real 2-process ``jax.distributed`` test.

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent),
joins the cluster via ``parallel.distributed.initialize``, builds the
production ``ComplexDDPMTrainer`` on the global 8-device dp mesh, feeds
its *disjoint half* of a deterministic global batch through
``put_batch`` (the ``make_array_from_process_local_data`` path), runs
ONE joint train step, and dumps the loss scalars + parameter checksums
for the parent to compare against the single-process result.

Usage: python multihost_worker.py <pid> <nprocs> <port> <workdir>
"""

import json
import os
import sys

pid, nprocs, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
# drop any inherited device-count force (the parent's conftest sets 8)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=4"])

import jax

jax.config.update("jax_platforms", "cpu")

from prior_diffuse_tpu.parallel import distributed, make_mesh

assert distributed.initialize(f"localhost:{port}", nprocs, pid)
assert jax.process_count() == nprocs
assert jax.device_count() == 4 * nprocs

import numpy as np

from prior_diffuse_tpu.config import (
    DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
    RunConfig, TrainConfig,
)
from prior_diffuse_tpu.training import ComplexDDPMTrainer

GLOBAL_BATCH = 8

exp = ExperimentConfig(
    train=TrainConfig(batch_size=GLOBAL_BATCH, n_epochs=1,
                      loss="com_mse_loss", chunk_length=4800),
    model=ModelConfig("DiffUNet"),
    optim=OptimConfig(lr=5e-4),
    optim_ddpm=OptimConfig(lr=2e-4),
    diffusion=DiffusionConfig(),
)
run = RunConfig(assets=f"{workdir}/assets_p{pid}", doc="mh",
                data_root=f"{workdir}/corpus", joint=True, sigma=True)
tr = ComplexDDPMTrainer(run, exp, mesh=make_mesh())

# deterministic global batch, identical on every process; this host
# feeds put_batch only its contiguous shard (disjoint per-host data)
rng = np.random.default_rng(7)
noisy_g = rng.standard_normal((GLOBAL_BATCH, 4800)).astype(np.float32) * 0.1
clean_g = rng.standard_normal((GLOBAL_BATCH, 4800)).astype(np.float32) * 0.1
frames_g = np.full((GLOBAL_BATCH,), 4800 // 160 + 1, np.int32)
lo, hi = pid * GLOBAL_BATCH // nprocs, (pid + 1) * GLOBAL_BATCH // nprocs

noisy, clean, frames = tr.put_batch(
    noisy_g[lo:hi], clean_g[lo:hi], frames_g[lo:hi])
assert noisy.shape[0] == GLOBAL_BATCH  # global array assembled

state, total, l_dis, l_ddpm, gn = tr._train_step(
    tr.state, noisy, clean, frames, jax.random.PRNGKey(3))

leaf_sums = {}
for side in ("dis", "ddpm"):
    leaves = jax.tree_util.tree_leaves_with_path(state[side]["params"])
    acc = 0.0
    for path, leaf in leaves:
        acc += float(jax.numpy.sum(jax.numpy.abs(leaf)))
    leaf_sums[side] = acc

with open(f"{workdir}/result_p{pid}.json", "w") as f:
    json.dump({"total": float(total), "l_dis": float(l_dis),
               "l_ddpm": float(l_ddpm), "param_abs_sum": leaf_sums}, f)
print("worker", pid, "ok")
