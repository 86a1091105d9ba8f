"""Device mesh + sharding utilities.

The reference is single-process/single-GPU (raw ``.cuda()`` placement,
``trainer/complex_ddpm_trainer.py:69-75``); the TPU-native scaling story
is GSPMD: a ``jax.sharding.Mesh`` with a data-parallel axis (``dp``),
``NamedSharding`` annotations on the jit boundary, and XLA-inserted
collectives over ICI.

Tensor/pipeline parallelism is deliberately NOT provided: the largest
layer in the model zoo is a 1024-wide GLSTM and the largest model is
under 10 M parameters (SURVEY 2.8), so intra-layer sharding would only
add collective latency.  Scaling is pure data parallel; see
PARITY.md "Parallelism".

Under GSPMD a sharded-batch jit computes *global* batch statistics for
BatchNorm and global loss means automatically — the multi-chip
generalization of the reference's single-device semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count() -> int:
    return jax.device_count()


def make_mesh(dp: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the available devices.

    ``dp=None`` uses all devices.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices)
    return Mesh(devices[:dp], ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over dp."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
