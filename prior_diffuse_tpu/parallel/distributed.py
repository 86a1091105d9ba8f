"""Multi-host (pod-scale) runtime support.

The reference is strictly single-process (SURVEY 2.8).  At pod scale
the TPU-native recipe is: one Python process per host,
``jax.distributed.initialize`` to join the cluster, a global mesh over
all devices, per-host input sharding, and GSPMD collectives over ICI —
nothing else in the framework changes because the train step is already
expressed over a ``Mesh``.

Usage (same script on every host):

    from prior_diffuse_tpu.parallel import distributed
    distributed.initialize()          # env-driven, no-op single-host
    mesh = make_mesh()                # now spans all hosts' devices
    ds = PairedWavDataset(..., shard=distributed.data_shard())
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host JAX cluster; returns True if distributed.

    With no arguments, uses the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``
    or a TPU-pod auto-detecting environment); silently a no-op for
    single-host runs.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in ("", "localhost"):
            return False  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logging.info(
            "joined cluster: process %d/%d, %d local of %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return True
    except Exception as e:  # already initialized / single-host fallback
        logging.debug("distributed init skipped: %s", e)
        return False


def data_shard() -> Tuple[int, int]:
    """(process_index, process_count) for per-host dataset sharding."""
    import jax

    return jax.process_index(), jax.process_count()
