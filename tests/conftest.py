"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (the TPU-world analog
of a fake backend — exercises pjit/sharding without a TPU pod).
"""

import os

# force-set (not setdefault): the environment exports JAX_PLATFORMS=axon
# globally; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "8"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compile cache: repeated test runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import pytest

# The environment's sitecustomize registers the axon TPU plugin and
# force-updates jax_platforms to "axon,cpu" at interpreter start; the
# env var alone cannot win.  Override via jax.config before any backend
# is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
