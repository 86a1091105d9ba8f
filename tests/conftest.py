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

# ---- test tiers (VERDICT r5 item 6) ------------------------------------
# The full suite costs >1 h on this 1-core box; the default inner-loop
# tier is `-m "not slow"` (<5 min).  Whole files whose tests are
# intrinsically heavy — torch-oracle transplants, end-to-end trainer
# flows, 8-device mesh integration — are auto-marked here; individual
# tests can also self-mark with @pytest.mark.slow.
SLOW_FILES = {
    "test_transplant.py",
    "test_transplant_dbaiat.py",
    "test_transplant_diffwave.py",
    "test_transplant_gcrn.py",
    "test_transplant_grn.py",
    "test_e2e_parity.py",
    "test_fused_train.py",
    "test_fused_forward.py",
    "test_modes_and_sharding.py",
    "test_trainers.py",
    "test_dbaiat_trainer.py",
    "test_graft_entry.py",
    "test_serving.py",
    "test_mixed_precision.py",
    "test_multihost.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_FILES:
            item.add_marker(pytest.mark.slow)

# The environment's sitecustomize registers the axon TPU plugin and
# force-updates jax_platforms to "axon,cpu" at interpreter start; the
# env var alone cannot win.  Override via jax.config before any backend
# is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
