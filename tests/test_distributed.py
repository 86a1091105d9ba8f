"""Executed coverage for the multi-host runtime helpers
(``parallel/distributed.py``) — no real cluster needed: the shard math
is a pure function of (process_index, process_count) and the initialize
guards are env-driven.

The reference is single-process (SURVEY 2.8); these helpers are the
TPU-native pod-scale extension, so the tests pin the contract the rest
of the framework relies on: every host sees a disjoint, collectively
exhaustive, near-balanced slice of the corpus.
"""

import numpy as np
import pytest

from prior_diffuse_tpu.data import PairedWavDataset, synthetic
from prior_diffuse_tpu.parallel import distributed


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("dist_corpus")
    return synthetic.write_corpus(
        str(root), n_train=11, n_test=2, min_len=6000, max_len=9000, seed=5
    )


def _names(corpus, shard):
    ds = PairedWavDataset(
        f"{corpus}/noisy_trainset_wav", f"{corpus}/clean_trainset_wav",
        shard=shard,
    )
    return ds.names


@pytest.mark.parametrize("count", [1, 2, 8])
def test_data_shards_disjoint_cover(corpus, count):
    full = _names(corpus, None)
    shards = [_names(corpus, (i, count)) for i in range(count)]
    # disjoint
    for i in range(count):
        for j in range(i + 1, count):
            assert not set(shards[i]) & set(shards[j])
    # exhaustive
    assert sorted(n for s in shards for n in s) == sorted(full)
    # balanced within 1
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_shard_count_one_is_identity(corpus):
    assert _names(corpus, (0, 1)) == _names(corpus, None)


def test_data_shard_reflects_process_env(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: 3)
    monkeypatch.setattr(jax, "process_count", lambda: 16)
    assert distributed.data_shard() == (3, 16)


def test_data_shard_single_host_default():
    # this test process is single-host: the canonical (0, 1)
    assert distributed.data_shard() == (0, 1)


def test_initialize_single_host_is_noop(monkeypatch):
    """With no cluster env, initialize() must return False WITHOUT
    calling jax.distributed.initialize (which would hang waiting for a
    coordinator)."""
    import jax

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)

    def boom(**kw):
        raise AssertionError("initialize() must not contact a coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    assert distributed.initialize() is False


def test_initialize_failure_degrades_to_single_host(monkeypatch):
    """A cluster env whose join fails (unsupported backend, already
    initialized) degrades cleanly: returns False, no exception."""
    import jax

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "203.0.113.1:1234")

    def fail(**kw):
        raise RuntimeError("backend does not support multi-controller")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    assert distributed.initialize() is False


def test_initialize_joins_when_env_set(monkeypatch):
    """With a coordinator address set, initialize() must attempt the
    join with the env-derived arguments and report True on success."""
    import jax

    calls = {}

    def ok(coordinator_address=None, num_processes=None, process_id=None):
        calls["addr"] = coordinator_address

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "203.0.113.1:1234")
    monkeypatch.setattr(jax.distributed, "initialize", ok)
    assert distributed.initialize() is True
    assert calls["addr"] == "203.0.113.1:1234"
