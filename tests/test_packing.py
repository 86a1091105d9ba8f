"""Packed pytree transfer round-trips (utils/packing.py): the two
transfer directions must be bit-exact for mixed-dtype trees including
scalars, empty-dict nodes and bfloat16 leaves — the train state uses
all of these."""

import jax
import jax.numpy as jnp
import numpy as np

from prior_diffuse_tpu.parallel import make_mesh, replicated
from prior_diffuse_tpu.utils.packing import (
    device_get_tree,
    device_put_tree,
    pack_host,
    unpack_host,
)


def _tree(rng):
    return {
        "a": {"w": rng.standard_normal((3, 5)).astype(np.float32),
              "b": rng.standard_normal((7,)).astype(np.float32),
              "stats": {}},
        "count": np.array(3, np.int32),
        "bf": rng.standard_normal((4, 2)).astype(jnp.bfloat16),
        "scalar": np.array(0.25, np.float32),
        "key": np.array([1, 2], np.uint32),
    }


def test_host_pack_roundtrip(rng):
    tree = _tree(rng)
    packed, treedef, specs = pack_host(tree)
    # one buffer per dtype, not per leaf
    assert len(packed) == 4
    back = unpack_host(packed, treedef, specs)
    flat_a, _ = jax.tree.flatten(tree)
    flat_b, _ = jax.tree.flatten(back)
    for x, y in zip(flat_a, flat_b):
        assert x.dtype == y.dtype and x.shape == y.shape
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_device_roundtrip_bit_exact(rng):
    tree = _tree(rng)
    shard = replicated(make_mesh(dp=1))
    dev = device_put_tree(tree, shard)
    flat_t, td_t = jax.tree.flatten(tree)
    flat_d, td_d = jax.tree.flatten(dev)
    assert td_t == td_d
    for x, y in zip(flat_t, flat_d):
        assert np.dtype(x.dtype) == np.dtype(y.dtype)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    back = device_get_tree(dev)
    for x, y in zip(flat_t, jax.tree.leaves(back)):
        assert isinstance(y, np.ndarray)
        np.testing.assert_array_equal(np.asarray(x), y)


def test_device_roundtrip_replicated_8dev(rng):
    tree = _tree(rng)
    shard = replicated(make_mesh(dp=8))
    dev = device_put_tree(tree, shard)
    leaf = jax.tree.leaves(dev)[0]
    assert len(leaf.sharding.device_set) == 8
    back = device_get_tree(dev)
    for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(x), y)
