"""Driver-artifact contract: entry() compiles, dryrun_multichip runs a
real sharded joint step on the 8-device virtual mesh."""

import jax
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 48000)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
