"""Feature compression round-trip and parity with the reference math."""

import numpy as np
import pytest
import jax.numpy as jnp

from prior_diffuse_tpu.signal import compress_spec, decompress_spec, mag_phase


@pytest.mark.parametrize("feat_type", ["normal", "sqrt", "cubic", "log_1x"])
def test_compress_roundtrip(rng, feat_type):
    spec = rng.standard_normal((2, 11, 161, 2)).astype(np.float32)
    out = decompress_spec(compress_spec(jnp.asarray(spec), feat_type), feat_type)
    np.testing.assert_allclose(np.asarray(out), spec, atol=2e-4, rtol=2e-4)


def test_sqrt_compress_matches_reference_formula(rng):
    spec = rng.standard_normal((2, 5, 161, 2)).astype(np.float32)
    out = np.asarray(compress_spec(jnp.asarray(spec), "sqrt"))
    mag = np.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2)
    phase = np.arctan2(spec[..., 1], spec[..., 0])
    want = np.stack(
        [np.sqrt(mag) * np.cos(phase), np.sqrt(mag) * np.sin(phase)], axis=-1
    )
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_unknown_feat_type_is_identity(rng):
    spec = jnp.asarray(rng.standard_normal((1, 3, 161, 2)).astype(np.float32))
    out = compress_spec(spec, "none")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))


def test_mag_phase(rng):
    spec = rng.standard_normal((4, 161, 2)).astype(np.float32)
    mag, phase = mag_phase(jnp.asarray(spec))
    np.testing.assert_allclose(
        np.asarray(mag), np.hypot(spec[..., 0], spec[..., 1]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(phase), np.arctan2(spec[..., 1], spec[..., 0]), atol=1e-6
    )
