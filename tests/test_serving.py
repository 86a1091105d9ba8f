"""Serving-path unit tests: streaming crossfade math and viz smoke."""

import numpy as np
import jax


class _IdentityTrainer:
    """Fake trainer: enhance == identity. With perfect enhancement the
    crossfaded overlap-add must reconstruct the input exactly (the
    raised-cosine ramps are complementary)."""

    class cfg:
        batch_size = 4
        sample_rate = 16000

    def enhance_batch(self, batch, rng):
        return batch


def test_streaming_identity_reconstruction(rng):
    from prior_diffuse_tpu.serving.streaming import enhance_long

    wav = rng.standard_normal(130_000).astype(np.float32) * 0.2
    out = enhance_long(_IdentityTrainer(), wav, jax.random.PRNGKey(0),
                       segment=48000, overlap=4800)
    assert out.shape == wav.shape
    np.testing.assert_allclose(out, wav, atol=2e-6)


def test_streaming_short_file_passthrough(rng):
    from prior_diffuse_tpu.serving.streaming import enhance_long

    wav = rng.standard_normal(10_000).astype(np.float32) * 0.2
    out = enhance_long(_IdentityTrainer(), wav, jax.random.PRNGKey(0))
    assert out.shape == wav.shape
    # short path goes through enhance_files (RMS scale round-trips)
    np.testing.assert_allclose(out, wav, atol=1e-5)


def test_viz_smoke(tmp_path, rng):
    from prior_diffuse_tpu import viz

    wav = rng.standard_normal(3200).astype(np.float32) * 0.2
    viz.plot_wav(wav, path=str(tmp_path / "w.png"))
    viz.plot_specgram(wav, path=str(tmp_path / "s.png"))
    spec = rng.standard_normal((5, 161, 2)).astype(np.float32)
    viz.plot_stft(spec, path=str(tmp_path / "f.png"))
    viz.draw_comparison([wav, wav], ["a", "b"], path=str(tmp_path / "c.png"))
    for f in ["w.png", "s.png", "f.png", "c.png"]:
        assert (tmp_path / f).stat().st_size > 0
