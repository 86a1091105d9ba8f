"""Data pipeline tests: wav round-trip, pairing, cropping, collate."""

import numpy as np
import pytest

from prior_diffuse_tpu.data import (
    EvalLoader,
    PairedWavDataset,
    TrainLoader,
    read_wav,
    synthetic,
    write_wav,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("vb")
    return synthetic.write_corpus(str(root), n_train=6, n_test=3, seed=7)


def test_wav_roundtrip(tmp_path, rng):
    x = np.clip(rng.standard_normal(12345) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p, 16000)
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_wav_resample(tmp_path, rng):
    x = np.sin(2 * np.pi * 440 * np.arange(48000) / 48000).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 48000)
    y, sr = read_wav(p, 16000)
    assert sr == 16000
    assert abs(len(y) - 16000) <= 1


def test_dataset_pairing_and_crop(corpus):
    ds = PairedWavDataset(
        f"{corpus}/noisy_trainset_wav", f"{corpus}/clean_trainset_wav",
        chunk_length=48000,
    )
    assert len(ds) == 6
    rng = np.random.default_rng(0)
    noisy, clean, fn, wl = ds.load_pair(0, crop=True, rng=rng)
    assert len(noisy) == len(clean) == wl <= 48000
    assert fn == wl // 160 + 1


def test_train_loader_static_shapes(corpus):
    ds = PairedWavDataset(
        f"{corpus}/noisy_trainset_wav", f"{corpus}/clean_trainset_wav",
        chunk_length=32000,
    )
    loader = TrainLoader(ds, batch_size=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b.noisy.shape == (2, 32000) and b.clean.shape == (2, 32000)
        # RMS normalization: unit RMS over the valid samples
        for i in range(2):
            v = b.noisy[i, : b.wav_lens[i]]
            assert np.sqrt(np.mean(v**2)) == pytest.approx(1.0, rel=1e-3)


def test_eval_loader_buckets(corpus):
    ds = PairedWavDataset(
        f"{corpus}/noisy_testset_wav", f"{corpus}/clean_testset_wav"
    )
    loader = EvalLoader(ds, batch_size=2, bucket_samples=16000)
    batches = list(loader)
    assert sum(b.noisy.shape[0] for b in batches) == 3
    for b in batches:
        assert b.noisy.shape[1] % 16000 == 0
        assert b.noisy.shape[1] >= b.wav_lens.max()
