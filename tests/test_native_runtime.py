"""Native C++ runtime parity vs the pure-Python data path."""

import os

import numpy as np
import pytest

from prior_diffuse_tpu import runtime
from prior_diffuse_tpu.data import PairedWavDataset, TrainLoader, synthetic
from prior_diffuse_tpu.data.wavio import read_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    return synthetic.write_corpus(
        str(root), n_train=4, n_test=2, min_len=7000, max_len=9000, seed=11
    )


def test_native_available():
    assert runtime.available(), "g++ build of the native runtime failed"


def test_native_decode_matches_python(corpus):
    path = os.path.join(corpus, "noisy_trainset_wav",
                        sorted(os.listdir(f"{corpus}/noisy_trainset_wav"))[0])
    py, sr_py = read_wav(path, sr=None)
    nat = runtime.decode_wav(path)
    assert nat is not None
    nat_wav, sr_nat = nat
    assert sr_nat == sr_py
    np.testing.assert_allclose(nat_wav, py, atol=1e-7)


def test_native_wav_info(corpus):
    path = os.path.join(corpus, "noisy_trainset_wav",
                        sorted(os.listdir(f"{corpus}/noisy_trainset_wav"))[0])
    info = runtime.wav_info(path)
    py, _ = read_wav(path, sr=None)
    assert info == (len(py), 16000)


def test_native_batch_matches_python_collate(corpus):
    """Files shorter than chunk => no crop randomness => native and
    Python batches must agree exactly."""
    ds = PairedWavDataset(
        f"{corpus}/noisy_trainset_wav", f"{corpus}/clean_trainset_wav",
        chunk_length=16000,
    )
    idx = list(range(len(ds)))
    noisy_paths = [os.path.join(ds.noisy_root, ds.names[j]) for j in idx]
    clean_paths = [os.path.join(ds.clean_root, ds.names[j]) for j in idx]
    out = runtime.load_batch(noisy_paths, clean_paths, 16000,
                             [0] * len(idx))
    assert out is not None
    n_noisy, n_clean, n_frames, n_lens, n_scales = out

    from prior_diffuse_tpu.data.dataset import _collate

    items = [ds.load_pair(j, crop=False) for j in idx]
    py = _collate(items, 16000)
    np.testing.assert_array_equal(n_frames, py.frame_nums)
    np.testing.assert_array_equal(n_lens, py.wav_lens)
    np.testing.assert_allclose(n_scales, py.scales, rtol=1e-5)
    np.testing.assert_allclose(n_noisy, py.noisy, atol=1e-4)
    np.testing.assert_allclose(n_clean, py.clean, atol=1e-4)


def test_train_loader_native_path(corpus):
    ds = PairedWavDataset(
        f"{corpus}/noisy_trainset_wav", f"{corpus}/clean_trainset_wav",
        chunk_length=8000,
    )
    batches = list(TrainLoader(ds, batch_size=2, seed=0, native=True))
    assert len(batches) == 2
    for b in batches:
        assert b.noisy.shape == (2, 8000)
        for i in range(2):
            v = b.noisy[i, : b.wav_lens[i]]
            assert np.sqrt(np.mean(v**2)) == pytest.approx(1.0, rel=1e-3)
