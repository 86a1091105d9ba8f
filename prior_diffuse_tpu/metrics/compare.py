"""Batch / directory metric comparison.

Equivalents of the reference's ``compare_complex`` (spectrogram batches
-> 6 metrics, ``utils/metrics.py:528-577``) and ``compare`` (two wav
directories, ``utils/metrics.py:580-604``), on our channels-last layout.
The ISTFT runs on device (batched); metric scoring is host-side numpy.
"""

from __future__ import annotations

import glob
import os
from typing import List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from prior_diffuse_tpu.data.wavio import read_wav
from prior_diffuse_tpu.metrics.composite import compare_one
from prior_diffuse_tpu.signal.compress import decompress_spec
from prior_diffuse_tpu.signal.stft import istft


def spec_batch_to_wavs(
    spec: jnp.ndarray,
    frame_nums: Sequence[int],
    feat_type: str = "sqrt",
) -> List[np.ndarray]:
    """De-compress + batched ISTFT + per-utterance trim to
    ``(frames-1)*160`` samples (the reference's trim,
    utils/metrics.py:562-563)."""
    wavs = np.asarray(istft(decompress_spec(spec, feat_type)))
    out = []
    for i, fn in enumerate(frame_nums):
        out.append(wavs[i, : (int(fn) - 1) * 160])
    return out


def compare_complex(
    esti: jnp.ndarray,
    label: jnp.ndarray,
    frame_nums: Sequence[int],
    feat_type: str = "sqrt",
) -> Tuple[float, float, float, float, float, float]:
    """-> mean (csig, cbak, covl, pesq, ssnr, stoi) over the batch."""
    esti_wavs = spec_batch_to_wavs(esti, frame_nums, feat_type)
    label_wavs = spec_batch_to_wavs(label, frame_nums, feat_type)
    results = [
        compare_one(c, p, 16000) for c, p in zip(label_wavs, esti_wavs)
    ]
    return tuple(np.mean(np.asarray(results), axis=0))


def compare(refdir: str, degdir: str, use_tqdm: bool = True):
    """Score two wav directories pairwise; returns the per-file list of
    (csig, cbak, covl, pesq, ssnr, stoi)."""
    if os.path.isfile(refdir) and os.path.isfile(degdir):
        c, _ = read_wav(refdir, 16000)
        p, _ = read_wav(degdir, 16000)
        return [compare_one(c, p, 16000)]

    reffiles = sorted(glob.glob(os.path.join(refdir, "*.wav")))
    degfiles = sorted(glob.glob(os.path.join(degdir, "*.wav")))
    assert len(reffiles) == len(degfiles), "directory sizes differ"

    pairs = list(zip(reffiles, degfiles))
    # process pool sized like the reference's (min(max(cpu-2,1),20),
    # utils/metrics.py:589); sequential when only one core is useful
    workers = int(os.environ.get(
        "PDT_METRIC_WORKERS",
        min(max((os.cpu_count() or 1) - 2, 1), 20),
    ))
    if workers > 1:
        from multiprocessing import Pool

        with Pool(processes=workers) as pool:
            it = pool.imap(_compare_pair, pairs)
            if use_tqdm:
                try:
                    from tqdm import tqdm

                    it = tqdm(it, total=len(pairs), desc="Calculating", ncols=60)
                except ImportError:
                    pass
            return list(it)

    if use_tqdm:
        try:
            from tqdm import tqdm

            pairs = tqdm(pairs, desc="Calculating", ncols=60)
        except ImportError:
            pass
    return [_compare_pair(pair) for pair in pairs]


def _compare_pair(pair):
    rf, df = pair
    c, _ = read_wav(rf, 16000)
    p, _ = read_wav(df, 16000)
    n = min(len(c), len(p))
    return compare_one(c[:n], p[:n], 16000)


def main():  # CLI: python -m prior_diffuse_tpu.metrics.compare ref deg
    import sys
    import time

    t0 = time.time()
    res = compare(sys.argv[1], sys.argv[2])
    pm = np.mean(np.asarray(res), axis=0)
    print("time: %.3f" % (time.time() - t0))
    print("ref=", sys.argv[1])
    print("deg=", sys.argv[2])
    print("csig:%6.4f cbak:%6.4f covl:%6.4f pesq:%6.4f ssnr:%6.4f stoi:%6.4f" % tuple(pm))


if __name__ == "__main__":
    main()
