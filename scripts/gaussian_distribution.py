"""Kolmogorov-Smirnov Gaussianity tests of waveforms and magnitudes
(motivates the PriorGrad prior; port of the reference's
``scripts/gaussian_distribution.py``).

Usage: python scripts/gaussian_distribution.py wav_dir [n]
"""

import glob
import sys

import numpy as np
from scipy import stats


def main(wav_dir: str, n: int = 8):
    import jax.numpy as jnp

    from prior_diffuse_tpu.data.wavio import read_wav
    from prior_diffuse_tpu.signal.stft import stft

    for path in sorted(glob.glob(f"{wav_dir}/*.wav"))[:n]:
        w, _ = read_wav(path)
        z = (w - w.mean()) / (w.std() + 1e-12)
        ks_wav = stats.kstest(z, "norm")
        spec = np.asarray(stft(jnp.asarray(w[None])))[0]
        mag = np.hypot(spec[..., 0], spec[..., 1]).ravel()
        zm = (mag - mag.mean()) / (mag.std() + 1e-12)
        ks_mag = stats.kstest(zm, "norm")
        print(f"{path}: wav KS p={ks_wav.pvalue:.3g}  mag KS p={ks_mag.pvalue:.3g}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8)
