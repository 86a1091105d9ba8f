"""Histogram of wav lengths in a directory (port of the reference's
``scripts/show_wav_len.py``).

Usage: python scripts/show_wav_len.py wav_dir [out.png]
"""

import glob
import sys


def main(wav_dir: str, out: str = "wav_lengths.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from prior_diffuse_tpu.data.wavio import read_wav

    lengths = []
    for path in glob.glob(f"{wav_dir}/*.wav"):
        w, sr = read_wav(path, sr=None)
        lengths.append(len(w) / sr)
    print(f"{len(lengths)} files, mean {np.mean(lengths):.2f}s, "
          f"max {np.max(lengths):.2f}s")
    plt.hist(lengths, bins=40)
    plt.xlabel("seconds")
    plt.ylabel("count")
    plt.savefig(out, dpi=150, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "wav_lengths.png")
