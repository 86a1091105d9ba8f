"""4-panel spectrogram comparison figure (port of the reference's paper
figure, ``draw.py:64-117``: noisy / clean / baseline / ours).

Usage:
  python scripts/draw.py utt.wav noisy_dir clean_dir baseline_dir ours_dir out.png
(pass '-' for a missing system to skip its panel)
"""

import os
import sys


def main(name: str, *dirs_and_out: str):
    from prior_diffuse_tpu.data.wavio import read_wav
    from prior_diffuse_tpu.viz import draw_comparison

    *dirs, out = dirs_and_out
    titles_all = ["noisy", "clean", "baseline", "ours"]
    wavs, titles = [], []
    for d, t in zip(dirs, titles_all):
        if d == "-":
            continue
        w, _ = read_wav(os.path.join(d, name))
        wavs.append(w)
        titles.append(t)
    draw_comparison(wavs, titles, path=out)
    print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
