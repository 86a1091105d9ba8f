"""Plot clean - estimate residual waveforms (motivates the residual
diffusion design; port of the reference's ``scripts/analyze_residual.py``).

Usage: python scripts/analyze_residual.py clean_dir estimate_dir out_dir [n]
"""

import glob
import os
import sys


def main(clean_dir: str, est_dir: str, out_dir: str, n: int = 4):
    import numpy as np

    from prior_diffuse_tpu.data.wavio import read_wav
    from prior_diffuse_tpu.viz import plot_wav

    os.makedirs(out_dir, exist_ok=True)
    names = sorted(os.path.basename(p) for p in glob.glob(f"{clean_dir}/*.wav"))[:n]
    for name in names:
        c, _ = read_wav(os.path.join(clean_dir, name))
        e, _ = read_wav(os.path.join(est_dir, name))
        m = min(len(c), len(e))
        plot_wav(c[:m] - e[:m], title=f"residual {name}",
                 path=os.path.join(out_dir, f"residual_{name}.png"))
        print(name, "residual rms:", float(np.sqrt(np.mean((c[:m] - e[:m]) ** 2))))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 4)
