"""Noisy-vs-clean floor metrics on the test set.

Port of the reference's ``scripts/cal_metrics.py`` (whose recorded
VoiceBank-DEMAND means were CSIG 3.35 / CBAK 2.44 / COVL 2.62 /
PESQ 1.97 / SSNR 1.67).

Usage: python scripts/cal_metrics.py [data_root]
"""

import sys

import numpy as np


def main(root: str = "data"):
    from prior_diffuse_tpu.metrics.compare import compare
    from prior_diffuse_tpu.metrics.pesq import pesq_mode

    res = compare(f"{root}/clean_testset_wav", f"{root}/noisy_testset_wav")
    pm = np.mean(np.asarray(res), axis=0)
    print("csig:%6.4f cbak:%6.4f covl:%6.4f pesq:%6.4f ssnr:%6.4f stoi:%6.4f"
          " [pesq=%s]" % (*pm, pesq_mode()))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "data")
