from prior_diffuse_tpu.metrics.composite import (
    snr_seg,
    fw_snr_seg,
    llr,
    wss,
    composite,
    compare_one,
)
from prior_diffuse_tpu.metrics.stoi import stoi
from prior_diffuse_tpu.metrics.pesq import pesq_score, HAVE_PESQ
from prior_diffuse_tpu.metrics.compare import compare, compare_complex

__all__ = [
    "snr_seg",
    "fw_snr_seg",
    "llr",
    "wss",
    "composite",
    "compare_one",
    "stoi",
    "pesq_score",
    "HAVE_PESQ",
    "compare",
    "compare_complex",
]
