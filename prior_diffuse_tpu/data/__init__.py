from prior_diffuse_tpu.data.wavio import read_wav, write_wav
from prior_diffuse_tpu.data.dataset import (
    PairedWavDataset,
    TrainLoader,
    EvalLoader,
    Batch,
)
from prior_diffuse_tpu.data import synthetic

__all__ = [
    "read_wav",
    "write_wav",
    "PairedWavDataset",
    "TrainLoader",
    "EvalLoader",
    "Batch",
    "synthetic",
]
