from prior_diffuse_tpu.training.optim import torch_adam, set_lr, get_lr
from prior_diffuse_tpu.training.checkpoint import CheckpointStore
from prior_diffuse_tpu.training.plateau import PlateauController
from prior_diffuse_tpu.training.complex_trainer import ComplexTrainer
from prior_diffuse_tpu.training.mag_trainer import MagTrainer
from prior_diffuse_tpu.training.ddpm_trainer import ComplexDDPMTrainer

__all__ = [
    "torch_adam",
    "set_lr",
    "get_lr",
    "CheckpointStore",
    "PlateauController",
    "ComplexTrainer",
    "MagTrainer",
    "ComplexDDPMTrainer",
]
