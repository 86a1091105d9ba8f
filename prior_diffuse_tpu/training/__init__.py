from prior_diffuse_tpu.training.optim import torch_adam, set_lr, get_lr
from prior_diffuse_tpu.training.checkpoint import CheckpointStore
from prior_diffuse_tpu.training.plateau import PlateauController

__all__ = [
    "torch_adam",
    "set_lr",
    "get_lr",
    "CheckpointStore",
    "PlateauController",
]
