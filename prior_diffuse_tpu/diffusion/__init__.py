from prior_diffuse_tpu.diffusion.schedule import (
    DiffusionSchedule,
    InferenceSchedule,
    make_schedule,
    inference_schedule,
)
from prior_diffuse_tpu.diffusion.qsample import q_sample, sigma_mask
from prior_diffuse_tpu.diffusion.sampler import reverse_sample

__all__ = [
    "DiffusionSchedule",
    "InferenceSchedule",
    "make_schedule",
    "inference_schedule",
    "q_sample",
    "sigma_mask",
    "reverse_sample",
]
