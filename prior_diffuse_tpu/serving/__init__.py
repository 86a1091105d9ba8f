from prior_diffuse_tpu.serving.enhance import (
    enhance_directory,
    enhance_files,
    enhance_waveform,
)

__all__ = ["enhance_directory", "enhance_files", "enhance_waveform"]
