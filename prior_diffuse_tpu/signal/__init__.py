from prior_diffuse_tpu.signal.stft import (
    stft,
    istft,
    hann_window,
    frame_count,
    dft_matrices,
)
from prior_diffuse_tpu.signal.compress import (
    compress_spec,
    decompress_spec,
    mag_phase,
    from_mag_phase,
)
from prior_diffuse_tpu.signal.normalize import rms_scale

__all__ = [
    "stft",
    "istft",
    "hann_window",
    "frame_count",
    "dft_matrices",
    "compress_spec",
    "decompress_spec",
    "mag_phase",
    "from_mag_phase",
    "rms_scale",
]
