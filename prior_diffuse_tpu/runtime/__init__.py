from prior_diffuse_tpu.runtime.native import (
    available,
    decode_wav,
    load_batch,
    wav_info,
)

__all__ = ["available", "decode_wav", "load_batch", "wav_info"]
