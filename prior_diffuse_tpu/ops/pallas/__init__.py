from prior_diffuse_tpu.ops.pallas.stft_kernel import stft_pallas, istft_pallas

__all__ = ["stft_pallas", "istft_pallas"]
