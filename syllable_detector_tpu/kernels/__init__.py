"""Pallas TPU kernels: the fused STFT+MLP detection path and the framed
GEMM building block (polyphase resampler)."""

from syllable_detector_tpu.kernels.fused_detector import (
    fusable,
    fused_offline_outputs,
    fused_batch_offline_outputs,
    fused_flat_batch_offline_outputs,
    flat_batch_input_samples,
    fused_input_samples,
)
from syllable_detector_tpu.kernels.framed_gemm import (
    framed_gemm,
    pallas_polyphase_resample,
)

__all__ = [
    "fusable",
    "fused_offline_outputs",
    "fused_batch_offline_outputs",
    "fused_flat_batch_offline_outputs",
    "flat_batch_input_samples",
    "fused_input_samples",
    "framed_gemm",
    "pallas_polyphase_resample",
]
