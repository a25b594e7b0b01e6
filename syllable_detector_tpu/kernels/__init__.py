"""Pallas TPU kernels: the fused STFT+MLP detection path."""

from syllable_detector_tpu.kernels.fused_detector import (
    fusable,
    fused_offline_outputs,
    fused_batch_offline_outputs,
)

__all__ = ["fusable", "fused_offline_outputs", "fused_batch_offline_outputs"]
