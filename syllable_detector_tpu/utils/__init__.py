"""Shared utilities: WAV IO, stats, timing, formatting, logging."""

from syllable_detector_tpu.utils.wav import read_wav, write_wav
from syllable_detector_tpu.utils.fmt import fmt_float32, fmt_double
from syllable_detector_tpu.utils.stats import SummaryStat, StatMean, StatMax
from syllable_detector_tpu.utils.synth import make_labeled_audio
from syllable_detector_tpu.utils.timing import Time

__all__ = [
    "read_wav",
    "write_wav",
    "fmt_float32",
    "fmt_double",
    "SummaryStat",
    "StatMean",
    "StatMax",
    "Time",
    "make_labeled_audio",
]
