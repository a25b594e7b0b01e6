"""L4/L5 — runtime: device IO backends and pipeline orchestration."""

from syllable_detector_tpu.runtime.track_detector import TrackDetector

__all__ = ["TrackDetector"]
