"""Offline per-track pipeline with exact sample accounting.

Re-implements the reference CLI's TrackDetector
(reference: SyllableDetectorCLI/TrackDetector.swift:12-106): stream a track
through a detector, number every network evaluation in *input sample* units,
emit a CSV line for each detection (any output at or above its threshold),
and debounce subsequent detections for a configurable window.

Accounting reproduced exactly:

  * the first evaluation lands at sample
    ``window + (window - overlap) * (timeRange - 1)``, plus the gap when the
    overlap is negative, since the gap applies to the first window too
    (TrackDetector.swift:38-42);
  * each subsequent evaluation advances ``window - overlap`` samples
    (TrackDetector.swift:68);
  * a detection is *any* output >= its threshold (TrackDetector.swift:71-77),
    unlike the live path which only checks output 0;
  * detections within ``debounceFrames`` of the last printed detection are
    suppressed — the debounce clock restarts only on *printed* detections
    (TrackDetector.swift:80, 99);
  * CSV columns: channel, sample, seconds, out0[, out1...]
    (TrackDetector.swift:92-96).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from syllable_detector_tpu.config.model_format import SyllableDetectorConfig
from syllable_detector_tpu.models.detector import Detector
from syllable_detector_tpu.utils.fmt import fmt_double, fmt_float32

__all__ = ["TrackDetector"]


class TrackDetector:
    def __init__(
        self,
        config: SyllableDetectorConfig,
        channel: int = 0,
        emit: Optional[Callable[[str], None]] = None,
        method: str = "matmul",
    ):
        self.detector = Detector(config, method=method)
        self.config = config
        self.channel = channel
        self.emit = emit if emit is not None else print
        self.debounce_frames = 0
        self._debounce_until = -1
        self._total_samples = 0
        # TrackDetector.swift:38-42
        self._next_output = config.first_output_sample

    @property
    def debounce_time(self) -> float:
        return self.debounce_frames / self.config.sampling_rate

    @debounce_time.setter
    def debounce_time(self, seconds: float) -> None:
        # Int(newValue * samplingRate) truncates (TrackDetector.swift:24)
        self.debounce_frames = int(seconds * self.config.sampling_rate)

    def process(self, samples: np.ndarray) -> None:
        """Feed one decoded buffer and emit CSV lines for new detections."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        num_samples = len(samples)
        if num_samples == 0:
            return

        self.detector.append_audio_data(samples)
        outputs = self.detector.drain()

        rate = self.config.sampling_rate
        thresholds = np.asarray(self.config.thresholds, np.float64)
        for row in outputs:
            cur_output = self._next_output
            self._next_output += self.config.window_length - self.config.window_overlap

            # any output at/above threshold (TrackDetector.swift:71-77);
            # the comparison promotes the float32 output to double
            has_detection = bool(np.any(row.astype(np.float64) >= thresholds))

            if has_detection and self._debounce_until < cur_output:
                cur_time_seconds = cur_output / rate
                line = f"{self.channel},{cur_output},{fmt_double(cur_time_seconds)}"
                for d in row:
                    line += f",{fmt_float32(d)}"
                self.emit(line)
                self._debounce_until = cur_output + self.debounce_frames

        self._total_samples += num_samples
