"""Synthetic labeled songbird-like audio for tests, demos, and hardware
smokes.

The reference ships no labeled training data (Examples/ is gitignored,
.gitignore:3); every training test and hardware validation here uses this
generator so the suite and the on-chip smokes exercise the SAME data.
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_labeled_audio"]


def make_labeled_audio(seconds=4.0, rate=44100, seed=0):
    """Syllable = loud band-limited chirp bursts; silence/noise elsewhere.

    Returns (audio float32 [n], intervals [(start_s, end_s), ...]); the
    labeled intervals sit inside the bursts (past the detector's window
    fill) so edge evaluations count as neither hits nor false alarms.
    """
    rng = np.random.default_rng(seed)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    x = 0.01 * rng.standard_normal(n)
    intervals = []
    pos = 0.3
    while pos + 0.25 < seconds:
        lo, hi = pos, pos + 0.15
        m = (t >= lo) & (t < hi)
        tt = t[m] - lo
        f0 = 3000.0 + 1500.0 * np.sin(2 * np.pi * 8 * tt)
        x[m] += 0.6 * np.sin(2 * np.pi * np.cumsum(f0) / rate)
        intervals.append((lo + 0.04, hi - 0.01))  # interior, past window fill
        pos += 0.55
    return x.astype(np.float32), intervals
