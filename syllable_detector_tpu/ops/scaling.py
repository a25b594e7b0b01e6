"""Spectrogram scaling (reference: Common/SyllableDetector.swift:183-212).

  * ``linear`` — pass-through (no copy in the reference).
  * ``db``     — amplitude decibels, 20*log10(x/1), via vDSP_vdbcon with the
                 amplitude flag (SyllableDetector.swift:193-195).
  * ``log``    — natural log. NOTE: the reference's log branch passes its
                 buffers to vvlogf in the wrong order
                 (SyllableDetector.swift:207: ``vvlogf(samples, scaledSamples,
                 &c)`` writes log(uninitialized) into the ring), so the Swift
                 behavior is undefined; we implement the clearly *intended*
                 semantics, log(x).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_scaling"]


def apply_scaling(x: jnp.ndarray, scaling: str) -> jnp.ndarray:
    if scaling == "linear":
        return x
    if scaling == "db":
        return 20.0 * jnp.log10(x)
    if scaling == "log":
        return jnp.log(x)
    raise ValueError(f"unknown scaling {scaling!r}")
