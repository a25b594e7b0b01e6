"""Framed-GEMM Pallas kernel (interpret mode on CPU) vs frame_signal @ g,
and the Pallas polyphase resampler vs the XLA polyphase path."""

import jax.numpy as jnp
import numpy as np
import pytest

from syllable_detector_tpu.kernels.framed_gemm import (
    framed_gemm,
    pallas_polyphase_resample,
)
from syllable_detector_tpu.ops.resample import polyphase_resample
from syllable_detector_tpu.ops.stft import frame_signal, num_frames


@pytest.mark.parametrize(
    "window,overlap,tile",
    [
        (256, 124, 64),    # the sample net's framing (hop 132)
        (256, 0, 64),      # no overlap (hop == window, single part)
        (200, -56, 32),    # negative overlap = gap
        (64, 32, 8),       # tiny frames, tile not rounding-friendly
        (300, 236, 128),   # window > 2 hops (3 parts)
        (330, 300, 40),    # tile % halo != 0 -> manual-DMA fallback path
    ],
)
def test_framed_gemm_matches_frame_signal(window, overlap, tile):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(9000).astype(np.float32))
    f = num_frames(9000, window, overlap)
    g = jnp.asarray(rng.standard_normal((window, 24)).astype(np.float32))
    want = np.asarray(frame_signal(x, f, window, overlap) @ g)
    got = np.asarray(
        framed_gemm(x, g, window, overlap, f, tile=tile, interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "in_rate,out_rate",
    [
        (48000.0, 44100.0),  # 147/160 downsample
        (44100.0, 48000.0),  # 160/147 upsample
        (96000.0, 44100.0),  # 147/320 heavy downsample
        (22050.0, 44100.0),  # 2/1 pure upsample
    ],
)
def test_pallas_polyphase_matches_xla(in_rate, out_rate):
    rng = np.random.default_rng(5)
    t = np.arange(int(in_rate * 0.2)) / in_rate
    x = (0.5 * np.sin(2 * np.pi * 3000.0 * t)).astype(np.float32)
    x += 0.01 * rng.standard_normal(len(x)).astype(np.float32)
    want = np.asarray(polyphase_resample(x, in_rate, out_rate))
    got = np.asarray(
        pallas_polyphase_resample(x, in_rate, out_rate, interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_polyphase_rate_identity():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    y = pallas_polyphase_resample(x, 44100.0, 44100.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), x)
