"""STFT primitive tests: windows, bin ranges, framing, DFT numerics."""

import numpy as np
import jax.numpy as jnp
import pytest

import reference_impl as ref
from syllable_detector_tpu.ops.stft import (
    band_dft_matrices,
    frame_signal,
    frame_start_indices,
    frequencies_for_sample_rate,
    frequency_index_range,
    hop_length,
    num_frames,
    spectral_frames,
    stack_features,
)
from syllable_detector_tpu.ops.windows import make_window


def test_window_formulas():
    n = 256
    i = np.arange(n)
    np.testing.assert_allclose(
        make_window("hamming", n),
        (0.54 - 0.46 * np.cos(2 * np.pi * i / n)).astype(np.float32),
        rtol=0,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        make_window("hanning", n),
        (0.5 - 0.5 * np.cos(2 * np.pi * i / n)).astype(np.float32),
    )
    assert make_window("none", 7).tolist() == [1.0] * 7
    # periodic, not symmetric: differs from numpy.hamming (denominator N-1)
    assert abs(make_window("hamming", n)[-1] - np.hamming(n)[-1]) > 1e-4


def test_frequency_index_range_sample_net():
    # sample.txt: 2000-7000 Hz at 44.1k/256 -> bins [12, 41)
    assert frequency_index_range(256, 2000.0, 7000.0, 44100.0) == (12, 41)


def test_frequency_index_range_edges():
    assert frequency_index_range(256, -1.0, 100.0, 44100.0) is None
    assert frequency_index_range(256, 100.0, 100.0, 44100.0) is None
    # start beyond half length
    assert frequency_index_range(256, 23000.0, 24000.0, 44100.0) is None
    # end clamped to half length
    lo, hi = frequency_index_range(256, 1000.0, 30000.0, 44100.0)
    assert hi == 128
    f = frequencies_for_sample_rate(256, 44100.0)
    assert f[1] == pytest.approx(44100.0 / 256)
    assert len(f) == 128


def test_num_frames_and_hop():
    # sample config: window 256 overlap 124 -> hop 132
    assert hop_length(256, 124) == 132
    assert num_frames(255, 256, 124) == 0
    assert num_frames(256, 256, 124) == 1
    assert num_frames(256 + 131, 256, 124) == 1
    assert num_frames(256 + 132, 256, 124) == 2
    # gap semantics: overlap -4, window 8 -> hop 12, need 12 to start
    assert num_frames(11, 8, -4) == 0
    assert num_frames(12, 8, -4) == 1
    assert num_frames(23, 8, -4) == 1
    assert num_frames(24, 8, -4) == 2


def test_frame_signal_gap():
    x = jnp.arange(36, dtype=jnp.float32)
    frames = frame_signal(x, 3, 8, -4)  # gap 4, window 8, hop 12
    np.testing.assert_array_equal(np.asarray(frames[0]), np.arange(4, 12))
    np.testing.assert_array_equal(np.asarray(frames[1]), np.arange(16, 24))
    np.testing.assert_array_equal(np.asarray(frames[2]), np.arange(28, 36))
    np.testing.assert_array_equal(frame_start_indices(3, 8, -4), [4, 16, 28])


@pytest.mark.parametrize("method", ["matmul", "rfft"])
@pytest.mark.parametrize("kind", ["magnitude", "power"])
def test_spectral_frames_vs_numpy(rng, method, kind):
    x = rng.standard_normal(2000).astype(np.float32)
    f = num_frames(len(x), 256, 124)
    frames = frame_signal(jnp.asarray(x), f, 256, 124)
    got = spectral_frames(
        frames, 256, window_type="hamming", bins=(12, 41), kind=kind, method=method
    )
    want = ref.stft_magnitudes(x, 256, 124, 256)[:, 12:41]
    if kind == "power":
        want = want**2
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-6)


def test_zero_padding_window_lt_fft(rng):
    # window 200 zero-padded into fft 256
    x = rng.standard_normal(1000).astype(np.float32)
    f = num_frames(len(x), 200, 0)
    frames = frame_signal(jnp.asarray(x), f, 200, 0)
    got = spectral_frames(frames, 256, "hanning", bins=(0, 128), kind="magnitude")
    want = ref.stft_magnitudes(x, 200, 0, 256, window="hanning")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_band_dft_matrix_shapes():
    c_re, c_im = band_dft_matrices(256, 256, "hamming", (12, 41))
    assert c_re.shape == (256, 29) and c_im.shape == (256, 29)


def test_stack_features_layout():
    band = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)  # 4 frames, 3 bins
    feats = stack_features(band, 2)
    assert feats.shape == (3, 6)
    # freq-fastest, time-major, oldest frame first
    np.testing.assert_array_equal(np.asarray(feats[0]), [0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(np.asarray(feats[2]), [6, 7, 8, 9, 10, 11])


def test_stack_features_too_few():
    band = jnp.zeros((2, 3))
    assert stack_features(band, 5).shape == (0, 15)
