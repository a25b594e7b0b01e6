"""Resampler tests: bit-matching streaming linear path and polyphase quality."""

import numpy as np
import pytest

from syllable_detector_tpu.ops.resample import (
    linear_resample,
    linear_resample_chunk,
    linear_resample_init,
    polyphase_filter_bank,
    polyphase_resample,
)


def brute_linear(data, step):
    """Whole-array oracle for the vDSP vramp+vlint math (float32)."""
    data = data.astype(np.float32)
    n = len(data)
    num_out = int((np.float32(n) - np.float32(0.0)) / np.float32(step))
    idx = np.arange(num_out, dtype=np.float32) * np.float32(step)
    j = np.minimum(np.floor(idx).astype(int), n - 1)
    j1 = np.minimum(j + 1, n - 1)
    frac = idx - j.astype(np.float32)
    return (data[j] + frac * (data[j1] - data[j])).astype(np.float32)


def test_linear_whole_array_matches_oracle(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    got = linear_resample(x, 96000.0, 44100.0)
    want = brute_linear(x, np.float32(96000.0 / 44100.0))
    np.testing.assert_array_equal(got, want)


def swift_resample_chunk(data, step, last, offset):
    """Scalar transliteration of ResamplerLinear.resampleVector
    (Resampler.swift:35-70) — the bit-fidelity oracle."""
    data = data.astype(np.float32)
    n = len(data)
    interpolate_across = offset < 0
    num_out = int((np.float32(n) - offset) / step)
    indices = np.empty(num_out, np.float32)
    for k in range(num_out):
        indices[k] = offset + np.float32(k) * step
    if interpolate_across:
        indices[0] = 0.0
    out = np.empty(num_out, np.float32)
    for k in range(num_out):
        j = min(int(np.floor(indices[k])), n - 1)
        j1 = min(j + 1, n - 1)
        frac = np.float32(indices[k] - np.float32(j))
        out[k] = data[j] + frac * (data[j1] - data[j])
    if interpolate_across:
        out[0] = last * (np.float32(0) - offset) + data[0] * (np.float32(1) + offset)
    new_offset = np.float32(indices[num_out - 1] + step - np.float32(n - 1))
    return out, data[n - 1], new_offset


def test_linear_chunked_matches_swift_oracle(rng):
    """Chunked streaming must match the Swift code hop for hop — including
    the reference's one-sample drift per chunk boundary
    (offset rebased to n-1, Resampler.swift:65)."""
    x = rng.standard_normal(5000).astype(np.float32)
    step = np.float32(48000.0 / 44100.0)
    state = linear_resample_init(48000.0, 44100.0)
    last, offset = np.float32(0), np.float32(0)
    pos = 0
    for c in [37, 1024, 5, 2048, 1886]:  # >=4: num_out==0 is UB in Swift
        chunk = x[pos : pos + c]
        got, state = linear_resample_chunk(chunk, state)
        want, last, offset = swift_resample_chunk(chunk, step, last, offset)
        np.testing.assert_array_equal(got, want)
        assert state.offset == offset and state.last == last
        pos += c


@pytest.mark.parametrize("rates", [(48000.0, 44100.0), (22050.0, 44100.0)])
def test_linear_exact_chunk_invariance(rng, rates):
    """Drift-free streaming: any two chunkings agree, and positions match the
    ideal float64 grid (value error bounded by interpolation rounding)."""
    from syllable_detector_tpu.ops.resample import linear_resample_chunk_exact

    x = rng.standard_normal(9973).astype(np.float32)
    step = rates[0] / rates[1]

    results = []
    for chunks in ([1000] * 9 + [973], [37, 4096, 1, 2048, 3791], [9973]):
        state = linear_resample_init(*rates)
        outs = []
        pos = 0
        for c in chunks:
            out, state = linear_resample_chunk_exact(x[pos : pos + c], state)
            outs.append(out)
            pos += c
        results.append(np.concatenate(outs))

    m = min(len(r) for r in results)
    assert max(len(r) for r in results) - m <= 1  # end-of-stream tail only
    for r in results[1:]:
        np.testing.assert_allclose(r[:m], results[0][:m], rtol=0, atol=1e-6)

    # value check against ideal float64 interpolation on the exact grid
    pos64 = np.arange(m, dtype=np.float64) * step
    j = np.floor(pos64).astype(int)
    frac = pos64 - j
    ideal = x[j] * (1 - frac) + x[np.minimum(j + 1, len(x) - 1)] * frac
    np.testing.assert_allclose(results[0][:m], ideal, rtol=0, atol=1e-5)


def test_linear_interpolate_across_boundary():
    # engineered so the second chunk starts with offset < 0
    state = linear_resample_init(2.0, 3.0)  # step = 2/3, upsampling
    a = np.asarray([0.0, 3.0, 6.0], np.float32)
    out1, state = linear_resample_chunk(a, state)
    # indices 0, 2/3, 4/3, 2 -> 4 outputs... num_out = int(3/(2/3)) = 4
    np.testing.assert_allclose(out1, [0.0, 2.0, 4.0, 6.0], atol=1e-5)
    # offset = 2 + 2/3 - 2 = 2/3 >= 0 here; craft negative offset case
    state2 = linear_resample_init(1.0, 2.0)  # step 0.5
    b = np.asarray([0.0, 1.0], np.float32)
    out2, state2 = linear_resample_chunk(b, state2)
    # indices 0, .5, 1, 1.5 -> but num_out = int(2/0.5)=4; idx 1.5 clamps
    assert len(out2) == 4
    # offset = 1.5 + 0.5 - 1 = 1.0 -> next chunk starts at idx 1.0
    c = np.asarray([2.0, 3.0], np.float32)
    out3, state3 = linear_resample_chunk(c, state2)
    assert state2.offset == 1.0
    # indices 1.0 and 1.5; the 1.5 lookup clamps at the last sample
    np.testing.assert_allclose(out3, [3.0, 3.0], atol=1e-6)


def test_linear_dc_preserved():
    x = np.full(1000, 0.75, np.float32)
    y = linear_resample(x, 96000.0, 44100.0)
    np.testing.assert_allclose(y, 0.75, atol=1e-6)


def test_polyphase_filter_bank_shapes():
    hb, half = polyphase_filter_bank(147, 320)
    assert hb.shape[0] == 147
    # DC gain of the full filter equals `up`
    assert hb.sum() == pytest.approx(147.0, rel=1e-3)


def brute_upfirdn(x, up, down, hb_full, half):
    """Direct zero-stuff + convolve + downsample oracle."""
    n = len(x)
    ups = np.zeros(n * up)
    ups[::up] = x
    y_full = np.convolve(ups, hb_full)
    # sample at k*down + half (group-delay aligned)
    n_out = -(-n * up // down)
    idx = np.arange(n_out) * down + half
    idx = idx[idx < len(y_full)]
    return y_full[idx]


def test_polyphase_matches_brute_force(rng):
    from syllable_detector_tpu.ops.resample import _kaiser_sinc_filter

    x = rng.standard_normal(600).astype(np.float32)
    up, down = 3, 7
    h = _kaiser_sinc_filter(up, down, 10, 5.0)
    half = (len(h) - 1) // 2
    want = brute_upfirdn(x.astype(np.float64), up, down, h, half)
    got = np.asarray(polyphase_resample(x, 7000.0, 3000.0))
    assert len(got) == -(-len(x) * up // down)
    np.testing.assert_allclose(got[: len(want)], want[: len(got)], rtol=2e-3, atol=2e-4)


def test_polyphase_sine_quality():
    """96k -> 44.1k of a 5 kHz tone must come back clean (the 'terrible
    quality' linear path is only for fidelity; polyphase is the real one)."""
    rate_in, rate_out = 96000.0, 44100.0
    n = 9600
    t = np.arange(n) / rate_in
    x = np.sin(2 * np.pi * 5000.0 * t).astype(np.float32)
    y = np.asarray(polyphase_resample(x, rate_in, rate_out))
    t_out = np.arange(len(y)) / rate_out
    want = np.sin(2 * np.pi * 5000.0 * t_out)
    # ignore filter edges
    m = slice(200, len(y) - 200)
    err = np.abs(y[m] - want[m]).max()
    assert err < 5e-3, err
    # linear path on the same signal is much worse
    ylin = linear_resample(x, rate_in, rate_out)
    errlin = np.abs(ylin[m] - want[: len(ylin)][m]).max()
    assert errlin > 10 * err


def test_polyphase_identity():
    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(polyphase_resample(x, 44100, 44100)), x)
