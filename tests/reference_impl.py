"""Independent NumPy implementation of the reference pipeline.

This is the test oracle: a deliberately simple, loop-level transliteration of
the Swift math (hop-by-hop STFT, per-eval MLP), kept separate from the
framework so the two implementations can only agree by computing the same
thing. Cites the same reference lines the framework does.
"""

from __future__ import annotations

import math

import numpy as np


def vdsp_window(kind: str, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    if kind == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * i / n)
    if kind == "hanning":
        return 0.5 - 0.5 * np.cos(2 * np.pi * i / n)
    if kind == "blackman":
        return 0.42 - 0.5 * np.cos(2 * np.pi * i / n) + 0.08 * np.cos(4 * np.pi * i / n)
    return np.ones(n)


def freq_index_range(fft_len, f0, f1, rate):
    # CircularShortTimeFourierTransform.swift:166-191
    if not (f0 >= 0 and f1 > f0):
        return None
    half = fft_len // 2
    ff = fft_len / rate
    start = int(math.ceil(ff * f0))
    if start >= half:
        return None
    end = int(math.floor(ff * f1)) + 1
    if end < start:
        return None
    return (start, min(end, half))


def stft_magnitudes(x, window_length, window_overlap, fft_length, window="hamming"):
    """Hop-by-hop |DFT| frames, bins [0, fft/2)."""
    gap = -window_overlap if window_overlap < 0 else 0
    overlap = window_overlap if window_overlap >= 0 else 0
    hop = gap + window_length - overlap
    w = vdsp_window(window, window_length)
    frames = []
    pos = 0
    n = len(x)
    while n - pos >= gap + window_length:
        seg = x[pos + gap : pos + gap + window_length].astype(np.float64)
        padded = np.zeros(fft_length)
        padded[:window_length] = seg * w
        spec = np.fft.rfft(padded)[: fft_length // 2]
        frames.append(np.abs(spec))
        pos += hop
    return np.asarray(frames)


def net_apply(cfg, x64):
    """One MLP evaluation in float32 like vDSP (cfg: parsed config)."""
    x = x64.astype(np.float32)
    for p in cfg.process_inputs:
        if p.name == "l2normalize":
            x = x / np.float32(np.sqrt(np.sum(x.astype(np.float32) ** 2)))
        elif p.name == "mapminmax":
            x = (x - p.x_offsets) * p.gains + np.float32(p.y_offset)
        elif p.name == "mapstd":
            x = (x - p.x_offsets) * p.gains + np.float32(p.y_offset)
        elif p.name == "normalize":
            mn, mx = x.min(), x.max()
            if mx == mn:
                x = np.full_like(x, -1.0)
            else:
                x = x * np.float32(2.0 / (mx - mn)) + np.float32(
                    (0.0 - mn - mx) / (mx - mn)
                )
        elif p.name == "normalizestd":
            x = (x - x.mean()) / np.float32(np.sqrt(np.mean((x - x.mean()) ** 2)))
    for layer in cfg.layers:
        x = layer.weights @ x + layer.biases
        if layer.transfer == "TanSig":
            x = np.tanh(x)
        elif layer.transfer == "LogSig":
            x = 1.0 / (1.0 + np.exp(-x))
        elif layer.transfer == "SatLin":
            x = np.clip(x, 0.0, 1.0)
        x = x.astype(np.float32)
    for p in cfg.process_outputs:
        x = (x - np.float32(p.y_offset)) / p.gains + p.x_offsets
    return x.astype(np.float32)


def detect_offline(cfg, samples):
    """Full pipeline -> [n_evals, outputs] float32."""
    bins = freq_index_range(
        cfg.fourier_length, cfg.freq_range[0], cfg.freq_range[1], cfg.sampling_rate
    )
    mags = stft_magnitudes(
        samples, cfg.window_length, cfg.window_overlap, cfg.fourier_length
    )
    band = mags[:, bins[0] : bins[1]]
    t = cfg.time_range
    outs = []
    for e in range(len(band) - t + 1):
        feat = band[e : e + t].reshape(-1)
        if cfg.scaling == "db":
            feat = 20.0 * np.log10(feat)
        elif cfg.scaling == "log":
            feat = np.log(feat)
        outs.append(net_apply(cfg, feat))
    if not outs:
        return np.zeros((0, cfg.net_outputs), np.float32)
    return np.stack(outs)


def cli_lines(cfg, samples, channel=0, debounce_frames=0):
    """Expected CSV lines (TrackDetector.swift:45-105 semantics)."""
    from syllable_detector_tpu.utils.fmt import fmt_double, fmt_float32

    outs = detect_offline(cfg, samples)
    next_output = cfg.first_output_sample
    hop_inc = cfg.window_length - cfg.window_overlap
    debounce_until = -1
    lines = []
    thr = np.asarray(cfg.thresholds, np.float64)
    for row in outs:
        cur = next_output
        next_output += hop_inc
        if np.any(row.astype(np.float64) >= thr) and debounce_until < cur:
            line = f"{channel},{cur},{fmt_double(cur / cfg.sampling_rate)}"
            for d in row:
                line += f",{fmt_float32(d)}"
            lines.append(line)
            debounce_until = cur + debounce_frames
    return lines
