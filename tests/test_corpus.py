"""Batched corpus scan must equal the streaming CLI path file for file."""

import numpy as np
import pytest

import reference_impl as ref
from syllable_detector_tpu.corpus import (
    corpus_csv_lines,
    scan_corpus,
    scan_corpus_files,
)
from syllable_detector_tpu.utils.wav import write_wav
from test_cli_golden import assert_csv_close
from test_detector import make_audio


def test_scan_corpus_matches_oracle(sample_config):
    rng = np.random.default_rng(9)
    streams = [
        make_audio(rng, seconds=0.4),
        make_audio(rng, seconds=0.7),
        make_audio(rng, seconds=0.25),
    ]
    results = scan_corpus(sample_config, streams)
    assert len(results) == 3
    for s, outs in zip(streams, results):
        want = ref.detect_offline(sample_config, s)
        assert outs.shape == want.shape
        np.testing.assert_allclose(outs, want, rtol=1e-3, atol=2e-4)


def test_corpus_csv_matches_oracle(sample_config):
    rng = np.random.default_rng(9)
    s = make_audio(rng, seconds=0.8)
    outs = scan_corpus(sample_config, [s])[0]
    lines = corpus_csv_lines(sample_config, outs)
    want = ref.cli_lines(sample_config, s)
    assert len(want) > 0
    assert_csv_close(lines, want)


def test_scan_corpus_files(sample_config, tmp_path):
    rng = np.random.default_rng(9)
    paths = []
    audios = []
    for i in range(2):
        x = make_audio(rng, seconds=0.5)
        p = tmp_path / f"f{i}.wav"
        write_wav(p, x, 44100, dtype="float32")
        paths.append(str(p))
        audios.append(x)
    lines = []
    scan_corpus_files(sample_config, paths + [str(tmp_path / "missing.wav")],
                      emit=lines.append, err=lambda s: None)
    # multi-file headers present
    assert lines[0] == paths[0]
    assert paths[1] in lines
    # events match the per-file oracle
    i1 = lines.index(paths[1])
    assert_csv_close(lines[1:i1], ref.cli_lines(sample_config, audios[0]))
    assert_csv_close(lines[i1 + 1 :], ref.cli_lines(sample_config, audios[1]))


def test_scan_corpus_empty(sample_config):
    assert scan_corpus(sample_config, []) == []


def test_cli_batched_mode(sample_config, tmp_path, capsys):
    from syllable_detector_tpu.cli import main as cli_main

    rng = np.random.default_rng(9)
    paths = []
    audios = []
    for i in range(2):
        x = make_audio(rng, seconds=0.4)
        p = tmp_path / f"b{i}.wav"
        write_wav(p, x, 44100, dtype="float32")
        paths.append(str(p))
        audios.append(x)
    rc = cli_main(
        ["-n", "/root/reference/sample.txt", "-a", paths[0], "-a", paths[1],
         "--batched"]
    )
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l]
    assert out[0] == paths[0]
    i1 = out.index(paths[1])
    assert_csv_close(out[1:i1], ref.cli_lines(sample_config, audios[0]))
    assert_csv_close(out[i1 + 1 :], ref.cli_lines(sample_config, audios[1]))
