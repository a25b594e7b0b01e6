"""Compressed-audio ingest: OGG Vorbis roundtrip (real libs), MP3 via a
fake libmpg123, graceful degradation without codec libraries."""

import ctypes

import numpy as np
import pytest

from syllable_detector_tpu.utils import codecs
from syllable_detector_tpu.utils.wav import read_audio
from test_detector import make_audio

needs_vorbis = pytest.mark.skipif(
    not (codecs.ogg_vorbis_available() and codecs.vorbis_encoder_available()),
    reason="libvorbis/libvorbisfile/libvorbisenc not available",
)


@needs_vorbis
def test_ogg_roundtrip(tmp_path):
    rate = 44100
    t = np.arange(int(0.5 * rate)) / rate
    x = np.stack(
        [
            0.4 * np.sin(2 * np.pi * 2500 * t),
            0.3 * np.sin(2 * np.pi * 5000 * t),
        ],
        axis=1,
    ).astype(np.float32)
    p = tmp_path / "t.ogg"
    codecs.write_ogg_vorbis(p, x, rate, quality=0.8)
    y, r = read_audio(p)  # routes through the OggS magic sniff
    assert r == rate
    assert y.shape[1] == 2
    # vorbis is lossy: same length, strongly correlated, bounded rms error
    assert abs(y.shape[0] - x.shape[0]) < 4096
    n = min(len(x), len(y))
    a, b = x[2048 : n - 2048], y[2048 : n - 2048]
    assert np.corrcoef(a[:, 0], b[:, 0])[0, 1] > 0.98
    assert np.sqrt(np.mean((a - b) ** 2)) < 0.05


@needs_vorbis
def test_ogg_mono_roundtrip(tmp_path):
    rate = 22050
    x = (0.3 * np.sin(2 * np.pi * 1000 * np.arange(8000) / rate)).astype(
        np.float32
    )
    p = tmp_path / "m.ogg"
    codecs.write_ogg_vorbis(p, x, rate)
    y, r = codecs.read_ogg_vorbis(p)
    assert r == rate and y.shape[1] == 1


@needs_vorbis
def test_cli_detects_on_ogg(sample_config, tmp_path, capsys):
    """End-to-end: an OGG Vorbis corpus file through the detection CLI.

    The oracle runs on the DECODED samples (vorbis is lossy), so the CSV
    must match exactly — this verifies the ingest routing, not the codec.
    """
    import reference_impl as ref
    from syllable_detector_tpu.cli import main as cli_main
    from test_cli_golden import assert_csv_close

    rng = np.random.default_rng(7)
    x = make_audio(rng, seconds=0.4)
    p = tmp_path / "c.ogg"
    codecs.write_ogg_vorbis(p, x, 44100, quality=0.9)
    decoded, rate = codecs.read_ogg_vorbis(p)
    assert rate == 44100

    rc = cli_main(["-n", "/root/reference/sample.txt", "-a", str(p)])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l]
    want = ref.cli_lines(sample_config, decoded[:, 0])
    assert len(want) > 0
    assert_csv_close(out, want)


def test_ogg_corrupt_is_valueerror(tmp_path):
    if not codecs.ogg_vorbis_available():
        pytest.skip("libvorbisfile not available")
    p = tmp_path / "bad.ogg"
    p.write_bytes(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError):
        read_audio(p)


class _FakeFn:
    """Callable with assignable restype/argtypes (ctypes-lib compatible)."""

    def __init__(self, fn):
        self.fn = fn
        self.restype = None
        self.argtypes = None

    def __call__(self, *args):
        return self.fn(*args)


class _FakeMpg123:
    """Minimal libmpg123 emulation: one stereo float32 read then DONE."""

    def __init__(self, pcm: np.ndarray, rate: int):
        interleaved = pcm.astype(np.float32).tobytes()
        self._payload = interleaved
        self._rate = rate
        self._channels = pcm.shape[1]
        self._read_calls = 0
        self.mpg123_init = _FakeFn(lambda: 0)
        self.mpg123_new = _FakeFn(lambda name, err: 1)
        self.mpg123_open = _FakeFn(lambda h, path: 0)
        self.mpg123_getformat = _FakeFn(self._getformat)
        self.mpg123_format_none = _FakeFn(lambda h: 0)
        self.mpg123_format = _FakeFn(lambda h, r, c, e: 0)
        self.mpg123_read = _FakeFn(self._read)
        self.mpg123_close = _FakeFn(lambda h: 0)
        self.mpg123_delete = _FakeFn(lambda h: 0)

    def _getformat(self, h, rate_ref, ch_ref, enc_ref):
        rate_ref._obj.value = self._rate
        ch_ref._obj.value = self._channels
        enc_ref._obj.value = 0x200
        return 0

    def _read(self, h, buf, size, done_ref):
        self._read_calls += 1
        if self._read_calls == 1:
            ctypes.memmove(buf, self._payload, len(self._payload))
            done_ref._obj.value = len(self._payload)
            return 0  # MPG123_OK
        done_ref._obj.value = 0
        return -12  # MPG123_DONE


def test_mp3_decode_via_fake_lib(monkeypatch, tmp_path):
    """read_mp3 drives the full libmpg123 call sequence; a fake lib returns
    known PCM, which must surface deinterleaved at the reported rate."""
    rng = np.random.default_rng(3)
    pcm = rng.uniform(-0.5, 0.5, (256, 2)).astype(np.float32)
    fake = _FakeMpg123(pcm, 32000)
    monkeypatch.setitem(codecs._libs, "mpg123", fake)

    p = tmp_path / "t.mp3"
    p.write_bytes(b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\xff\xfb" + b"\x00" * 32)
    y, rate = read_audio(p)  # ID3 magic routes to read_mp3
    assert rate == 32000
    np.testing.assert_allclose(y, pcm, rtol=0, atol=0)
    assert fake._read_calls == 2


def test_mp3_bare_sync_sniff(monkeypatch, tmp_path):
    """A tag-less MP3 (frame sync 0xFFE...) also routes to the decoder."""
    pcm = np.zeros((16, 1), np.float32)
    fake = _FakeMpg123(pcm, 44100)
    monkeypatch.setitem(codecs._libs, "mpg123", fake)
    p = tmp_path / "raw.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    y, rate = read_audio(p)
    assert rate == 44100 and y.shape == (16, 1)


def test_missing_codecs_graceful(monkeypatch, tmp_path):
    """Without codec libs or soundfile, sniffed compressed files raise the
    ingest ValueError contract (callers skip-and-continue per file)."""
    monkeypatch.setattr(codecs, "ogg_vorbis_available", lambda: False)
    monkeypatch.setattr(codecs, "mp3_available", lambda: False)
    monkeypatch.setattr(codecs, "soundfile_available", lambda: False)

    p = tmp_path / "x.ogg"
    p.write_bytes(b"OggS" + b"\x00" * 16)
    with pytest.raises(ValueError, match="OGG container"):
        read_audio(p)
    p2 = tmp_path / "x.mp3"
    p2.write_bytes(b"ID3" + b"\x00" * 16)
    with pytest.raises(ValueError, match="MPEG audio"):
        read_audio(p2)


def test_soundfile_route(monkeypatch, tmp_path):
    """When the optional soundfile package exists, unknown containers (e.g.
    FLAC) route through it; emulated here via a fake module."""
    import sys
    import types

    calls = {}

    fake_sf = types.ModuleType("soundfile")

    def fake_read(path, dtype="float32", always_2d=True):
        calls["path"] = path
        return np.zeros((100, 1), np.float32), 48000

    fake_sf.read = fake_read
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)

    p = tmp_path / "t.flac"
    p.write_bytes(b"fLaC" + b"\x00" * 32)
    y, rate = read_audio(p)
    assert rate == 48000 and y.shape == (100, 1)
    assert calls["path"] == str(p)


def test_mp3_decode_real_lib(tmp_path):
    """REAL libmpg123 decode of hand-crafted MPEG-1 Layer II frames.

    A frame whose bit-allocation field is all zero is trivially valid and
    decodes to 1152 silent samples — constructable without an encoder:
    header 0xFF 0xFD 0x10 0xC0 = sync + MPEG-1 + Layer II + no CRC +
    32 kbps + 44.1 kHz + mono; frame length 144*32000/44100 = 104 bytes.
    """
    if not codecs.mp3_available():
        pytest.skip("libmpg123 not available")
    frame = bytes([0xFF, 0xFD, 0x10, 0xC0]) + bytes(100)
    p = tmp_path / "silent.mp2"
    p.write_bytes(frame * 8)
    y, rate = read_audio(p)  # frame-sync magic routes to read_mp3
    assert rate == 44100
    assert y.shape[1] == 1
    # mpg123 trims decoder-delay frames; several frames must still surface
    assert y.shape[0] >= 1152
    assert y.shape[0] % 1152 == 0
    assert np.abs(y).max() == 0.0


def test_mp3_midstream_rate_change_rejected(monkeypatch, tmp_path):
    """A concatenated stream whose rate changes mid-decode fails loudly
    instead of silently truncating."""

    class _RateChanger(_FakeMpg123):
        def _read(self, h, buf, size, done_ref):
            self._read_calls += 1
            if self._read_calls == 1:
                ctypes.memmove(buf, self._payload, len(self._payload))
                done_ref._obj.value = len(self._payload)
                return 0
            if self._read_calls == 2:
                self._rate = 22050  # next getformat reports the new rate
                done_ref._obj.value = 0
                return -11  # MPG123_NEW_FORMAT
            done_ref._obj.value = 0
            return -12

    pcm = np.zeros((64, 1), np.float32)
    fake = _RateChanger(pcm, 44100)
    monkeypatch.setitem(codecs._libs, "mpg123", fake)
    p = tmp_path / "multi.mp3"
    p.write_bytes(b"ID3" + b"\x00" * 32)
    with pytest.raises(ValueError, match="mid-stream"):
        read_audio(p)


def test_mpeg_sniff_rejects_adts_and_free_bitrate(tmp_path, monkeypatch):
    """ADTS AAC (layer bits 00) and invalid bitrate/sampling fields do not
    route to the MP3 decoder."""
    monkeypatch.setattr(codecs, "mp3_available", lambda: False)
    monkeypatch.setattr(codecs, "ogg_vorbis_available", lambda: False)
    monkeypatch.setattr(codecs, "soundfile_available", lambda: False)
    for name, head in (
        ("adts.aac", b"\xff\xf1\x50\x80"),  # MPEG-4 ADTS: layer 00
        ("badbr.bin", b"\xff\xfb\xf0\x00"),  # bitrate index 1111
        ("badsr.bin", b"\xff\xfb\x9c\x00"),  # sampling index 11
    ):
        p = tmp_path / name
        p.write_bytes(head + b"\x00" * 32)
        # none of these are "MPEG audio" per the sniff; the generic
        # unsupported-container error fires instead of the MP3 route
        with pytest.raises(ValueError, match="unsupported audio container"):
            read_audio(p)
