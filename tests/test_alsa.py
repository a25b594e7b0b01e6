"""ALSA backend: pure helpers, graceful degradation, and the full
capture/playback code path driven by a fake libasound (no sound card
needed). Real-hardware smoke runs only where libasound + a device exist."""

import ctypes
import threading
import time

import numpy as np
import pytest

from syllable_detector_tpu.runtime import alsa
from syllable_detector_tpu.runtime.alsa import (
    AlsaAudioInput,
    AlsaAudioOutput,
    deinterleave,
    register_alsa_devices,
    ttl_fill,
)

libc = ctypes.CDLL(None)
libc.strdup.restype = ctypes.c_void_p
libc.strdup.argtypes = [ctypes.c_char_p]


# ---------------------------------------------------------------------------
# pure helpers
# ---------------------------------------------------------------------------


def test_deinterleave():
    buf = np.arange(12, dtype=np.float32)  # [L0 R0 L1 R1 ...]
    chans = deinterleave(buf, 2)
    np.testing.assert_array_equal(chans[0], [0, 2, 4, 6, 8, 10])
    np.testing.assert_array_equal(chans[1], [1, 3, 5, 7, 9, 11])
    assert all(c.flags.c_contiguous for c in chans)


def test_ttl_fill_renders_and_decrements():
    out = np.full((8, 2), -1.0, np.float32)
    high = np.array([5, 0], np.int64)
    ttl_fill(out, high)
    np.testing.assert_array_equal(out[:, 0], [1, 1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(out[:, 1], np.zeros(8))
    assert high[0] == 0
    # pulses longer than one buffer carry into the next (renderOutput's
    # decrement-per-buffer, AudioInterface.swift:13-40)
    high = np.array([11, 0], np.int64)
    ttl_fill(out, high)
    assert high[0] == 3 and np.all(out[:, 0] == 1.0)
    ttl_fill(out, high)
    np.testing.assert_array_equal(out[:, 0], [1, 1, 1, 0, 0, 0, 0, 0])


# ---------------------------------------------------------------------------
# graceful degradation without libasound
# ---------------------------------------------------------------------------


def test_unavailable_is_graceful(monkeypatch):
    monkeypatch.setattr(alsa, "_load_alsa", lambda: None)
    assert register_alsa_devices() == []
    inp = AlsaAudioInput()
    with pytest.raises(RuntimeError, match="not available"):
        inp.initialize_audio()
    out = AlsaAudioOutput()
    with pytest.raises(RuntimeError, match="not available"):
        out.initialize_audio()


# ---------------------------------------------------------------------------
# fake libasound driving the real code path
# ---------------------------------------------------------------------------


class FakeAlsa:
    """Stands in for the ctypes libasound handle: capture yields a counter
    ramp, playback records written buffers."""

    def __init__(self, channels=2, fail_open=False):
        self.channels = channels
        self.fail_open = fail_open
        self.pos = 0
        self.written = []
        self.closed = 0
        self._hint_arrays = []  # keep alive

    # --- pcm ---
    def snd_pcm_open(self, handle_ref, name, stream, mode):
        return -2 if self.fail_open else 0

    def snd_pcm_set_params(self, h, fmt, access, channels, rate, resample, lat):
        assert fmt == alsa.SND_PCM_FORMAT_FLOAT_LE
        assert channels == self.channels
        return 0

    def snd_pcm_readi(self, h, ptr, frames):
        n = int(frames) * self.channels
        data = (np.arange(n, dtype=np.float32) + self.pos * self.channels)
        self.pos += int(frames)
        ctypes.memmove(ptr, data.tobytes(), n * 4)
        time.sleep(0.001)
        return int(frames)

    def snd_pcm_writei(self, h, ptr, frames):
        n = int(frames) * self.channels
        buf = ctypes.string_at(ptr, n * 4)
        self.written.append(
            np.frombuffer(buf, np.float32).reshape(int(frames), self.channels).copy()
        )
        time.sleep(0.001)
        return int(frames)

    def snd_pcm_recover(self, h, err, silent):
        return 0

    def snd_pcm_close(self, h):
        self.closed += 1
        return 0

    # --- hints ---
    def snd_device_name_hint(self, card, iface, hints_ref):
        arr = (ctypes.c_void_p * 3)(1, 2, None)  # two fake hints
        self._hint_arrays.append(arr)
        ptr_obj = hints_ref._obj
        ctypes.memmove(
            ctypes.byref(ptr_obj),
            ctypes.byref(ctypes.c_void_p(ctypes.addressof(arr))),
            ctypes.sizeof(ctypes.c_void_p),
        )
        return 0

    def snd_device_name_get_hint(self, hint, key):
        table = {
            (1, b"NAME"): b"hw:CARD=Fake,DEV=0",
            (1, b"DESC"): b"Fake Soundcard\nDirect hardware device",
            (1, b"IOID"): None,
            (2, b"NAME"): b"monitor:CARD=Fake",
            (2, b"DESC"): b"Fake Monitor",
            (2, b"IOID"): b"Output",
        }
        v = table.get((int(hint) if hint else 0, key))
        return libc.strdup(v) if v is not None else None

    def snd_device_name_free_hint(self, hints):
        return 0


def test_fake_enumeration():
    fake = FakeAlsa()
    devices = register_alsa_devices(lib=fake)
    assert len(devices) == 2
    assert devices[0].device_uid == "alsa:hw:CARD=Fake,DEV=0"
    assert devices[0].device_name == "Fake Soundcard"
    assert devices[0].streams_input == 1 and devices[0].streams_output == 1
    assert devices[1].streams_input == 0  # IOID=Output
    assert devices[0].device_id != devices[1].device_id

    from syllable_detector_tpu.runtime.audio_io import list_devices

    uids = [d.device_uid for d in list_devices()]
    assert "alsa:hw:CARD=Fake,DEV=0" in uids

    # idempotent: re-enumeration registers nothing new, no duplicate rows
    assert register_alsa_devices(lib=fake) == []
    uids_after = [d.device_uid for d in list_devices()]
    assert uids_after.count("alsa:hw:CARD=Fake,DEV=0") == 1


def test_fake_capture_delivers_channels():
    fake = FakeAlsa(channels=2)
    inp = AlsaAudioInput(channels=2, frame_size=16, lib=fake)
    got = {0: [], 1: []}
    done = threading.Event()

    def delegate(interface, ch, samples):
        got[ch].append(samples.copy())
        if len(got[1]) >= 4:
            done.set()

    inp.delegate = delegate
    inp.initialize_audio()
    assert done.wait(timeout=5)
    inp.tear_down_audio()
    c0 = np.concatenate(got[0][:4])
    c1 = np.concatenate(got[1][:4])
    # counter ramp de-interleaved: even values on ch0, odd on ch1
    np.testing.assert_array_equal(c0, np.arange(0, 128, 2, dtype=np.float32))
    np.testing.assert_array_equal(c1, np.arange(1, 128, 2, dtype=np.float32))
    assert fake.closed == 1


def test_fake_capture_xrun_reports_gap():
    """An xrun (readi -> -EPIPE) discards device-buffered audio; the input
    estimates the hole by wall-clock drift (device time vs frames
    delivered) and reports it through gap_delegate so downstream sample
    accounting stays honest."""
    rate = 16000.0
    frame = 16
    t = {"now": 0.0}

    class XrunAlsa(FakeAlsa):
        def __init__(self):
            super().__init__(channels=1)
            self.reads = 0

        def snd_pcm_readi(self, h, ptr, frames):
            self.reads += 1
            if self.reads == 5:
                t["now"] += 1000 / rate  # the device lost 1000 frames here
                return -32  # -EPIPE: overrun
            t["now"] += int(frames) / rate  # device delivers in real time
            return super().snd_pcm_readi(h, ptr, frames)

    fake = XrunAlsa()
    inp = AlsaAudioInput(
        channels=1, frame_size=frame, sample_rate=rate, lib=fake,
        clock=lambda: t["now"],
    )
    gaps = []
    done = threading.Event()
    inp.gap_delegate = lambda interface, lost: gaps.append(lost)
    inp.delegate = (
        lambda interface, ch, samples: done.set() if fake.reads >= 8 else None
    )
    inp.initialize_audio()
    assert done.wait(timeout=5)
    inp.tear_down_audio()

    assert inp.overruns == 1
    # the estimate is the true hole minus the one-chunk anchor bias
    # (the first chunk was captured before the anchor stamp)
    assert gaps == [1000 - frame]
    assert inp.lost_frames == 1000 - frame


def test_fake_output_ttl_pulse():
    fake = FakeAlsa(channels=2)
    out = AlsaAudioOutput(channels=2, frame_size=16, sample_rate=16000, lib=fake)
    out.initialize_audio()
    out.create_high_output(1, duration=0.002)  # 32 frames = 2 buffers
    deadline = time.monotonic() + 5
    while len(fake.written) < 8 and time.monotonic() < deadline:
        time.sleep(0.005)
    out.tear_down_audio()
    wave = np.concatenate(fake.written, axis=0)
    assert np.all((wave == 0.0) | (wave == 1.0))
    assert wave[:, 0].sum() == 0  # channel 0 never armed
    highs = int(wave[:, 1].sum())
    assert highs == 32  # exactly duration * rate frames high
    # and the high frames are one contiguous run
    idx = np.flatnonzero(wave[:, 1])
    assert len(idx) and idx[-1] - idx[0] + 1 == len(idx)


def test_open_failure_raises():
    fake = FakeAlsa(fail_open=True)
    inp = AlsaAudioInput(lib=fake)
    with pytest.raises(RuntimeError, match="snd_pcm_open"):
        inp.initialize_audio()


@pytest.mark.skipif(not alsa.alsa_available(), reason="libasound not present")
def test_real_enumeration_smoke():
    # where ALSA exists, enumeration must not crash (may be empty in CI)
    register_alsa_devices()


def test_short_write_restores_ttl_frames():
    # a short snd_pcm_writei (0 < wrote < frame_size) must give back the
    # high frames ttl_fill deducted for the unplayed tail, so armed pulses
    # keep their full duration
    class ShortWriteAlsa(FakeAlsa):
        def snd_pcm_writei(self, h, ptr, frames):
            super().snd_pcm_writei(h, ptr, frames)
            self.written[-1] = self.written[-1][:4]  # only 4 frames played
            return 4

    fake = ShortWriteAlsa(channels=1)
    out = AlsaAudioOutput(channels=1, frame_size=16, sample_rate=16000,
                          lib=fake)
    out.initialize_audio()
    out.create_high_output(0, duration=0.002)  # 32 frames
    deadline = time.monotonic() + 5
    # 32 high frames at 4 frames actually played per write = 8 short writes
    while time.monotonic() < deadline:
        with out._lock:
            if out._high_for[0] == 0 and len(fake.written) >= 10:
                break
        time.sleep(0.005)
    out.tear_down_audio()
    wave = np.concatenate(fake.written, axis=0)[:, 0]
    assert int(wave.sum()) == 32  # full pulse length reached the device


def test_teardown_with_stuck_reader_leaks_not_crashes():
    """A reader thread stuck in a blocking device call must NOT have the PCM
    freed under it (use-after-free); tear_down returns, leaves the handle,
    and the daemon thread dies with the process."""
    release = threading.Event()

    class BlockingAlsa(FakeAlsa):
        def snd_pcm_readi(self, h, ptr, frames):
            release.wait(timeout=30)  # simulates a stalled capture device
            return -32  # EPIPE after release

    fake = BlockingAlsa(channels=1)
    inp = AlsaAudioInput(channels=1, frame_size=16, lib=fake)
    inp.initialize_audio()
    time.sleep(0.05)  # let the reader enter the blocking read
    t0 = time.monotonic()
    inp.tear_down_audio()  # join times out after 5 s
    assert 4.0 < time.monotonic() - t0 < 10.0
    assert inp._pcm is not None  # handle intentionally leaked
    assert fake.closed == 0      # never freed under the live thread
    release.set()


def test_fake_capture_block_delivery_matches_per_channel():
    """With block_delegate set (the Processor's bulk path), the reader
    delivers ONE [C, got] block per read — content identical to the
    per-channel deinterleave, and the per-channel delegate is not
    called."""
    fake = FakeAlsa(channels=2)
    inp = AlsaAudioInput(channels=2, frame_size=16, lib=fake)
    blocks = []
    per_channel = []
    done = threading.Event()

    def block_delegate(interface, block):
        blocks.append(block.copy())
        if len(blocks) >= 4:
            done.set()

    inp.delegate = lambda i, ch, s: per_channel.append(ch)
    inp.block_delegate = block_delegate
    inp.initialize_audio()
    assert done.wait(timeout=5)
    inp.tear_down_audio()
    assert not per_channel
    glued = np.concatenate(blocks[:4], axis=1)
    assert glued.shape[0] == 2
    np.testing.assert_array_equal(
        glued[0], np.arange(0, 128, 2, dtype=np.float32)
    )
    np.testing.assert_array_equal(
        glued[1], np.arange(1, 128, 2, dtype=np.float32)
    )
