"""PulseAudio backend: graceful degradation and the full capture/playback
code path driven by a fake libpulse-simple (no daemon needed). Mirrors
tests/test_alsa.py; the shared helpers (deinterleave, ttl_fill) are covered
there."""

import ctypes
import threading
import time

import numpy as np
import pytest

from syllable_detector_tpu.runtime import pulse
from syllable_detector_tpu.runtime.pulse import (
    PulseAudioInput,
    PulseAudioOutput,
    register_pulse_devices,
)


# ---------------------------------------------------------------------------
# graceful degradation without libpulse
# ---------------------------------------------------------------------------


def test_unavailable_is_graceful(monkeypatch):
    monkeypatch.setattr(pulse, "_load_pulse", lambda: None)
    assert register_pulse_devices() == []
    inp = PulseAudioInput()
    with pytest.raises(RuntimeError, match="not available"):
        inp.initialize_audio()
    out = PulseAudioOutput()
    with pytest.raises(RuntimeError, match="not available"):
        out.initialize_audio()


# ---------------------------------------------------------------------------
# fake libpulse-simple driving the real code path
# ---------------------------------------------------------------------------


class FakePulse:
    """Stands in for the ctypes libpulse-simple handle: capture yields a
    counter ramp, playback records written buffers."""

    def __init__(self, channels=2, fail_open=False, fail_after=None):
        self.channels = channels
        self.fail_open = fail_open
        self.fail_after = fail_after  # error every read/write after N calls
        self.pos = 0
        self.calls = 0
        self.written = []
        self.freed = 0
        self.specs = []

    def pa_simple_new(self, server, name, direction, dev, stream_name,
                      spec_ref, chmap, attr_ref, err_ref):
        if self.fail_open:
            err_ref._obj.value = -7  # PA_ERR_CONNECTIONREFUSED-ish
            return 0
        spec = spec_ref._obj
        assert spec.format == pulse.PA_SAMPLE_FLOAT32LE
        assert spec.channels == self.channels
        self.specs.append((direction, spec.rate, spec.channels))
        return 1

    def pa_simple_read(self, handle, ptr, nbytes, err_ref):
        self.calls += 1
        if self.fail_after is not None and self.calls > self.fail_after:
            return -1
        n = int(nbytes) // 4
        data = np.arange(n, dtype=np.float32) + self.pos * self.channels
        self.pos += n // self.channels
        ctypes.memmove(ptr, data.tobytes(), int(nbytes))
        time.sleep(0.001)
        return 0

    def pa_simple_write(self, handle, ptr, nbytes, err_ref):
        self.calls += 1
        if self.fail_after is not None and self.calls > self.fail_after:
            return -1
        n = int(nbytes) // 4
        buf = ctypes.string_at(ptr, int(nbytes))
        self.written.append(
            np.frombuffer(buf, np.float32)
            .reshape(n // self.channels, self.channels)
            .copy()
        )
        time.sleep(0.001)
        return 0

    def pa_simple_free(self, handle):
        self.freed += 1

    def pa_strerror(self, err):
        return b"fake pulse error"


def test_fake_registration(monkeypatch):
    monkeypatch.setenv("PULSE_SOURCE", "mic.usb")
    fake = FakePulse()
    devices = register_pulse_devices(lib=fake)
    uids = [d.device_uid for d in devices]
    assert "pulse:default-source" in uids
    assert "pulse:default-sink" in uids
    assert "pulse:mic.usb" in uids
    src = next(d for d in devices if d.device_uid == "pulse:default-source")
    assert src.streams_input == 1 and src.streams_output == 0

    from syllable_detector_tpu.runtime.audio_io import list_devices

    registry_uids = [d.device_uid for d in list_devices()]
    assert "pulse:default-sink" in registry_uids
    # idempotent: re-registration adds nothing
    assert register_pulse_devices(lib=fake) == []
    uids_after = [d.device_uid for d in list_devices()]
    assert uids_after.count("pulse:default-sink") == 1


def test_fake_capture_delivers_channels():
    fake = FakePulse(channels=2)
    inp = PulseAudioInput(channels=2, frame_size=16, lib=fake)
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
    assert fake.freed == 1
    assert fake.specs[0][0] == pulse.PA_STREAM_RECORD


def test_fake_output_ttl_pulse():
    fake = FakePulse(channels=2)
    out = PulseAudioOutput(channels=2, frame_size=16, sample_rate=16000,
                           lib=fake)
    out.initialize_audio()
    out.create_high_output(1, duration=0.002)  # 32 frames = 2 buffers
    deadline = time.monotonic() + 5
    while len(fake.written) < 8 and time.monotonic() < deadline:
        time.sleep(0.005)
    out.tear_down_audio()
    wave = np.concatenate(fake.written, axis=0)
    assert np.all((wave == 0.0) | (wave == 1.0))
    assert wave[:, 0].sum() == 0  # channel 0 never armed
    assert int(wave[:, 1].sum()) == 32  # exactly duration * rate frames
    idx = np.flatnonzero(wave[:, 1])
    assert len(idx) and idx[-1] - idx[0] + 1 == len(idx)  # contiguous run
    assert fake.specs[0][0] == pulse.PA_STREAM_PLAYBACK


def test_write_error_restores_ttl_frames():
    # a failing write must not eat the armed pulse: frames deducted by
    # ttl_fill are restored so the pulse plays at full length once the
    # stream recovers
    fake = FakePulse(channels=1, fail_after=0)
    out = PulseAudioOutput(channels=1, frame_size=16, sample_rate=16000,
                           lib=fake)
    out.initialize_audio()
    out.create_high_output(0, duration=0.002)  # 32 frames
    deadline = time.monotonic() + 5
    while out.underruns < 3 and time.monotonic() < deadline:
        time.sleep(0.005)
    assert out.underruns >= 3
    with out._lock:
        assert out._high_for[0] == 32  # nothing consumed while erroring
    out.tear_down_audio()


def test_open_failure_raises():
    fake = FakePulse(fail_open=True)
    inp = PulseAudioInput(lib=fake)
    with pytest.raises(RuntimeError, match="pa_simple_new"):
        inp.initialize_audio()


@pytest.mark.skipif(not pulse.pulse_available(),
                    reason="libpulse-simple not present")
def test_real_registration_smoke():
    # where libpulse exists, registration must not crash
    register_pulse_devices()
