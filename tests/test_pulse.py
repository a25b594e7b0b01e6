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


# ---------------------------------------------------------------------------
# per-card enumeration via a fake async libpulse (no daemon needed)
# ---------------------------------------------------------------------------


class FakePulseAsync:
    """Emulates the pa_mainloop/pa_context introspection API: two sources
    and one sink, delivered through the real ctypes callback type."""

    def __init__(self, fail_connect=False):
        self.fail_connect = fail_connect
        self.freed = False
        self._infos = {
            "source": [
                (b"alsa_input.card0", b"Built-in Microphone", 44100, 2),
                (b"alsa_input.usb1", b"USB Audio CODEC", 48000, 1),
            ],
            "sink": [
                (b"alsa_output.card0", b"Built-in Speakers", 44100, 2),
            ],
        }

    # mainloop / context lifecycle
    def pa_mainloop_new(self):
        return 1

    def pa_mainloop_get_api(self, m):
        return 2

    def pa_context_new(self, api, name):
        return 3

    def pa_context_connect(self, ctx, server, flags, spawn):
        return -1 if self.fail_connect else 0

    def pa_context_get_state(self, ctx):
        return pulse.PA_CONTEXT_FAILED if self.fail_connect else pulse.PA_CONTEXT_READY

    def pa_mainloop_iterate(self, m, block, retval):
        return 0

    def _deliver(self, kind, ctx, cb, ud):
        for name, desc, rate, ch in self._infos[kind]:
            info = pulse.PaDeviceInfoHead(
                name=name, index=0, description=desc,
                sample_spec=pulse.PaSampleSpec(5, rate, ch),
            )
            cb(ctx, ctypes.pointer(info), 0, ud)
        cb(ctx, None, 1, ud)  # eol
        return 7  # operation handle

    def pa_context_get_source_info_list(self, ctx, cb, ud):
        return self._deliver("source", ctx, cb, ud)

    def pa_context_get_sink_info_list(self, ctx, cb, ud):
        return self._deliver("sink", ctx, cb, ud)

    def pa_operation_get_state(self, op):
        return 1  # PA_OPERATION_DONE

    def pa_operation_unref(self, op):
        pass

    def pa_context_disconnect(self, ctx):
        pass

    def pa_context_unref(self, ctx):
        pass

    def pa_mainloop_free(self, m):
        self.freed = True


def test_enumerate_pulse_devices_fake():
    fake = FakePulseAsync()
    infos = pulse.enumerate_pulse_devices(lib=fake)
    assert len(infos) == 3
    sources = [i for i in infos if i["kind"] == "source"]
    assert len(sources) == 2  # more than one source enumerated
    assert sources[0]["name"] == "alsa_input.card0"
    assert sources[0]["description"] == "Built-in Microphone"
    assert sources[1]["rate"] == 48000 and sources[1]["channels"] == 1
    sinks = [i for i in infos if i["kind"] == "sink"]
    assert sinks[0]["name"] == "alsa_output.card0"
    assert fake.freed  # mainloop torn down


def test_enumerate_connect_failure_graceful():
    fake = FakePulseAsync(fail_connect=True)
    assert pulse.enumerate_pulse_devices(lib=fake) == []
    assert fake.freed


def test_register_enumerated_devices(monkeypatch):
    """register_pulse_devices folds the enumerated per-card devices into
    the shared registry (plus the default source/sink fallbacks)."""
    monkeypatch.setattr(pulse, "_registered_uids", set())
    fake_simple = object()  # truthy: simple API "available"
    devices = register_pulse_devices(
        lib=fake_simple, introspect_lib=FakePulseAsync()
    )
    uids = {d.device_uid for d in devices}
    assert "pulse:alsa_input.card0" in uids
    assert "pulse:alsa_input.usb1" in uids
    assert "pulse:alsa_output.card0" in uids
    assert "pulse:default-source" in uids
    usb = next(d for d in devices if d.device_uid == "pulse:alsa_input.usb1")
    assert usb.streams_input == 1 and usb.streams_output == 0
    assert usb.sample_rate_input == 48000.0
    card0 = next(d for d in devices if d.device_uid == "pulse:alsa_output.card0")
    assert card0.streams_output == 2 and card0.streams_input == 0


def test_monitor_list_devices_shows_enumerated(monkeypatch, capsys):
    """monitor --list-devices surfaces the enumerated pulse devices."""
    from syllable_detector_tpu import monitor

    monkeypatch.setattr(pulse, "_registered_uids", set())
    monkeypatch.setattr(pulse, "_load_pulse", lambda: object())
    monkeypatch.setattr(pulse, "_load_pulse_async", lambda: FakePulseAsync())
    rc = monitor.main(["--list-devices"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pulse:alsa_input.usb1" in out
    assert "USB Audio CODEC" in out
