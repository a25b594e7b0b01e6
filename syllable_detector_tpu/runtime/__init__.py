"""L4/L5 — runtime: device IO backends and pipeline orchestration."""

from syllable_detector_tpu.runtime.track_detector import TrackDetector
from syllable_detector_tpu.runtime.ring_buffer import RingBuffer, native_available
from syllable_detector_tpu.runtime.arduino import (
    ArduinoIO,
    ArduinoPin,
    ArduinoState,
    ArduinoError,
    NativeFirmwareTransport,
    SerialTransport,
    SimulatedArduinoTransport,
)
from syllable_detector_tpu.runtime.audio_io import (
    AudioDevice,
    list_devices,
    register_device,
    add_device_change_listener,
    SimulatedAudioInput,
    SimulatedAudioOutput,
)
from syllable_detector_tpu.runtime.processor import (
    Processor,
    ProcessorEntry,
    AudioTTLOutput,
    ArduinoTTLOutput,
    CallbackOutput,
)

__all__ = [
    "TrackDetector",
    "RingBuffer",
    "native_available",
    "ArduinoIO",
    "ArduinoPin",
    "ArduinoState",
    "ArduinoError",
    "NativeFirmwareTransport",
    "SerialTransport",
    "SimulatedArduinoTransport",
    "AudioDevice",
    "list_devices",
    "register_device",
    "add_device_change_listener",
    "SimulatedAudioInput",
    "SimulatedAudioOutput",
    "Processor",
    "ProcessorEntry",
    "AudioTTLOutput",
    "ArduinoTTLOutput",
    "CallbackOutput",
]
