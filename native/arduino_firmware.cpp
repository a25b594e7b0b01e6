// Device-side Arduino serial state machine as NATIVE code — the C++
// counterpart of the reference's firmware (reference: Arduino/Arduino.ino:
// 43-324), compiled host-side and driven through a byte-stream C ABI so the
// full ArduinoIO client protocol (handshake, pin mode, digital/analog
// read/write, pulse) runs against real native code in tests and simulations.
//
// Protocol (MATLAB-ArduinoIO, ASCII opcodes; Arduino.ino:85-320):
//   '0' pin mode      [48, 97+pin, 48+mode]
//   '1' digital read  [49, 97+pin]            -> "<0|1>\r\n"
//   '2' digital write [50, 97+pin, 48+value]
//   '3' analog read   [51, 97+pin]            -> "<0..1023>\r\n"
//   '4' analog write  [52, 97+pin, raw-byte]
//   '5' digital pulse [53, 97+pin]            (1 ms high then low)
//   '99'  query sketch id                     -> "<id>\r\n"
// Unknown/implausible bytes reset the parser, exactly like the reference's
// state machine (s = -1 on any mismatch).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <vector>

namespace {

constexpr int kMaxPin = 70;

struct Firmware {
  int state = -1;
  int pin = 0;
  int sketch_id = 0;
  int8_t pin_mode[kMaxPin];    // -1 unset, 0 input, 1 output
  int16_t digital[kMaxPin];    // 0/1
  int16_t analog_out[kMaxPin]; // 0..255 (PWM duty)
  int16_t analog_in[kMaxPin];  // test-settable AI readings (0..1023)
  std::deque<uint8_t> out;     // device -> client bytes
  // (t, kind, pin, value) event log; kind: 0 mode, 1 digital, 2 analog,
  // 3 pulse — mirrors SimulatedArduinoTransport.events for cross-checks
  std::vector<int32_t> events;

  Firmware() {
    std::memset(pin_mode, -1, sizeof(pin_mode));
    std::memset(digital, 0, sizeof(digital));
    std::memset(analog_out, 0, sizeof(analog_out));
    std::memset(analog_in, 0, sizeof(analog_in));
  }

  void emit(int value) {
    char buf[16];
    int n = std::snprintf(buf, sizeof(buf), "%d\r\n", value);
    for (int i = 0; i < n; ++i) out.push_back(static_cast<uint8_t>(buf[i]));
  }

  void record(int kind, int p, int value) {
    events.push_back(kind);
    events.push_back(p);
    events.push_back(value);
  }

  void step(uint8_t val) {
    int s = state;
    if (s == -1) {
      // first opcode byte: '0'..'9' select a command family
      // (Arduino.ino:90-101); anything else stays idle
      if (47 < val && val < 90) s = 10 * (val - 48);
      if ((50 < s && s < 90) || (s > 90 && s != 340 && s != 400)) s = -1;
      state = s;
      return;
    }
    if (s == 0) {  // pin mode: await pin
      if (98 < val && val < 167) {
        pin = val - 97;
        state = 1;
      } else {
        state = -1;
      }
      return;
    }
    if (s == 1) {  // pin mode: await value
      if (47 < val && val < 50) {
        pin_mode[pin] = static_cast<int8_t>(val - 48);
        record(0, pin, val - 48);
      }
      state = -1;
      return;
    }
    if (s == 10) {  // digital read
      if (98 < val && val < 167) emit(digital[val - 97]);
      state = -1;
      return;
    }
    if (s == 20) {  // digital write: await pin
      if (98 < val && val < 167) {
        pin = val - 97;
        state = 21;
      } else {
        state = -1;
      }
      return;
    }
    if (s == 21) {  // digital write: await value
      if (47 < val && val < 50) {
        digital[pin] = static_cast<int16_t>(val - 48);
        record(1, pin, val - 48);
      }
      state = -1;
      return;
    }
    if (s == 30) {  // analog read (analog pins a..p)
      if (96 < val && val < 113) emit(analog_in[val - 97]);
      state = -1;
      return;
    }
    if (s == 40) {  // analog write: await pin
      if (98 < val && val < 167) {
        pin = val - 97;
        state = 41;
      } else {
        state = -1;
      }
      return;
    }
    if (s == 41) {  // analog write: the raw duty byte
      analog_out[pin] = static_cast<int16_t>(val);
      record(2, pin, val);
      state = -1;
      return;
    }
    if (s == 50) {  // digital pulse: 1 ms high then low (Arduino.ino pulse op)
      if (98 < val && val < 167) {
        int p = val - 97;
        digital[p] = 1;
        record(3, p, 1);
        digital[p] = 0;
      }
      state = -1;
      return;
    }
    if (s == 90) {  // query sketch: the second '9'
      if (val == 57) emit(sketch_id);
      state = -1;
      return;
    }
    state = -1;
  }
};

}  // namespace

extern "C" {

void* sdfw_new(int sketch_id) {
  Firmware* f = new (std::nothrow) Firmware();
  if (f) f->sketch_id = sketch_id;
  return f;
}

void sdfw_free(void* h) { delete static_cast<Firmware*>(h); }

void sdfw_write(void* h, const uint8_t* data, int32_t n) {
  Firmware* f = static_cast<Firmware*>(h);
  for (int32_t i = 0; i < n; ++i) f->step(data[i]);
}

int32_t sdfw_read(void* h, uint8_t* buf, int32_t cap) {
  Firmware* f = static_cast<Firmware*>(h);
  int32_t n = 0;
  while (n < cap && !f->out.empty()) {
    buf[n++] = f->out.front();
    f->out.pop_front();
  }
  return n;
}

int32_t sdfw_pin_mode(void* h, int32_t pin) {
  if (pin < 0 || pin >= kMaxPin) return -2;
  return static_cast<Firmware*>(h)->pin_mode[pin];
}

int32_t sdfw_digital(void* h, int32_t pin) {
  if (pin < 0 || pin >= kMaxPin) return -1;
  return static_cast<Firmware*>(h)->digital[pin];
}

int32_t sdfw_analog_out(void* h, int32_t pin) {
  if (pin < 0 || pin >= kMaxPin) return -1;
  return static_cast<Firmware*>(h)->analog_out[pin];
}

void sdfw_set_analog_in(void* h, int32_t pin, int32_t value) {
  if (pin < 0 || pin >= kMaxPin) return;
  static_cast<Firmware*>(h)->analog_in[pin] = static_cast<int16_t>(value);
}

// drain the event log into out[] as (kind, pin, value) triples; returns the
// number of int32 written (<= cap)
int32_t sdfw_events(void* h, int32_t* out, int32_t cap) {
  Firmware* f = static_cast<Firmware*>(h);
  int32_t n = static_cast<int32_t>(f->events.size());
  if (n > cap) n = cap;
  for (int32_t i = 0; i < n; ++i) out[i] = f->events[i];
  f->events.erase(f->events.begin(), f->events.begin() + n);
  return n;
}

}  // extern "C"
