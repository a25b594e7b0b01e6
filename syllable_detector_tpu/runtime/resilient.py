"""Process-isolated streaming detection with automatic crash recovery.

This TPU runtime has a documented failure mode the reference never faced:
a transient device error (e.g. FAILED_PRECONDITION through the tunnel) can
POISON the whole process — every subsequent device call fails until the
process is replaced (CLAUDE.md, measured in round 2). The reference's
recovery story is "restart the app" (SURVEY §5); for a closed-loop
experiment that means losing the session.

:class:`ResilientDetector` keeps the device work in a CHILD process and
supervises it:

  * the child hosts a :class:`~syllable_detector_tpu.models.detector_bank.
    DetectorBank` (1..N lanes, distinct nets supported) and serves
    append/drain/warm_up requests over a pipe;
  * after every successful drain the child returns its post-drain state
    snapshot, which the parent retains;
  * audio appended since the last snapshot is journaled in the parent; if
    the child dies (crash, poisoned runtime, timeout), the parent spawns a
    FRESH process, restores the snapshot, replays the journal, and retries
    — the output stream continues exactly where it stopped (same
    exactly-once hop accounting as an uninterrupted detector).

The child is created with the ``spawn`` start method so it gets a fresh
XLA/TPU runtime — the entire point of the isolation. Spawn re-imports the
parent's ``__main__``, so construct ResilientDetector from an importable
script or module (standard multiprocessing caveat: a ``<stdin>``/REPL
``__main__`` cannot be re-imported by the child).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as queue_mod
from typing import Optional

import numpy as np

__all__ = ["ResilientDetector"]


def _child_main(conn, net_texts, method, platform):
    """Child process: build the bank, serve requests until EOF/stop."""
    try:
        if platform:
            import jax

            jax.config.update("jax_platforms", platform)
        from syllable_detector_tpu.config.model_format import loads_config
        from syllable_detector_tpu.models.detector_bank import DetectorBank

        cfgs = [loads_config(t) for t in net_texts]
        bank = DetectorBank(cfgs, method=method)
        conn.send(("ready", None))
        while True:
            try:
                msg = conn.recv()
            except EOFError:
                return
            op = msg[0]
            if op == "stop":
                conn.send(("ok", None))
                return
            if op == "append":
                _, lane, samples = msg
                bank.append_audio_data(lane, samples)
                conn.send(("ok", None))
            elif op == "drain":
                outs = bank.drain()
                conn.send(("ok", (outs, bank.get_state())))
            elif op == "warm_up":
                n = bank.warm_up(buckets=msg[1])
                conn.send(("ok", (n, bank.get_state())))
            elif op == "set_state":
                bank.set_state(msg[1])
                conn.send(("ok", None))
            elif op == "crash":  # test hook: simulate a poisoned process
                os._exit(17)
            else:
                conn.send(("error", f"unknown op {op!r}"))
    except Exception as e:  # surface construction/serve errors to the parent
        try:
            conn.send(("fatal", f"{type(e).__name__}: {e}"))
        except Exception:
            pass
        os._exit(1)


class ResilientDetector:
    """Supervised multi-lane streaming detector (crash-isolated device work).

    ``configs``: one or more SyllableDetectorConfig (distinct nets per lane
    like DetectorBank). ``platform=None`` pins the child to the parent's
    jax backend (tests run CPU; live TPU sessions spawn TPU children).
    ``timeout`` bounds each request; drains on a COLD TPU can hit a 5-10
    minute Mosaic compile, so either call :meth:`warm_up` first or keep the
    default generous.
    """

    def __init__(
        self,
        configs,
        method: str = "fused",
        max_restarts: int = 3,
        timeout: float = 900.0,
        platform: Optional[str] = None,
    ):
        from syllable_detector_tpu.config.model_format import dumps_config

        if not isinstance(configs, (list, tuple)):
            configs = [configs]
        self._net_texts = [dumps_config(c) for c in configs]
        self.n_lanes = len(configs)
        self.method = method
        self.max_restarts = max_restarts
        self.timeout = timeout
        if platform is None:
            # inherit an EXPLICITLY configured platform (tests force CPU
            # via jax.config.update("jax_platforms", "cpu")) — read from
            # the config, never via jax.default_backend(): that would
            # INITIALIZE a backend in the parent, and the TPU chip is
            # exclusive to one process, so a parent that claims it starves
            # every child of the device ("No jellyfish device found").
            # With no explicit config, the CHILD picks its own default and
            # owns the accelerator; the supervisor stays device-free.
            import sys as _sys

            jax_mod = _sys.modules.get("jax")
            if jax_mod is not None:
                platform = jax_mod.config.jax_platforms or None
        self._platform = platform
        self.restarts = 0
        self._snapshot = None  # last known-good post-drain state
        self._journal: list[tuple[int, np.ndarray]] = []  # appends since then
        self._ctx = mp.get_context("spawn")
        self._proc = None
        self._conn = None
        self._start_child()

    # -- supervision --------------------------------------------------------

    def _start_child(self) -> None:
        parent_conn, child_conn = self._ctx.Pipe()
        self._proc = self._ctx.Process(
            target=_child_main,
            args=(child_conn, self._net_texts, self.method, self._platform),
            daemon=True,
        )
        self._proc.start()
        child_conn.close()
        self._conn = parent_conn
        status, payload = self._recv()
        if status != "ready":
            raise RuntimeError(f"detector child failed to start: {payload}")
        if self._snapshot is not None:
            self._request(("set_state", self._snapshot))
        for lane, samples in self._journal:
            self._request(("append", lane, samples))

    def _recv(self):
        if not self._conn.poll(self.timeout):
            raise TimeoutError(f"detector child unresponsive for {self.timeout}s")
        return self._conn.recv()

    def _request(self, msg):
        self._conn.send(msg)
        status, payload = self._recv()
        if status == "fatal":
            raise RuntimeError(f"detector child failed: {payload}")
        if status == "error":
            raise RuntimeError(payload)
        return payload

    def _supervised(self, msg, covered_by_replay: bool = False):
        """Send a request, restarting the child (snapshot + journal replay)
        on crash/timeout, up to max_restarts times.

        ``covered_by_replay``: the message's effect is already in the
        journal, so after a restart (whose replay applied it) the message
        must NOT be re-sent — re-sending would apply it twice and break
        the exactly-once hop accounting.
        """
        attempts = 0
        while True:
            try:
                return self._request(msg)
            except (EOFError, OSError, BrokenPipeError, TimeoutError, RuntimeError):
                self._kill_child()
                self.restarts += 1
                attempts += 1
                if attempts > self.max_restarts:
                    raise
                self._start_child()
                if covered_by_replay:
                    return None

    def _kill_child(self) -> None:
        try:
            self._conn.close()
        except Exception:
            pass
        if self._proc is not None:
            self._proc.terminate()
            self._proc.join(timeout=5)
            self._proc = None

    # -- detector API --------------------------------------------------------

    def append_audio_data(self, samples: np.ndarray, lane: int = 0) -> None:
        samples = np.asarray(samples, np.float32).reshape(-1)
        # journal FIRST: if the child dies handling this append, the
        # restart's replay applies it — and covered_by_replay then skips
        # the resend (sending again would double-apply the chunk)
        self._journal.append((lane, samples))
        self._supervised(("append", lane, samples), covered_by_replay=True)

    def drain(self) -> np.ndarray:
        outs, state = self._supervised(("drain",))
        self._snapshot = state
        self._journal.clear()
        return outs

    def warm_up(self, buckets=None) -> int:
        from syllable_detector_tpu.models.detector import _FRAME_BUCKETS

        buckets = tuple(buckets) if buckets is not None else _FRAME_BUCKETS
        n, state = self._supervised(("warm_up", buckets))
        # the returned state already contains any journaled appends; keep
        # snapshot and journal consistent (journal entries kept alongside
        # a snapshot that includes them would double-apply after a crash)
        self._snapshot = state
        self._journal.clear()
        return n

    def crash_for_test(self) -> None:
        """Make the child die abruptly (simulates a poisoned runtime)."""
        try:
            self._conn.send(("crash",))
        except Exception:
            pass
        if self._proc is not None:
            self._proc.join(timeout=10)

    def close(self) -> None:
        try:
            if self._proc is not None and self._proc.is_alive():
                self._conn.send(("stop",))
                self._conn.poll(5)
        except Exception:
            pass
        self._kill_child()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
