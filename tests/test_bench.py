"""bench.py contract tests: the fresh-process retry shell.

The driver invokes bench.py exactly once per round; a transient TPU
backend failure (init UNAVAILABLE / mid-run FAILED_PRECONDITION) poisons
the whole process, so main() must retry in brand-new interpreters while
preserving the one-JSON-line stdout contract. The measurement itself runs
on hardware (not testable here); these tests pin the wrapper logic.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class _Result:
    def __init__(self, rc):
        self.returncode = rc


def _run_wrapper(monkeypatch, returncodes, probes=None):
    """Drive bench.main() with a stubbed subprocess.run; returns the calls
    (cmd, env-flag, timeout) and the wrapper's exit code (None = clean).
    ``probes``: sequence of _tpu_reachable results between attempts
    (default: always reachable — plain transient-failure retries)."""
    calls = []
    seq = list(returncodes)

    def fake_run(cmd, env=None, timeout=None):
        calls.append((list(cmd), env.get("SD_BENCH_CHILD"), timeout))
        rc = seq.pop(0)
        if rc == "timeout":
            raise subprocess.TimeoutExpired(cmd, timeout)
        return _Result(rc)

    probe_seq = list(probes) if probes is not None else None

    def fake_probe(**kw):
        if probe_seq is None:
            return True
        return probe_seq.pop(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_tpu_reachable", fake_probe)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    monkeypatch.delenv("SD_BENCH_CHILD", raising=False)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    exit_code = None
    try:
        bench.main()
    except SystemExit as e:
        exit_code = e.code
    return calls, exit_code


def test_bench_retries_fresh_processes(monkeypatch):
    calls, exit_code = _run_wrapper(monkeypatch, [1, 1, 0])
    assert exit_code is None  # clean return after the third child succeeds
    assert len(calls) == 3
    # every attempt is a NEW interpreter flagged as the measurement child
    for cmd, child_flag, timeout in calls:
        assert cmd[0] == sys.executable
        assert cmd[1].endswith("bench.py")
        assert child_flag == "1"
        assert timeout == 2400


def test_bench_first_success_runs_once(monkeypatch):
    calls, exit_code = _run_wrapper(monkeypatch, [0])
    assert exit_code is None
    assert len(calls) == 1


def test_bench_exhausted_retries_propagate_failure(monkeypatch):
    calls, exit_code = _run_wrapper(monkeypatch, [1, "timeout", 7])
    assert len(calls) == 3
    assert exit_code == 7  # last child's exit code surfaces to the driver


def test_bench_child_env_skips_wrapper(monkeypatch):
    """SD_BENCH_CHILD=1 must route straight to the measurement (no
    recursive subprocess spawning)."""
    monkeypatch.setenv("SD_BENCH_CHILD", "1")

    def boom(*a, **kw):  # any subprocess call would be the recursion bug
        raise AssertionError("child must not spawn another child")

    monkeypatch.setattr(subprocess, "run", boom)
    ran = []
    monkeypatch.setattr(bench, "_bench", lambda: ran.append(True))
    bench.main()
    assert ran == [True]


def test_bench_deterministic_failure_skips_retries(monkeypatch):
    """Exit 3 (parity assertion in the child) is deterministic — the
    wrapper must surface it immediately instead of re-paying the full
    measurement twice."""
    calls, exit_code = _run_wrapper(monkeypatch, [3, 0, 0])
    assert len(calls) == 1
    assert exit_code == 3


def test_bench_waits_out_tunnel_outage(monkeypatch):
    """A multi-hour tunnel outage (r4: 3.5 h+) must be waited out with
    cheap probes between attempts, not burned as 40-min child attempts:
    after a failed attempt, unreachable probes delay the next attempt
    until one succeeds."""
    # attempt 1 fails; probes: down, down, up; attempt 2 succeeds
    calls, exit_code = _run_wrapper(
        monkeypatch, [1, 0], probes=[False, False, True]
    )
    assert exit_code is None
    assert len(calls) == 2  # no child launched while the link was down


def test_bench_outage_wait_budget_exhausted(monkeypatch):
    """With the wait budget exhausted and the link still down, the wrapper
    gives up with the last child's exit code instead of hanging further
    40-min attempts on a dead tunnel."""
    monkeypatch.setenv("SD_BENCH_MAX_WAIT_S", "0")
    calls, exit_code = _run_wrapper(monkeypatch, [1, 0, 0], probes=[False])
    assert len(calls) == 1  # no second attempt on a dead link
    assert exit_code == 1
