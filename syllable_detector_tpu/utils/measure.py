"""Device-throughput measurement primitives (the scan-slope method).

Shared by the repo-root ``bench.py`` driver harness, the hardware A/B
scripts, and :mod:`syllable_detector_tpu.tuning` — one implementation so
the timing method (and its hard-won traps) cannot drift between them.

Why scan-slope: on this runtime a host-side timing loop is untrustworthy —
executions pipeline, elide, or get served from a repeat-execution cache,
reporting fantasy throughput (an 8e9 windows/s "measurement" and a 67 MB
op at 5 TB/s were both observed). The only robust method found: run K
data-dependent iterations inside ONE ``lax.scan`` dispatch and take the
slope between two K values — dispatch and transfer costs cancel exactly.
See DESIGN.md "Measurement methodology".
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_audio", "perturbed_params", "time_scanned"]


def make_audio(n, rate=44100.0, seed=0):
    """Deterministic syllable-like test signal: a 2-7 kHz chirp with an
    on/off amplitude gate plus noise (keeps detector outputs in a lively
    range instead of the all-silence floor)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    phase = 2 * np.pi * np.cumsum(np.linspace(2000.0, 7000.0, n)) / rate
    x = 0.5 * np.sin(phase) + 0.02 * rng.standard_normal(n)
    return (x * (0.3 + 0.7 * (np.sin(2 * np.pi * 3.0 * t) > 0))).astype(
        np.float32
    )


def perturbed_params(params, seed, scale=0.05):
    """A genuinely distinct network with the same geometry (for the
    per-channel-distinct-nets deployment measurements). Stays HOST-side
    numpy: fold_constants consumes numpy anyway, and a jnp leaf here costs
    a tunnel round-trip per array — 1024 nets x 8 leaves serialized
    through a ~30 ms RTT made a c=1024 setup take 10+ minutes."""
    r = np.random.default_rng(seed)
    return jax.tree.map(
        lambda a: np.asarray(
            np.asarray(a)
            * (1.0 + scale * r.standard_normal(np.asarray(a).shape)),
            dtype=np.asarray(a).dtype,
        ),
        params,
    )


def time_scanned(make_fn, x, k_small=2, k_big=12, trials=3):
    """Device-seconds per iteration of ``fn``, measured robustly.

    Each *single* dispatch runs K data-dependent iterations inside a
    lax.scan (every iteration's output feeds the next carry, so nothing
    can be dropped), and the per-iteration time is the slope between two
    K values — subtracting dispatch/transfer cost exactly. The seed carry
    chains from call to call so no two timed executions see identical
    inputs (identical re-executions can be served from a runtime cache
    and time as pure RTT). ``make_fn()`` returns ``fn(x, carry) ->
    scalar``; closing device arrays into ``fn`` is forbidden (they embed
    as HLO literals and can blow the remote compiler's request limit) —
    everything sized rides through ``x``.

    Per-iteration times under ~1 ms are noise-dominated by the ~30 ms
    tunnel RTT even with this method; trust only >= 1 ms/iter numbers.
    """

    def scanned(k):
        fn = make_fn()

        @jax.jit
        def run(x, c0):
            # x rides in the scan CARRY and each iteration rewrites one
            # element with a value depending on the previous output: the
            # iterations serialize (no hoisting/elision) but the carried
            # buffer is aliased in place — unlike `x + carry*0`, which
            # copied the whole input every iteration (~6% artifact).
            def body(state, _):
                x, c = state
                out = fn(x, c)
                x = jax.lax.dynamic_update_slice(
                    x, x[:1] + 0.0 * out, (0,) * x.ndim
                )
                return (x, out), None

            (_, c), _ = jax.lax.scan(body, (x, c0), None, length=k)
            return c

        return run

    run_small, run_big = scanned(k_small), scanned(k_big)
    c = jnp.float32(0)
    c = run_small(x, c)
    jax.block_until_ready(c)  # compile
    c = run_big(x, c)
    jax.block_until_ready(c)

    def best(run, c):
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            c = run(x, c)  # carry chains calls
            jax.block_until_ready(c)
            times.append(time.perf_counter() - t0)
        return min(times), c

    t_small, c = best(run_small, c)
    t_big, c = best(run_big, c)
    return max(t_big - t_small, 1e-9) / (k_big - k_small)
