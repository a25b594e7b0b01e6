"""Headline benchmark: fused STFT+MLP detection throughput (windows/sec/chip).

Runs the flagship fused Pallas detector (sample.txt network: 256-pt hamming
band DFT -> 29 bins x 10-frame sliding features -> l2norm+mapminmax ->
290x4 tansig -> 4x1 purelin -> mapminmax reverse) over a long audio stream
and reports steady-state windows (hops) per second per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s", "vs_baseline": N}

vs_baseline is against the 1e7 windows/s/chip north-star target
(BASELINE.md; the reference publishes no numbers — its implied floor is
1 channel x 44.1 kHz real time ~= 334 windows/s).
"""

import json
import os
import sys
import time

# persistent compile cache (cold TPU compiles are minutes over the tunnel)
os.makedirs(os.path.expanduser("~/.cache/syllable_detector_tpu/xla"), exist_ok=True)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/syllable_detector_tpu/xla"),
)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.kernels.fused_detector import fused_offline_outputs
from syllable_detector_tpu.models.detector import (
    detector_spec_from_config,
    offline_outputs,
)

NORTH_STAR = 1e7  # windows/s/chip (BASELINE.md)
SAMPLE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sample_net.txt")
REFERENCE_SAMPLE = "/root/reference/sample.txt"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_audio(n, rate=44100.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    phase = 2 * np.pi * np.cumsum(np.linspace(2000.0, 7000.0, n)) / rate
    x = 0.5 * np.sin(phase) + 0.02 * rng.standard_normal(n)
    return (x * (0.3 + 0.7 * (np.sin(2 * np.pi * 3.0 * t) > 0))).astype(np.float32)


def time_scanned(make_fn, x, k_small=2, k_big=12, trials=3):
    """Device-seconds per iteration of ``fn``, measured robustly.

    Host-side loop timing is untrustworthy here: the runtime pipelines,
    elides, or defers executions in ways that report fantasy throughput.
    Instead each *single* dispatch runs K data-dependent iterations inside a
    lax.scan (every iteration's output feeds the next carry, so nothing can
    be dropped), and the per-iteration time is the slope between two K
    values — subtracting dispatch/transfer cost exactly.
    """

    def scanned(k):
        fn = make_fn()

        @jax.jit
        def run(x):
            def body(carry, _):
                out = fn(x, carry)
                return out, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c

        return run

    run_small, run_big = scanned(k_small), scanned(k_big)
    jax.block_until_ready(run_small(x))  # compile
    jax.block_until_ready(run_big(x))

    def best(run):
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_small, t_big = best(run_small), best(run_big)
    return max(t_big - t_small, 1e-9) / (k_big - k_small)


def channel_sweep(spec, params, dev):
    """Optional (--sweep): many-channel batched throughput via the vmapped
    fused kernel — the 1024+-concurrent-detectors deployment shape. Each
    channel count is a fresh kernel compile (minutes over a dev tunnel), so
    this is not part of the default run."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )

    n_evals = 1 << 11  # per channel
    hop = spec.hop
    n = (n_evals + spec.time_range - 2) * hop + spec.window_length + hop
    for c in (8, 64, 256, 1024):
        xs = jax.device_put(
            jnp.asarray(
                np.random.default_rng(0)
                .standard_normal((c, n))
                .astype(np.float32)
            ),
            dev,
        )

        def make_fn(xs=xs):
            def fn(x_unused, carry):
                outs = fused_batch_offline_outputs(spec, params, xs + carry * 0.0)
                return outs[-1, -1, 0] + carry

            return fn

        try:
            dt = time_scanned(make_fn, xs)
            total = c * n_evals
            log(
                f"sweep c={c:5d}: {dt*1e3:8.2f} ms/iter -> "
                f"{total/dt:,.0f} windows/s ({total/dt/44100*132:,.0f} "
                f"realtime channels)"
            )
        except Exception as e:
            log(f"sweep c={c} failed: {type(e).__name__}: {str(e)[:120]}")


def main():
    sample_path = SAMPLE if os.path.exists(SAMPLE) else REFERENCE_SAMPLE
    cfg = load_config(sample_path)
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    on_tpu = dev.platform != "cpu"
    # windows per call: big enough to amortize dispatch, small enough that a
    # cold compile over the tunnel stays in the driver's budget
    n_evals = 1 << 17 if on_tpu else 1 << 13
    hop = spec.hop
    n_samples = (n_evals + spec.time_range - 1 - 1) * hop + spec.window_length + hop
    log(f"generating {n_samples} samples (~{n_samples/44100:.0f}s of audio), "
        f"{n_evals} windows/call")
    x = jnp.asarray(make_audio(n_samples))
    x = jax.device_put(x, dev)

    tile = 512 if on_tpu else 256

    wps_fused = 0.0
    try:
        def make_fused():
            def fn(x, carry):
                out = fused_offline_outputs(
                    spec, params, x + carry * 0.0, tile=tile, input_mode="raw"
                )
                return out[-1, 0] + carry

            return fn

        dt_fused = time_scanned(make_fused, x)
        wps_fused = n_evals / dt_fused
        log(f"fused:   {dt_fused*1e3:8.2f} ms/iter -> {wps_fused:,.0f} windows/s")
    except Exception as e:  # pragma: no cover - fall back to unfused number
        log(f"fused kernel failed: {type(e).__name__}: {str(e)[:200]}")

    if on_tpu and wps_fused:
        try:
            def make_fast():
                def fn(x, carry):
                    out = fused_offline_outputs(
                        spec, params, x + carry * 0.0, tile=tile,
                        input_mode="raw", fast=True,
                    )
                    return out[-1, 0] + carry

                return fn

            dt_fast = time_scanned(make_fast, x)
            log(
                f"fused bf16 fast path: {dt_fast*1e3:8.2f} ms/iter -> "
                f"{n_evals/dt_fast:,.0f} windows/s (~1e-2 rel err; "
                f"diagnostic only, not the headline)"
            )
        except Exception as e:  # pragma: no cover
            log(f"fast path failed: {type(e).__name__}: {str(e)[:150]}")

    try:
        def make_unfused():
            def fn(x, carry):
                out = offline_outputs(spec, params, x + carry * 0.0)
                return out[-1, 0] + carry

            return fn

        dt_unfused = time_scanned(make_unfused, x)
        wps_unfused = n_evals / dt_unfused
        speedup = f" (fused speedup {wps_fused/wps_unfused:.2f}x)" if wps_fused else ""
        log(f"unfused: {dt_unfused*1e3:8.2f} ms/iter -> "
            f"{wps_unfused:,.0f} windows/s{speedup}")
    except Exception as e:  # pragma: no cover
        log(f"unfused baseline failed: {e}")
        wps_unfused = 0.0

    # secondary diagnostic: per-hop streaming latency, 256 channels, 1 hop per
    # step (the real-time closed-loop path; deadline = hop/fs ~= 3 ms)
    try:
        from syllable_detector_tpu.models.detector import (
            streaming_init,
            streaming_step,
        )
        from syllable_detector_tpu.models.neural_net import stack_params

        c = 256 if on_tpu else 8
        stacked = jax.device_put(stack_params([params] * c), dev)
        carry0 = streaming_init(spec)
        carries = jax.tree.map(lambda a: jnp.stack([a] * c), carry0)
        carries = jax.device_put(carries, dev)
        chunk = jnp.zeros((c, hop), jnp.float32)

        @jax.jit
        def stream_step(carries, chunk):
            return jax.vmap(lambda p, cr, ch: streaming_step(spec, p, cr, ch))(
                stacked, carries, chunk
            )

        carries, outs = stream_step(carries, chunk)
        jax.block_until_ready(outs)
        lat = []
        for _ in range(100):
            t0 = time.perf_counter()
            carries, outs = stream_step(carries, chunk)  # carry chains calls
            jax.block_until_ready(outs)
            lat.append(time.perf_counter() - t0)
        lat_ms = np.asarray(lat) * 1e3

        # round-trip floor: a trivial synchronous call through the same
        # dispatch path, to separate host<->device transport latency from the
        # detection math (a tunneled dev chip adds tens of ms that a locally
        # attached chip does not)
        tiny = jax.jit(lambda v: v + 1.0)
        v = jnp.float32(0)
        v = tiny(v)
        jax.block_until_ready(v)
        floor = []
        for _ in range(50):
            t0 = time.perf_counter()
            v = tiny(v)
            jax.block_until_ready(v)
            floor.append(time.perf_counter() - t0)
        floor_ms = float(np.percentile(np.asarray(floor) * 1e3, 50))

        p50 = float(np.percentile(lat_ms, 50))
        log(
            f"streaming per-hop latency ({c} ch): p50 {p50:.3f} ms, "
            f"p99 {np.percentile(lat_ms,99):.3f} ms; dispatch RTT floor "
            f"{floor_ms:.3f} ms -> device-side ~{max(p50-floor_ms,0):.3f} ms "
            f"(deadline {hop/44100*1e3:.2f} ms)"
        )
    except Exception as e:  # pragma: no cover
        log(f"streaming latency measurement failed: {type(e).__name__}: {str(e)[:150]}")

    if "--sweep" in sys.argv and on_tpu:
        channel_sweep(spec, params, dev)

    value = max(wps_fused, wps_unfused)
    print(
        json.dumps(
            {
                "metric": "fused_stft_mlp_detection_throughput_per_chip",
                "value": round(value, 1),
                "unit": "windows/s",
                "vs_baseline": round(value / NORTH_STAR, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
