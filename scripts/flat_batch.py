"""Experiment: shared-net batched detection through the SINGLE-STREAM
kernel over flat concatenated channel slabs (no channel grid dimension).

Theory: the batched (c, grid) kernel plateaus ~50-70M windows/s while the
single-stream kernel does ~104M — suspect per-program overhead of the
extra grid dimension. A shared net needs NO channel indexing, so channels
can concatenate as rows of ONE flat slab; each channel's valid evals live
at rows [ch*R, ch*R + n_evals) (R = per-channel slab rows), and the evals
near each channel tail that read the next channel's head rows are exactly
the rows sliced away. Waste ~ (R - n_evals)/R ~= 1-2%.

Usage:
  python scripts/flat_batch.py --check        (CPU interpret parity)
  python scripts/flat_batch.py --hw [--c 64] (hardware A/B vs batched)
"""

import os
import sys

os.makedirs(os.path.expanduser("~/.cache/syllable_detector_tpu/xla"), exist_ok=True)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/syllable_detector_tpu/xla"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flat_batch_offline_outputs(
    spec, params, xs, tile=512, n_evals=None, interpret=None
):
    """[C, n] shared-net streams -> [C, E, outputs] via the single-stream
    kernel over one flat slab (shared nets only)."""
    import jax
    import jax.numpy as jnp

    from syllable_detector_tpu.kernels.fused_detector import (
        _folded,
        _fused_call,
        _raw_geometry,
        _round_up,
    )
    from syllable_detector_tpu.ops.stft import num_frames

    if interpret is None:
        interpret = jax.local_devices()[0].platform == "cpu"
    operands, meta = _folded(spec, params)

    c, n = xs.shape
    f = num_frames(n, spec.window_length, spec.window_overlap)
    max_evals = f - spec.time_range + 1
    if n_evals is None:
        n_evals = max_evals
    grid = max(1, -(-n_evals // tile))
    _, hop, hop_pad, _, _, rows2d, _ = _raw_geometry(spec, tile)
    R = (grid - 1) * tile + rows2d  # per-channel slab rows
    total = R * hop
    xs = jnp.asarray(xs, jnp.float32)
    if total > n:
        xs = jnp.concatenate(
            [xs, jnp.zeros((c, total - n), jnp.float32)], axis=1
        )
    data = xs[:, :total].reshape(c * R, hop)

    grid_total = -(-(c * R) // tile)
    need_rows = (grid_total - 1) * tile + rows2d
    if need_rows > c * R:
        data = jnp.concatenate(
            [data, jnp.zeros((need_rows - c * R, hop), jnp.float32)]
        )
    from syllable_detector_tpu.kernels.fused_detector import (
        _pipelined_geometry,
    )

    if _pipelined_geometry(spec, tile) is None and hop_pad != hop:
        data = jnp.pad(data, ((0, 0), (0, hop_pad - hop)))

    out = _fused_call(
        spec, meta, data, operands, grid_total, grid_total * tile, tile,
        interpret, "raw",
    )  # [grid_total*tile, outputs]

    starts = jnp.arange(c, dtype=jnp.int32) * R
    gather = jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            out, (s, 0), (n_evals, out.shape[1])
        )
    )
    return gather(starts)


def main():
    import jax
    import jax.numpy as jnp

    from bench import log, make_audio, time_scanned
    from syllable_detector_tpu.config.model_format import load_config
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )
    from syllable_detector_tpu.models.detector import detector_spec_from_config

    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)

    if "--check" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        rng = np.random.default_rng(0)
        c, n = 3, 30000
        xs = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32) * 0.3)
        got = np.asarray(
            flat_batch_offline_outputs(spec, params, xs, tile=64)
        )
        want = np.asarray(
            fused_batch_offline_outputs(spec, params, xs, tile=64, interpret=True)
        )
        err = np.abs(got - want).max()
        log(f"flat vs batched (interpret): max abs err {err:.2e} {got.shape}")
        assert err < 1e-4, err
        log("CHECK OK")
        return

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    c = 64
    if "--c" in sys.argv:
        c = int(sys.argv[sys.argv.index("--c") + 1])
    n_evals = 1 << 11
    for tile in (512, 2048):
        from syllable_detector_tpu.kernels.fused_detector import (
            _raw_geometry,
        )

        grid = max(1, -(-n_evals // tile))
        _, hop, _, _, _, rows2d, _ = _raw_geometry(spec, tile)
        R = (grid - 1) * tile + rows2d
        n = R * hop
        xs = jax.device_put(
            jnp.asarray(
                np.stack(
                    [np.roll(make_audio(n), 13 * i) for i in range(c)]
                )
            ),
            dev,
        )

        # parity on hardware first
        got = np.asarray(
            flat_batch_offline_outputs(spec, params, xs, tile=tile, n_evals=256)
        )
        want = np.asarray(
            fused_batch_offline_outputs(spec, params, xs, tile=512, n_evals=256)
        )
        err = np.abs(got - want).max()
        log(f"tile {tile}: hw parity flat-vs-batched max abs err {err:.2e}")

        def make_fn(tile=tile):
            def fn(x, carry):
                outs = flat_batch_offline_outputs(
                    spec, params, x, tile=tile, n_evals=n_evals
                )
                return outs[-1, -1, 0] + carry

            return fn

        dt = time_scanned(make_fn, xs)
        total_w = c * n_evals
        log(
            f"FLAT tile {tile} c={c}: {dt*1e3:8.2f} ms/iter -> "
            f"{total_w/dt:,.0f} windows/s"
        )

    def make_batched():
        def fn(x, carry):
            outs = fused_batch_offline_outputs(
                spec, params, x, tile=512, n_evals=n_evals, slab_channels=64
            )
            return outs[-1, -1, 0] + carry

        return fn

    dt = time_scanned(make_batched, xs)
    log(
        f"BATCHED (c,grid) tile 512 c={c}: {dt*1e3:8.2f} ms/iter -> "
        f"{c*n_evals/dt:,.0f} windows/s"
    )


def iso():
    """Isolate WHERE the flat-batch throughput goes at tile 2048:
    A) headline single-stream (same total windows) — the ~104M reference
    B) flat-batch from a 1-D input (in-fn 2-D view), with the gather
    C) same but consuming the raw kernel output (no per-channel gather)
    """
    import jax
    import jax.numpy as jnp

    from bench import log, make_audio, time_scanned
    from syllable_detector_tpu.config.model_format import load_config
    from syllable_detector_tpu.kernels.fused_detector import (
        _folded,
        _fused_call,
        _raw_geometry,
        fused_input_samples,
        fused_offline_outputs,
    )
    from syllable_detector_tpu.models.detector import detector_spec_from_config

    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev}")
    tile = 2048
    c = 64
    n_evals = 1 << 11  # per channel; c*n_evals = 131072 = headline's count

    # A) headline single-stream
    nA = fused_input_samples(spec, c * n_evals, tile=tile)
    xA = jax.device_put(jnp.asarray(make_audio(nA)), dev)

    def make_A():
        def fn(x, carry):
            out = fused_offline_outputs(
                spec, params, x, tile=tile, n_evals=c * n_evals
            )
            return out[-1, 0] + carry

        return fn

    dt = time_scanned(make_A, xA)
    log(f"A single-stream 131072 evals: {dt*1e3:8.2f} ms/iter -> "
        f"{c*n_evals/dt:,.0f} windows/s")

    # B/C) flat-batch from a 1-D input
    operands, meta = _folded(spec, params)
    grid = max(1, -(-n_evals // tile))
    _, hop, _, _, _, rows2d, _ = _raw_geometry(spec, tile)
    R = (grid - 1) * tile + rows2d
    grid_total = -(-(c * R) // tile)
    need_rows = (grid_total - 1) * tile + rows2d
    xB = jax.device_put(jnp.asarray(make_audio(need_rows * hop)), dev)

    def run_flat(x, do_gather):
        data = x.reshape(need_rows, hop)
        out = _fused_call(
            spec, meta, data, operands, grid_total, grid_total * tile,
            tile, False, "raw",
        )
        if not do_gather:
            return out
        starts = jnp.arange(c, dtype=jnp.int32) * R
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(out, (s, 0), (n_evals, out.shape[1]))
        )(starts)

    def make_B():
        def fn(x, carry):
            return run_flat(x, True)[-1, -1, 0] + carry

        return fn

    def make_C():
        def fn(x, carry):
            return run_flat(x, False)[-1, 0] + carry

        return fn

    for name, mk in (("B flat+gather", make_B), ("C flat raw", make_C)):
        dt = time_scanned(mk, xB)
        log(f"{name}: {dt*1e3:8.2f} ms/iter -> "
            f"{c*n_evals/dt:,.0f} windows/s")


if __name__ == "__main__":
    if "--iso" in sys.argv:
        iso()
    else:
        main()
