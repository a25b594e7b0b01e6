"""Auto-tuner: measure kernel launch configs on the LOCAL device and
cache the winners per (device kind, network geometry, workload shape).

The measured tile defaults baked into the router are the sweeps' winners
on a v5e (CLAUDE.md/DESIGN.md) — but the best tile moved every time the
layout changed (512 -> 2048 single-stream, 512 -> 1024 for distinct nets
when the transposed output landed), and it will move again on other chip
generations. This module productizes those sweeps: ``python -m
syllable_detector_tpu tune -n net.txt`` re-measures the candidates on
whatever chip is attached and writes a JSON cache that
``fused_batch_offline_outputs`` consults before falling back to the baked
defaults. The reference has no analogue (fixed vDSP pipeline); this is
TPU-framework plumbing in the XLA-autotuning tradition.

COST WARNING (this runtime): each new kernel shape is a 5-10 min remote
Mosaic compile on first sight; the persistent XLA cache
(~/.cache/syllable_detector_tpu/xla) makes re-tunes cheap, but a cold
full sweep is an hours-scale job. ``--tiles`` bounds the candidate set.

Cache: ``~/.cache/syllable_detector_tpu/tune.json`` (override with
``SD_TUNE_CACHE``). Keys bucket channels and evals-per-channel to powers
of two so one tune covers the deployment's neighborhood.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

__all__ = [
    "Trial",
    "geometry_key",
    "tune_cache_path",
    "reset_tune_cache",
    "tuned_flat_tile",
    "tuned_single_tile",
    "tune_flat_batch",
    "tune_single",
    "main",
]


def geometry_key(spec) -> str:
    """Stable fingerprint of everything that shapes the kernel launch
    (NOT the weights — two nets with the same geometry share tuning)."""
    return "|".join(
        str(v)
        for v in (
            spec.window_length,
            spec.window_overlap,
            spec.fourier_length,
            spec.bins[0],
            spec.bins[1],
            spec.time_range,
            tuple(spec.net.layer_sizes),
            tuple(spec.net.transfers),  # in-kernel VPU work differs per transfer
            spec.scaling,
        )
    )


def tune_cache_path() -> str:
    return os.environ.get(
        "SD_TUNE_CACHE",
        os.path.expanduser("~/.cache/syllable_detector_tpu/tune.json"),
    )


_cache_mem: dict | None = None
_cache_mem_path: str | None = None


def _load_cache() -> dict:
    """Memoized cache load (the router consults this on every batched
    call; a JSON parse per drain would be measurable against the hop
    deadline)."""
    global _cache_mem, _cache_mem_path
    path = tune_cache_path()
    if _cache_mem is not None and _cache_mem_path == path:
        return _cache_mem
    try:
        with open(path) as fh:
            _cache_mem = json.load(fh)
    except (OSError, ValueError):
        _cache_mem = {}
    _cache_mem_path = path
    return _cache_mem


def reset_tune_cache() -> None:
    """Drop the in-process memo (tests; or after an external cache edit)."""
    global _cache_mem, _cache_mem_path
    _cache_mem = None
    _cache_mem_path = None


def _save_entry(key: str, entry: dict) -> None:
    path = tune_cache_path()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # read-modify-write under an flock so concurrent tune processes (e.g.
    # --workload batched and distinct side by side) don't lose each other's
    # entries; re-read from disk inside the lock (never the in-process memo,
    # which may predate another writer's entry)
    import fcntl

    with open(path + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            with open(path) as fh:
                cache = json.load(fh)
        except (OSError, ValueError):
            cache = {}
        cache[key] = entry
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(cache, fh, indent=1)
        os.replace(tmp, path)  # atomic: concurrent readers see a whole file
    reset_tune_cache()


_device_kind_mem: str | None = None


def _device_kind() -> str:
    global _device_kind_mem
    if _device_kind_mem is not None:
        return _device_kind_mem
    import jax

    try:
        d = jax.local_devices()[0]
        _device_kind_mem = f"{d.platform}:{getattr(d, 'device_kind', '?')}"
    except Exception:
        return "unknown"  # backend not ready: don't cache
    return _device_kind_mem


def _bucket(n: int) -> int:
    """Next power of two (>= 8): one tune entry covers the deployment's
    neighborhood instead of demanding exact-shape re-tunes."""
    b = 8
    while b < n:
        b *= 2
    return b


def _layout_rev() -> int:
    from syllable_detector_tpu.kernels.fused_detector import FLAT_LAYOUT_REV

    return FLAT_LAYOUT_REV


def _flat_key(spec, c: int, n_evals: int, distinct: bool,
              out_t: bool = True) -> str:
    # rev + output-layout variant are part of the key: a measured tile is
    # only valid for the physical layout it was measured against (r4:
    # out_t alone moved the distinct winner 512 -> 1024). A layout bump
    # orphans old entries — production falls back to the baked defaults
    # until a re-tune, never to a stale winner.
    return "/".join(
        (
            _device_kind(),
            f"rev{_layout_rev()}",
            geometry_key(spec),
            "distinct" if distinct else "shared",
            "outT" if out_t else "outN",
            f"c{_bucket(c)}",
            f"ne{_bucket(n_evals)}",
        )
    )


def _single_key(spec, out_t: bool = False) -> str:
    # single-stream fused kernel (fused_offline_outputs): no channel /
    # n_evals bucket — throughput is tile-dominated once evals >> tile
    return "/".join(
        (
            _device_kind(),
            f"rev{_layout_rev()}",
            geometry_key(spec),
            "single",
            "outT" if out_t else "outN",
        )
    )


def tuned_flat_tile(spec, c: int, n_evals: int, distinct: bool,
                    out_t: bool = True) -> int | None:
    """The cached winning tile for this (device, geometry, workload,
    kernel-layout) bucket, or None (caller falls back to the baked
    default). Consulted by ``fused_batch_offline_outputs`` on every
    auto-tiled call."""
    entry = _load_cache().get(_flat_key(spec, c, n_evals, distinct, out_t))
    if not entry:
        return None
    tile = int(entry.get("tile", 0))
    return tile if tile >= 8 and tile % 8 == 0 else None


def tuned_single_tile(spec) -> int | None:
    """The cached winning tile for the single-stream fused kernel on this
    device (``tune_single`` persists it), or None — callers fall back to
    the measured v5e default (2048, CLAUDE.md r2 sweep)."""
    entry = _load_cache().get(_single_key(spec))
    if not entry:
        return None
    tile = int(entry.get("tile", 0))
    return tile if tile >= 8 and tile % 8 == 0 else None


@dataclass
class Trial:
    tile: int
    windows_per_s: float
    hops_per_row: int = 1


def _measure_flat(spec, params, c, n_evals, tile, hops_per_row):
    """One real measurement: windows/s of the flat batched kernel at this
    config (pre-slabbed zero-copy input, scan-slope timing)."""
    import jax
    import jax.numpy as jnp

    from syllable_detector_tpu.kernels.fused_detector import (
        flat_batch_input_samples,
        fused_flat_batch_offline_outputs,
    )
    from syllable_detector_tpu.utils.measure import make_audio, time_scanned

    distinct = isinstance(params, (list, tuple))
    per_ch, total = flat_batch_input_samples(
        spec, n_evals, c, tile=tile, distinct=distinct,
        hops_per_row=hops_per_row,
    )
    base = make_audio(per_ch)
    flat = np.zeros(total, np.float32)
    for ch in range(c):
        flat[ch * per_ch : (ch + 1) * per_ch] = np.roll(base, 13 * ch)
    xs = jax.device_put(
        jnp.asarray(flat.reshape(-1, spec.hop * hops_per_row)),
        jax.local_devices()[0],
    )

    def make_fn():
        def fn(x, carry):
            outs = fused_flat_batch_offline_outputs(
                spec, params, x, tile=tile, n_evals=n_evals, channels=c,
                hops_per_row=hops_per_row,
            )
            return outs[-1, -1, 0] + carry

        return fn

    return c * n_evals / time_scanned(make_fn, xs)


def tune_flat_batch(
    spec,
    params,
    c: int,
    n_evals: int,
    tiles: tuple = (512, 1024, 2048),
    measure=None,
    log=None,
) -> list[Trial]:
    """Measure the flat batched kernel at each admissible tile; persist
    the winner for :func:`tuned_flat_tile`. ``params`` a list = distinct
    nets. ``measure(tile, hops)`` overrides the real measurement (tests).
    Returns trials sorted best-first (empty if nothing was admissible)."""
    from syllable_detector_tpu.kernels.fused_detector import flat_admission

    distinct = isinstance(params, (list, tuple))
    trials = []
    for tile in tiles:
        if tile % 8:
            if log:
                log(f"tile {tile}: not a multiple of 8 — skipped")
            continue
        lay, hops = flat_admission(spec, n_evals, c, tile, distinct)
        if lay != "flat":
            if log:
                log(f"tile {tile}: over HBM budget even at k=8 — skipped")
            continue
        if measure is not None:
            wps = measure(tile, hops)
        else:
            wps = _measure_flat(spec, params, c, n_evals, tile, hops)
        trials.append(Trial(tile=tile, windows_per_s=wps, hops_per_row=hops))
        if log:
            log(f"tile {tile} (k={hops}): {wps:,.0f} windows/s")
    trials.sort(key=lambda t: -t.windows_per_s)
    if trials:
        _save_entry(
            _flat_key(spec, c, n_evals, distinct),
            {
                "tile": trials[0].tile,
                "hops_per_row": trials[0].hops_per_row,
                "windows_per_s": trials[0].windows_per_s,
                "trials": [
                    [t.tile, t.hops_per_row, t.windows_per_s] for t in trials
                ],
            },
        )
    return trials


def tune_single(
    spec,
    params,
    n_evals: int = 1 << 15,
    tiles: tuple = (512, 1024, 2048, 4096),
    measure=None,
    log=None,
) -> list[Trial]:
    """Measure the single-stream fused kernel at each tile and persist
    the winner for :func:`tuned_single_tile` (consulted by the driver
    entry point and available to single-stream callers). Returns trials
    sorted best-first."""
    import jax
    import jax.numpy as jnp

    from syllable_detector_tpu.kernels.fused_detector import (
        fused_input_samples,
        fused_offline_outputs,
    )
    from syllable_detector_tpu.utils.measure import make_audio, time_scanned

    trials = []
    for tile in tiles:
        if tile % 8:
            if log:
                log(f"tile {tile}: not a multiple of 8 — skipped")
            continue
        if measure is not None:
            wps = measure(tile, 1)
        else:
            n = fused_input_samples(spec, n_evals, tile=tile)
            x = jax.device_put(
                jnp.asarray(make_audio(n).reshape(-1, spec.hop)),
                jax.local_devices()[0],
            )

            def make_fn(tile=tile):
                def fn(x, carry):
                    outs = fused_offline_outputs(
                        spec, params, x, tile=tile, input_mode="raw",
                        n_evals=n_evals,
                    )
                    return outs[-1, 0] + carry

                return fn

            wps = n_evals / time_scanned(make_fn, x)
        trials.append(Trial(tile=tile, windows_per_s=wps))
        if log:
            log(f"tile {tile}: {wps:,.0f} windows/s")
    trials.sort(key=lambda t: -t.windows_per_s)
    if trials:
        _save_entry(
            _single_key(spec),
            {
                "tile": trials[0].tile,
                "windows_per_s": trials[0].windows_per_s,
                "trials": [[t.tile, 1, t.windows_per_s] for t in trials],
            },
        )
    return trials


def main(argv=None) -> int:
    import argparse
    import sys

    from syllable_detector_tpu.config.model_format import load_config
    from syllable_detector_tpu.models.detector import (
        detector_spec_from_config,
    )
    from syllable_detector_tpu.utils.measure import perturbed_params

    p = argparse.ArgumentParser(
        prog="syllable_detector_tpu tune",
        description="Measure kernel configs on the local device and cache "
        "the winners (consulted automatically by batched detection).",
    )
    p.add_argument("-n", "--network", required=True, help="network text file")
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--n-evals", type=int, default=2048,
                   help="evaluations per channel per call")
    p.add_argument("--tiles", type=int, nargs="+",
                   default=[512, 1024, 2048])
    p.add_argument("--workload", choices=["batched", "distinct", "single",
                                          "all"], default="batched")
    p.add_argument("--distinct-seed", type=int, default=1)
    args = p.parse_args(argv)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    spec, params = detector_spec_from_config(load_config(args.network))
    log(f"device {_device_kind()}; cache {tune_cache_path()}")
    log("note: each UNSEEN kernel shape is a minutes-scale remote compile "
        "on this runtime; re-tunes hit the persistent XLA cache")

    rows = []
    if args.workload in ("batched", "all"):
        log(f"-- flat batched, shared net, c={args.channels}, "
            f"ne={args.n_evals}")
        ts = tune_flat_batch(spec, params, args.channels, args.n_evals,
                             tiles=tuple(args.tiles), log=log)
        rows += [("batched", t) for t in ts[:1]]
    if args.workload in ("distinct", "all"):
        log(f"-- flat batched, DISTINCT nets, c={args.channels}, "
            f"ne={args.n_evals}")
        plist = [
            perturbed_params(params, args.distinct_seed + i)
            for i in range(args.channels)
        ]
        ts = tune_flat_batch(spec, plist, args.channels, args.n_evals,
                             tiles=tuple(args.tiles), log=log)
        rows += [("distinct", t) for t in ts[:1]]
    if args.workload in ("single", "all"):
        log("-- single stream")
        ts = tune_single(spec, params, tiles=tuple(args.tiles), log=log)
        rows += [("single", t) for t in ts[:1]]

    if not rows:
        log("error: no admissible tile was measured (every candidate was "
            "skipped — check --tiles are multiples of 8 and the workload "
            "fits HBM); nothing was cached")
        return 1
    for name, t in rows:
        print(
            f"{name}: tile {t.tile} (k={t.hops_per_row}) "
            f"{t.windows_per_s:,.0f} windows/s"
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
