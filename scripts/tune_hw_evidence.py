"""Bounded auto-tuner run on the real chip (r4 verdict item 2).

The tuner (`syllable_detector_tpu/tuning.py`) routes production launches
(fused_batch_offline_outputs / mesh / entry() consult the cache), but
until r5 it had never executed on real hardware. This runs one bounded
tune per workload over the standard tile ladder, records the winners to
scripts/tune_results.jsonl, and compares them against the baked defaults
(the hand-measured r2-r4 sweep winners) so a cache hit is trustworthy.

Warm-shape note: tiles 512/1024/2048 on the sample geometry are the
shapes every previous round's bench/sweeps compiled; with the persistent
XLA cache they re-measure in seconds each. An UNSEEN shape is a
minutes-scale remote Mosaic compile — keep --tiles within the ladder.

Run: python scripts/tune_hw_evidence.py [--workloads single,batched,distinct]
"""

import argparse
import json
import os
import sys
import time

os.makedirs(os.path.expanduser("~/.cache/syllable_detector_tpu/xla"), exist_ok=True)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/syllable_detector_tpu/xla"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# the baked defaults the tuner falls back to without a cache entry
# (kernels/fused_detector.py routing + __graft_entry__): measured winners
# from the r2 single-stream sweep (tile 2048) and the r4 out_t flat
# re-sweeps (shared 512-2048 within noise; distinct 1024)
BAKED = {"single": 2048, "batched": 512, "distinct": 1024}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="/root/reference/sample.txt")
    ap.add_argument("--tiles", default="512,1024,2048")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--n-evals", type=int, default=2048)
    ap.add_argument("--workloads", default="single,batched,distinct")
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__),
                                      "tune_results.jsonl")
    )
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    assert dev.platform != "cpu", f"need the real chip, got {dev}"

    from syllable_detector_tpu.config.model_format import load_config
    from syllable_detector_tpu.models.detector import (
        detector_spec_from_config,
    )
    from syllable_detector_tpu.tuning import (
        tune_cache_path,
        tune_flat_batch,
        tune_single,
        tuned_flat_tile,
        tuned_single_tile,
    )
    from syllable_detector_tpu.utils.measure import perturbed_params

    spec, params = detector_spec_from_config(load_config(args.net))
    tiles = tuple(int(t) for t in args.tiles.split(","))
    rows = []
    t0 = time.monotonic()

    for wl in args.workloads.split(","):
        t1 = time.monotonic()
        if wl == "single":
            ts = tune_single(spec, params, tiles=tiles, log=log)
        elif wl == "batched":
            ts = tune_flat_batch(spec, params, args.channels, args.n_evals,
                                 tiles=tiles, log=log)
        elif wl == "distinct":
            plist = [perturbed_params(params, 1 + i)
                     for i in range(args.channels)]
            ts = tune_flat_batch(spec, plist, args.channels, args.n_evals,
                                 tiles=tiles, log=log)
        else:
            raise SystemExit(f"unknown workload {wl!r}")
        if not ts:
            log(f"{wl}: no admissible tile measured")
            continue
        win = ts[0]
        rows.append({
            "workload": wl,
            "tiles": list(tiles),
            "channels": args.channels if wl != "single" else 1,
            "n_evals": args.n_evals,
            "winner_tile": win.tile,
            "winner_k": win.hops_per_row,
            "windows_per_s": round(win.windows_per_s, 1),
            "all": [
                {"tile": t.tile, "windows_per_s": round(t.windows_per_s, 1)}
                for t in ts
            ],
            "baked_default": BAKED.get(wl),
            "matches_baked": win.tile == BAKED.get(wl),
            "tune_s": round(time.monotonic() - t1, 1),
        })
        log(f"{wl}: winner tile {win.tile} "
            f"({win.windows_per_s:,.0f} windows/s) vs baked "
            f"{BAKED.get(wl)} in {rows[-1]['tune_s']}s")

    # the production consult path must now serve these winners
    served = {
        "single": tuned_single_tile(spec),
        "batched": tuned_flat_tile(spec, args.channels, args.n_evals, False),
        "distinct": tuned_flat_tile(spec, args.channels, args.n_evals, True),
    }
    out = {
        "device": str(dev),
        "cache": tune_cache_path(),
        "rows": rows,
        "cache_serves": served,
        "total_s": round(time.monotonic() - t0, 1),
    }
    with open(args.out, "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
