"""Hardware tile sweep for the out_t flat paths (r4 follow-up).

The distinct-net record config (k=1, ne=8192, out_t) was measured only at
tile 512 — the pre-out_t winner. out_t removed 15/16 of the output write
bandwidth, which shifts the per-program-overhead vs padded-rows tradeoff:
larger tiles halve program count (and per-channel operand fetches) at the
cost of rounding each channel's rows up to a tile multiple
(ne=8192: t512 = +6%, t1024 = +12.5%, t2048 = +25% rows).

Run:  python scripts/out_t_tile_sweep.py [--shared] [--trials N]
"""

import argparse
import os
import sys

os.makedirs(os.path.expanduser("~/.cache/syllable_detector_tpu/xla"), exist_ok=True)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/syllable_detector_tpu/xla"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _perturbed_params as perturb, make_audio, time_scanned
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.kernels.fused_detector import (
    _flat_hbm_budget,
    _flat_hbm_estimate,
    flat_batch_input_samples,
    fused_flat_batch_offline_outputs,
)
from syllable_detector_tpu.models.detector import detector_spec_from_config


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def slabbed(spec, n_evals, c, tile, distinct, base):
    per_ch, total = flat_batch_input_samples(
        spec, n_evals, c, tile=tile, distinct=distinct
    )
    flat = np.zeros(total, np.float32)
    for ch in range(c):
        src = np.roll(base, 17 * ch)
        flat[ch * per_ch : ch * per_ch + min(per_ch, len(src))] = src[:per_ch]
    return jnp.asarray(flat.reshape(-1, spec.hop))


def sweep(spec, params, dev, c, ne, tiles, distinct, trials):
    plist = [perturb(params, i) for i in range(c)] if distinct else params
    kind = "distinct" if distinct else "shared"
    for tile in tiles:
        est = _flat_hbm_estimate(spec, ne, c, tile, distinct, out_t=True)
        if est > _flat_hbm_budget():
            log(f"{kind} c={c} ne={ne} t={tile}: skipped, est "
                f"{est/2**30:.1f} GiB over budget")
            continue
        base = make_audio(
            flat_batch_input_samples(spec, ne, c, tile=tile,
                                     distinct=distinct)[0]
        )
        xs = jax.device_put(slabbed(spec, ne, c, tile, distinct, base), dev)
        best = []
        for _ in range(trials):
            def mk(_t=tile):
                def fn(xx, carry):
                    outs = fused_flat_batch_offline_outputs(
                        spec, plist, xx, tile=_t, n_evals=ne,
                        channels=c, out_t=True,
                    )
                    return outs[-1, -1, 0] + carry

                return fn

            try:
                best.append(time_scanned(mk, xs))
            except Exception as e:
                log(f"{kind} c={c} ne={ne} t={tile} FAILED: "
                    f"{type(e).__name__}: {str(e)[:140]}")
                best = None
                break
        if best:
            dt = float(np.median(best))
            log(f"{kind} c={c} ne={ne} t={tile} outT: "
                f"{dt*1e3:8.2f} ms/iter -> {c*ne/dt:,.0f} win/s "
                f"(median of {trials}, est {est/2**30:.1f} GiB)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shared", action="store_true",
                    help="also sweep the shared-net flat path")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    sweep(spec, params, dev, 1024, 8192, (512, 1024, 2048), True,
          args.trials)
    if args.shared:
        sweep(spec, params, dev, 1024, 8192, (512, 1024, 2048), False,
              args.trials)


if __name__ == "__main__":
    main()
