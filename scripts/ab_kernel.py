"""A/B harness for fused-kernel variants on real TPU hardware.

Times each (packed, split) combination of the fused kernel plus the unfused
XLA baseline with bench.py's scan-slope method, and checks on-device parity
for each variant. Usage:  python scripts/ab_kernel.py [variant ...]
where variant is a key of VARIANTS below (default, split, old, fast, frames,
t1024, t2048, t1024s, t2048s, t4096, t2048c, t4096c, unfused).
No args = all.
"""

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

from bench import make_audio, time_scanned
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.kernels.fused_detector import fused_offline_outputs
from syllable_detector_tpu.models.detector import (
    detector_spec_from_config,
    offline_outputs,
)

VARIANTS = {
    # name -> kwargs for fused_offline_outputs (None = unfused baseline)
    "default": dict(),                             # packed + fp32 HIGHEST
    "split": dict(split=True),                     # packed + bf16x3 tier
    "old": dict(packed=False, split=False),        # round-1 kernel
    "fast": dict(fast=True),                       # 1-pass bf16 diagnostic
    "frames": dict(input_mode="frames"),           # XLA pre-gathered frames
    "t1024": dict(tile=1024),                      # tile sweep (fidelity)
    "t2048": dict(tile=2048),
    "t1024s": dict(tile=1024, split=True),         # tile sweep (split tier)
    "t2048s": dict(tile=2048, split=True),
    "t4096": dict(tile=4096),
    "t2048c": dict(tile=2048, split="conv"),       # conv-GEMM-only split
    "t4096c": dict(tile=4096, split="conv"),
    "t2048q": dict(tile=2048, split=4),            # 4-pass split (fidelity?)
    "unfused": None,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        print(f"unknown variants {unknown}; choose from {list(VARIANTS)}")
        return
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    n_evals = 1 << 17
    tile = 512

    from syllable_detector_tpu.kernels.fused_detector import fused_input_samples

    # slab-exact per-tile input sizing (no tail-pad copy), inputs chained
    # through the scan carry — bench.py's exact methodology. All tiles slice
    # prefixes of ONE master signal (make_audio's chirp depends on its total
    # length, so independently generated lengths would not share windows).
    tiles_needed = {tile} | {
        VARIANTS[n].get("tile", tile) for n in names if VARIANTS[n] is not None
    }
    n_master = max(fused_input_samples(spec, n_evals, tile=t) for t in tiles_needed)
    x_master = make_audio(n_master)
    xs_by_tile = {}

    def x_for(t):
        if t not in xs_by_tile:
            n = fused_input_samples(spec, n_evals, tile=t)
            xs_by_tile[t] = jax.device_put(jnp.asarray(x_master[:n]), dev)
        return xs_by_tile[t]

    want = None
    results = {}
    for name in names:
        kw = VARIANTS[name]
        try:
            if kw is None:
                x = x_for(tile)
                def make_fn():
                    def fn(x, carry):
                        # no input perturbation here: time_scanned's scan
                        # body already chains the carry through x (a
                        # baseline-only `x + carry*0` copy would inflate
                        # every fused-vs-unfused ratio)
                        out = offline_outputs(spec, params, x)
                        return out[-1, 0] + carry
                    return fn
                got = np.asarray(offline_outputs(spec, params, x))[:n_evals]
                want = got
            else:
                kw = dict(kw)
                kw.setdefault("tile", tile)
                x = x_for(kw["tile"])
                def make_fn(kw=kw, x=x):
                    def fn(x, carry):
                        out = fused_offline_outputs(
                            spec, params, x, n_evals=n_evals, **kw
                        )
                        return out[-1, 0] + carry
                    return fn
                got = np.asarray(
                    fused_offline_outputs(spec, params, x, n_evals=n_evals, **kw)
                )
            if want is None:
                want = np.asarray(
                    offline_outputs(spec, params, x_for(tile))
                )[:n_evals]
            rel = float(
                (np.abs(got - want) / np.maximum(np.abs(want), 1e-3)).max()
            )
            dt = time_scanned(make_fn, x)
            wps = n_evals / dt
            results[name] = wps
            print(
                f"{name:8s}: {dt*1e3:8.3f} ms/iter -> {wps:12,.0f} windows/s "
                f"(max rel err vs unfused {rel:.2e})",
                flush=True,
            )
        except Exception as e:
            print(f"{name:8s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    if "unfused" in results:
        base = results["unfused"]
        for name, wps in results.items():
            print(f"{name:8s}: {wps/base:.3f}x vs unfused", flush=True)


if __name__ == "__main__":
    main()
