"""Hardware A/B: phase-split sub-blocked fused kernel vs whole-tile phases
(r3 verdict #5 — can Mosaic overlap sub-block s's VPU mag phase with
sub-block s+1's MXU GEMM phase?).

Measures the single-stream headline shape (pre-slabbed input, tile 2048,
n_evals 2048 — the entry()/bench configuration) at phase_split 1/2/4/8.

Run:  python scripts/phase_split_hw.py
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
from syllable_detector_tpu.kernels.fused_detector import (
    fused_input_samples,
    fused_offline_outputs,
)
from syllable_detector_tpu.models.detector import detector_spec_from_config


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    tile, n_evals = 2048, 1 << 17  # the bench headline shape (iter >= 1 ms; smaller sits under the scan-slope noise floor)
    n = fused_input_samples(spec, n_evals, tile=tile)
    x = jax.device_put(
        jnp.asarray(make_audio(n).reshape(-1, spec.hop)), dev
    )  # pre-slabbed headline form

    # correctness on hardware first (phase_split must be bit-exact)
    o1 = np.asarray(
        fused_offline_outputs(spec, params, x, tile=tile, n_evals=n_evals)
    )
    for s in (2, 4, 8):
        os_ = np.asarray(
            fused_offline_outputs(
                spec, params, x, tile=tile, n_evals=n_evals, phase_split=s
            )
        )
        d = np.abs(os_ - o1).max()
        log(f"parity phase_split={s}: max abs diff {d:.3e} "
            f"bit-exact={np.array_equal(os_, o1)}")
        assert d < 1e-5

    for s in (1, 2, 4, 8, 1):  # repeat 1 to bracket drift
        def mk(_s=s):
            def fn(xx, carry):
                outs = fused_offline_outputs(
                    spec, params, xx, tile=tile, n_evals=n_evals,
                    phase_split=_s,
                )
                return outs[-1, 0] + carry

            return fn

        dt = time_scanned(mk, x)
        log(f"phase_split={s}: {dt*1e3:8.3f} ms/iter -> "
            f"{n_evals/dt:,.0f} windows/s")


if __name__ == "__main__":
    main()
