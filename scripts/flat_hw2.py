"""Hardware measurement of the production flat-batch path: shared and
DISTINCT nets at c=64 and c=1024, zero-copy flat input form.

Run: python scripts/flat_hw2.py [--skip-1024]
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

from bench import _perturbed_params, log, make_audio, time_scanned
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.models.detector import detector_spec_from_config


def main():
    import jax
    import jax.numpy as jnp

    from syllable_detector_tpu.kernels.fused_detector import (
        flat_batch_input_samples,
        fused_batch_offline_outputs,
        fused_flat_batch_offline_outputs,
    )

    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    hop = spec.hop

    cases = [
        ("shared", 64, 2048, 1 << 11, False),
        ("distinct", 64, 512, 1 << 13, True),
        ("distinct", 64, 2048, 1 << 13, True),
    ]
    if "--skip-1024" not in sys.argv:
        cases += [
            ("shared", 1024, 2048, 1 << 11, False),
            # n_evals capped at 2048/channel: the 132->256 lane pad of the
            # flat slab plus the [N, 8]->128-lane output pad exceed HBM at
            # 1024 x 8192 (measured 12.8G requirement)
            ("distinct", 1024, 512, 1 << 11, True),
        ]
    if "--only-1024-distinct" in sys.argv:
        cases = [("distinct", 1024, 512, 1 << 11, True)]

    for name, c, tile, n_evals, distinct in cases:
        p = [_perturbed_params(params, i) for i in range(c)] if distinct else params
        per_ch, total = flat_batch_input_samples(
            spec, n_evals, c, tile=tile, distinct=distinct
        )
        base = make_audio(per_ch)
        flat = np.zeros(total, np.float32)
        for ch in range(c):
            flat[ch * per_ch : (ch + 1) * per_ch] = np.roll(base, 13 * ch)
        # pre-slabbed 2-D form: device-puts in the kernel's tiled layout
        # (the 1-D form costs an in-graph layout copy that DOUBLES peak
        # HBM — it OOM'd the c=1024 distinct case)
        xs = jax.device_put(jnp.asarray(flat.reshape(-1, spec.hop)), dev)

        # parity vs the (c,grid) batched kernel on a short prefix
        got = np.asarray(
            fused_flat_batch_offline_outputs(
                spec, p, xs, tile=tile, n_evals=n_evals, channels=c
            )
        )[:, :256]
        xs2d = jnp.asarray(
            np.stack([flat[ch * per_ch : (ch + 1) * per_ch] for ch in range(c)])
        )
        want = np.asarray(
            fused_batch_offline_outputs(spec, p, xs2d, tile=512, n_evals=256)
        )
        err = np.abs(got[:, :256] - want).max()

        def make_fn():
            def fn(x, carry):
                outs = fused_flat_batch_offline_outputs(
                    spec, p, x, tile=tile, n_evals=n_evals, channels=c
                )
                return outs[-1, -1, 0] + carry

            return fn

        dt = time_scanned(make_fn, xs)
        wps = c * n_evals / dt
        log(
            f"FLAT {name:8s} c={c:4d} tile {tile:4d} n_evals {n_evals}: "
            f"parity {err:.1e} | {dt*1e3:8.2f} ms/iter -> {wps:,.0f} w/s "
            f"({wps/spec.sampling_rate*hop:,.0f} realtime channels)"
        )


if __name__ == "__main__":
    main()
