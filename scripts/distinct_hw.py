"""Hardware A/B: per-channel DISTINCT nets vs shared net on the fused
batched kernel (the round-3 headline feature).

Checks, on the real chip:
  1. parity: fused distinct batched outputs vs the unfused vmap-over-
     stacked-params oracle (<= 1e-3)
  2. throughput: distinct-net c=64 within ~20% of shared-net c=64

Run:  python scripts/distinct_hw.py [--channels 64]
"""

import os
import sys
import time

os.makedirs(os.path.expanduser("~/.cache/syllable_detector_tpu/xla"), exist_ok=True)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/syllable_detector_tpu/xla"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _perturbed_params as perturb_params, make_audio, time_scanned
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.kernels.fused_detector import (
    fused_batch_offline_outputs,
    fused_input_samples,
)
from syllable_detector_tpu.models.detector import detector_spec_from_config
from syllable_detector_tpu.models.neural_net import stack_params


def log(msg):
    print(msg, file=sys.stderr, flush=True)


perturb = perturb_params  # single home: bench._perturbed_params


def main():
    c = 64
    if "--channels" in sys.argv:
        c = int(sys.argv[sys.argv.index("--channels") + 1])
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform} channels={c}")

    tile = 512
    n_evals = 1 << 11
    n = fused_input_samples(spec, n_evals, tile=tile, batched=True)
    rng = np.random.default_rng(0)
    base = make_audio(n)
    xs = jax.device_put(
        jnp.asarray(
            np.stack([np.roll(base, 17 * i) for i in range(c)])
        ),
        dev,
    )
    plist = [perturb(params, i) for i in range(c)]

    # --- parity on hardware (small slice to keep the oracle cheap) --------
    n_par = 4096 * 4
    xs_par = xs[:, :n_par]
    got = np.asarray(
        fused_batch_offline_outputs(spec, plist, xs_par, tile=tile)
    )
    from syllable_detector_tpu.models.detector import offline_outputs

    want = np.asarray(
        jax.jit(
            jax.vmap(lambda p, x: offline_outputs(spec, p, x)),
            static_argnums=(),
        )(stack_params(plist), xs_par)
    )
    err = np.abs(got - want[:, : got.shape[1]]).max()
    log(f"parity distinct fused vs unfused vmap: max abs err {err:.2e} "
        f"over {got.shape}")
    assert err < 1e-3, err

    # --- throughput A/B ---------------------------------------------------
    def make_shared():
        def fn(x, carry):
            outs = fused_batch_offline_outputs(
                spec, params, x, tile=tile, n_evals=n_evals, slab_channels=64
            )
            return outs[-1, -1, 0] + carry

        return fn

    def make_distinct():
        def fn(x, carry):
            outs = fused_batch_offline_outputs(
                spec, plist, x, tile=tile, n_evals=n_evals, slab_channels=64
            )
            return outs[-1, -1, 0] + carry

        return fn

    total = c * n_evals
    for name, mk in (("shared", make_shared), ("distinct", make_distinct)):
        dt = time_scanned(mk, xs)
        log(
            f"{name:9s} c={c}: {dt*1e3:8.2f} ms/iter -> "
            f"{total/dt:,.0f} windows/s"
        )


if __name__ == "__main__":
    main()
