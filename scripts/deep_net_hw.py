"""Hardware parity: a DEEP net (2 hidden layers, LogSig mid) through the
fused kernel on the real chip.

The fused kernel's multi-mid path (fold_constants mids, transfers[1:]) is
interpret-tested on CPU; this validates the actual Mosaic lowering of the
extra in-VMEM GEMM + LogSig once on hardware, plus a throughput point so
the cost of depth is on record.

Run:  python scripts/deep_net_hw.py
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
    fold_constants,
    fusable,
    fused_input_samples,
    fused_offline_outputs,
)
from syllable_detector_tpu.utils.synth import deepen_net
from syllable_detector_tpu.models.detector import (
    detector_spec_from_config,
    offline_outputs,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    spec2, params2 = deepen_net(spec, params)
    assert fusable(spec2)
    _, meta = fold_constants(spec2, params2)
    log(f"deep net: layer_sizes={spec2.net.layer_sizes} "
        f"transfers={spec2.net.transfers} n_mids={meta.n_mids}")

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    tile = 2048
    n_evals = 1 << 17
    n = fused_input_samples(spec2, n_evals, tile=tile)
    audio = make_audio(n)
    x2d = jax.device_put(jnp.asarray(audio.reshape(-1, spec2.hop)), dev)
    x = jax.device_put(jnp.asarray(audio), dev)

    # parity on hardware
    got = np.asarray(
        fused_offline_outputs(
            spec2, params2, x2d, tile=tile, input_mode="raw", n_evals=n_evals
        )
    )
    want = np.asarray(offline_outputs(spec2, params2, x))[:n_evals]
    err = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
    log(f"deep-net fused-vs-unfused parity: max rel err {err.max():.2e} "
        f"over {got.shape[0]} windows")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # throughput: deep vs the single-hidden sample net, same run
    def make_deep():
        def fn(x, carry):
            out = fused_offline_outputs(
                spec2, params2, x, tile=tile, input_mode="raw", n_evals=n_evals
            )
            return out[-1, 0] + carry

        return fn

    def make_base():
        def fn(x, carry):
            out = fused_offline_outputs(
                spec, params, x, tile=tile, input_mode="raw", n_evals=n_evals
            )
            return out[-1, 0] + carry

        return fn

    dt_deep = time_scanned(make_deep, x2d)
    dt_base = time_scanned(make_base, x2d)
    log(f"deep  (3 layers): {dt_deep*1e3:8.2f} ms/iter -> "
        f"{n_evals/dt_deep:,.0f} windows/s")
    log(f"base  (2 layers): {dt_base*1e3:8.2f} ms/iter -> "
        f"{n_evals/dt_base:,.0f} windows/s "
        f"(depth cost {dt_deep/dt_base:.3f}x)")
    print("OK")


if __name__ == "__main__":
    main()
