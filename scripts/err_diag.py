"""Diagnose the split-path error distribution on hardware."""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/syllable_detector_tpu/xla"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_audio
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.kernels.fused_detector import fused_offline_outputs
from syllable_detector_tpu.models.detector import (
    detector_spec_from_config,
    offline_outputs,
)


def stats(name, got, want):
    abs_err = np.abs(got - want)
    rel = abs_err / np.maximum(np.abs(want), 1e-3)
    i = int(abs_err.argmax())
    print(
        f"{name:18s}: max abs {abs_err.max():.3e} (want {want.flat[i]:+.4f} "
        f"got {got.flat[i]:+.4f} @ {i}), p99.9 abs "
        f"{np.quantile(abs_err, 0.999):.3e}, max rel(c=1e-3) {rel.max():.3e}, "
        f"max rel(c=1e-1) {(abs_err/np.maximum(np.abs(want),1e-1)).max():.3e}"
    )


def main():
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    n_evals = 1 << 17
    hop = spec.hop
    n = (n_evals + spec.time_range - 2) * hop + spec.window_length + hop
    x = jax.device_put(jnp.asarray(make_audio(n)), dev)
    want = np.asarray(offline_outputs(spec, params, x))
    for name, kw in (
        ("split3-bf16", dict(split=True)),
        ("split-conv-only", dict(split="conv")),
        ("packed-highest", dict(split=False)),
    ):
        got = np.asarray(fused_offline_outputs(spec, params, x, tile=512, **kw))
        stats(name, got, want)


if __name__ == "__main__":
    main()
