"""Honest perf bookkeeping: the batched channel sweep measured N times,
reported as median and range (r2 VERDICT: single best-run points exceeded
the stated variance band; docs must carry medians/ranges).

Run:  python scripts/sweep_median.py [--trials 3] [--channels 8,64,256,1024]
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

from bench import batched_throughput, log
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.models.detector import detector_spec_from_config


def main():
    import jax

    trials = 3
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    channels = (8, 64, 256, 1024)
    if "--channels" in sys.argv:
        channels = tuple(
            int(c) for c in sys.argv[sys.argv.index("--channels") + 1].split(",")
        )

    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform} trials={trials}")

    hop = spec.hop
    for c in channels:
        vals = []
        for t in range(trials):
            try:
                wps = batched_throughput(spec, params, dev, c)
                vals.append(wps)
                log(f"  c={c:5d} trial {t}: {wps:,.0f} windows/s")
            except Exception as e:
                log(f"  c={c} trial {t} failed: {type(e).__name__}: {str(e)[:100]}")
        if vals:
            med = float(np.median(vals))
            log(
                f"c={c:5d}: median {med/1e6:.1f}M windows/s  "
                f"range [{min(vals)/1e6:.1f}, {max(vals)/1e6:.1f}]M  "
                f"({med/spec.sampling_rate*hop:,.0f} realtime channels)"
            )


if __name__ == "__main__":
    main()
