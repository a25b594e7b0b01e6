"""Hardware smoke: the LIVE fused paths (Detector streaming buckets,
DetectorBank batched buckets, distinct c=1024) on the real chip.

Compiles the small drain-bucket kernel shapes into the persistent cache so
live sessions (and warm_up) are fast, and verifies streaming outputs match
the offline oracle on hardware. Also measures the distinct-net c=1024
deployment shape.

Run: python scripts/live_fused_hw.py
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

from bench import _perturbed_params, batched_throughput, log, make_audio
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.models.detector import (
    Detector,
    detector_spec_from_config,
    offline_outputs,
)
from syllable_detector_tpu.models.detector_bank import DetectorBank


def main():
    import jax
    import jax.numpy as jnp

    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    # --- Detector(method='fused') streaming on hardware -------------------
    det = Detector(cfg, method="fused")
    n = det.warm_up(buckets=(8, 32, 128))
    log(f"Detector.warm_up compiled {n} fused bucket shapes")
    x = make_audio(44100)
    outs = []
    pos = 0
    rng = np.random.default_rng(0)
    while pos < len(x):
        c = int(rng.integers(500, 9000))
        det.append_audio_data(x[pos : pos + c])
        o = det.drain()
        if len(o):
            outs.append(o)
        pos += c
    stream = np.concatenate(outs)
    want = np.asarray(offline_outputs(spec, params, jnp.asarray(x)))
    err = np.abs(stream - want[: len(stream)]).max()
    log(f"fused streaming vs offline on hardware: max abs err {err:.2e} "
        f"over {stream.shape[0]} hops")
    assert err < 1e-3, err

    # --- DetectorBank batched buckets on hardware -------------------------
    cfgs = [cfg, cfg, cfg]
    bank = DetectorBank(cfgs)
    nb = bank.warm_up(buckets=(8, 32, 128))
    log(f"DetectorBank.warm_up compiled {nb} batched bucket shapes (c=3)")
    for i in range(3):
        bank.append_audio_data(i, x[: 22050 + 100 * i * 0])
    bouts = bank.drain()
    berr = np.abs(bouts[0] - want[: bouts.shape[1]]).max()
    log(f"bank lane 0 vs offline on hardware: max abs err {berr:.2e} "
        f"over {bouts.shape[1]} hops")
    assert berr < 1e-3, berr

    # --- distinct nets at the c=1024 deployment scale ---------------------
    try:
        plist = [_perturbed_params(params, i) for i in range(1024)]
        wps = batched_throughput(spec, plist, dev, 1024)
        log(f"batched c=1024 DISTINCT nets: {wps:,.0f} windows/s "
            f"({wps/spec.sampling_rate*spec.hop:,.0f} realtime channels)")
    except Exception as e:
        log(f"distinct c=1024 failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
