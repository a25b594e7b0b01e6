"""Hardware A/B: TRANSPOSED kernel output ([o_pad, tile] blocks — 16x
smaller HBM output array + 15/16 less output write bandwidth) vs the
[tile, o_pad] layout.

If at-least-as-fast, out_t lets distinct c=1024 x 8192 evals fit at K=1
SPEED (est 8.8 GiB vs 12.8) — beating the k=8 capacity tier's ~0.75x.

Run:  python scripts/out_t_hw.py
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

from bench import _perturbed_params as perturb, make_audio, time_scanned
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.kernels.fused_detector import (
    flat_batch_input_samples,
    fused_flat_batch_offline_outputs,
    fused_input_samples,
    fused_offline_outputs,
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


def main():
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    # --- single-stream headline parity + A/B ------------------------------
    tile, ne = 2048, 1 << 17
    x = jax.device_put(
        jnp.asarray(
            make_audio(fused_input_samples(spec, ne, tile=tile)).reshape(
                -1, spec.hop
            )
        ),
        dev,
    )
    o1 = np.asarray(
        fused_offline_outputs(spec, params, x, tile=tile, n_evals=ne)
    )
    ot = np.asarray(
        fused_offline_outputs(
            spec, params, x, tile=tile, n_evals=ne, out_t=True
        )
    )
    log(f"parity single out_t: max diff {np.abs(o1-ot).max():.3e} "
        f"bit-exact={np.array_equal(o1, ot)}")
    for label, kw in (("plain", {}), ("out_t", {"out_t": True}),
                      ("plain", {}), ("out_t", {"out_t": True})):
        def mk(_kw=kw):
            def fn(xx, carry):
                outs = fused_offline_outputs(
                    spec, params, xx, tile=tile, n_evals=ne, **_kw
                )
                return outs[-1, 0] + carry

            return fn

        dt = time_scanned(mk, x)
        log(f"single {label}: {dt*1e3:8.3f} ms/iter -> "
            f"{ne/dt:,.0f} windows/s")

    # --- distinct c=1024 --------------------------------------------------
    c = 1024
    plist = [perturb(params, i) for i in range(c)]
    for ne_d, tile_d in ((4096, 512), (8192, 512)):
        base = make_audio(
            flat_batch_input_samples(spec, ne_d, c, tile=tile_d, distinct=True)[0]
        )
        xs = jax.device_put(slabbed(spec, ne_d, c, tile_d, True, base), dev)
        for label, kw in (("plain", {}), ("out_t", {"out_t": True})):
            try:
                def mk(_kw=kw, _ne=ne_d, _t=tile_d):
                    def fn(xx, carry):
                        outs = fused_flat_batch_offline_outputs(
                            spec, plist, xx, tile=_t, n_evals=_ne,
                            channels=c, **_kw,
                        )
                        return outs[-1, -1, 0] + carry

                    return fn

                dt = time_scanned(mk, xs)
                log(f"distinct c={c} ne={ne_d} {label}: "
                    f"{dt*1e3:8.2f} ms/iter -> {c*ne_d/dt:,.0f} win/s")
            except Exception as e:
                log(f"distinct c={c} ne={ne_d} {label} FAILED: "
                    f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
