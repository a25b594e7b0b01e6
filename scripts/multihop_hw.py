"""Hardware validation + A/B for the MULTI-HOP-PER-ROW flat slab (r4).

Checks, on the real chip:
  1. bit-exactness: fused flat hops_per_row=8 vs hops_per_row=1, shared
     and distinct nets (the part-based rebuild keeps per-frame GEMM
     accumulation order identical, so outputs should match bitwise);
  2. the r3 HBM cap lift: distinct c=1024 at n_evals 8192 runs (k=1 is
     guarded out at ~12.8 GiB);
  3. throughput A/B: k=8 vs k=1 at the distinct c=1024 / shared c=1024
     deployment shapes (pre-slabbed inputs, scan-slope timing).

Run:  python scripts/multihop_hw.py [--stage parity|cap|perf|all]
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
)
from syllable_detector_tpu.models.detector import detector_spec_from_config


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def slabbed_input(spec, n_evals, c, tile, distinct, k, base):
    """Pre-slabbed 2-D input in the layout flat_batch_input_samples
    prescribes for hops_per_row=k (k=1 -> [rows, hop])."""
    per_ch, total = flat_batch_input_samples(
        spec, n_evals, c, tile=tile, distinct=distinct, hops_per_row=k
    )
    flat = np.zeros(total, np.float32)
    for ch in range(c):
        src = np.roll(base, 17 * ch)
        m = min(per_ch, len(src))
        flat[ch * per_ch : ch * per_ch + m] = src[:m]
    width = spec.hop * k
    return jnp.asarray(flat.reshape(-1, width))


def stage_parity(spec, params):
    c, tile, n_evals = 4, 512, 1024
    base = make_audio(
        flat_batch_input_samples(spec, n_evals, c, tile=tile)[0]
    )
    xs = jnp.asarray(np.stack([np.roll(base, 17 * i) for i in range(c)]))
    for label, p in (
        ("shared", params),
        ("distinct", [perturb(params, i) for i in range(c)]),
    ):
        o1 = np.asarray(
            fused_flat_batch_offline_outputs(
                spec, p, xs, tile=tile, n_evals=n_evals
            )
        )
        o8 = np.asarray(
            fused_flat_batch_offline_outputs(
                spec, p, xs, tile=tile, n_evals=n_evals, hops_per_row=8
            )
        )
        d = np.abs(o1 - o8).max()
        bit = np.array_equal(o1, o8)
        log(f"parity {label:9s} c={c}: max abs diff {d:.3e} "
            f"bit-exact={bit} over {o1.shape}")
        assert d < 1e-5, d


def stage_cap(spec, params):
    """distinct c=1024 at n_evals 8192 — impossible at k=1 (HBM guard)."""
    from syllable_detector_tpu.kernels.fused_detector import (
        _flat_hbm_budget,
        _flat_hbm_estimate,
    )

    c, tile, n_evals, k = 1024, 512, 8192, 8
    plist = [perturb(params, i) for i in range(c)]
    e1 = _flat_hbm_estimate(spec, n_evals, c, tile, True)
    e8 = _flat_hbm_estimate(spec, n_evals, c, tile, True, hops_per_row=k)
    log(f"cap: estimates k=1 {e1/2**30:.1f} GiB (budget "
        f"{_flat_hbm_budget()/2**30:.1f}) vs k={k} {e8/2**30:.1f} GiB")
    assert e1 > _flat_hbm_budget() >= e8
    base = make_audio(
        flat_batch_input_samples(
            spec, n_evals, c, tile=tile, distinct=True, hops_per_row=k
        )[0]
    )
    xs = slabbed_input(spec, n_evals, c, tile, True, k, base)
    log(f"cap: slab {xs.shape} ({xs.size*4/2**30:.2f} GiB logical)")
    out = fused_flat_batch_offline_outputs(
        spec, plist, xs, tile=tile, n_evals=n_evals, channels=c,
        hops_per_row=k,
    )
    out = jax.block_until_ready(out)
    log(f"cap: distinct c={c} n_evals={n_evals} RAN at k={k}: "
        f"out {out.shape}, sample {np.asarray(out[0, :2, 0])}")


def stage_perf(spec, params):
    # (label, c, distinct, n_evals, tile, k) — round-2 configs: tile 512's
    # per-residue GEMMs at k=8 are only ~67 rows (0.72x measured); larger
    # tiles restore GEMM efficiency (q = tile/k rows per residue)
    configs = (
        ("shared_c1024", 1024, False, 2048, 2048, 1),
        ("shared_c1024", 1024, False, 2048, 2048, 8),
        ("distinct_c1024", 1024, True, 4096, 512, 1),
        ("distinct_c1024", 1024, True, 4096, 1024, 8),
        ("distinct_c1024", 1024, True, 4096, 2048, 8),
        # the capacity shape timed at c=512 (the ne=8192 c=1024 TIMED
        # wrapper OOMs: scan carry + output transpose double-buffer)
        ("distinct_8k_c512", 512, True, 8192, 1024, 8),
    )
    results = {}
    plist_cache = {}
    for label, c, distinct, n_evals, tile, k in configs:
        if distinct:
            if c not in plist_cache:
                plist_cache[c] = [perturb(params, i) for i in range(c)]
            plist = plist_cache[c]
        else:
            plist = params
        try:
            base = make_audio(
                flat_batch_input_samples(
                    spec, n_evals, c, tile=tile, distinct=distinct,
                    hops_per_row=k,
                )[0]
            )
            xs = slabbed_input(spec, n_evals, c, tile, distinct, k, base)

            def mk(_xs=xs, _p=plist, _k=k, _ne=n_evals, _t=tile, _c=c):
                def fn(x, carry):
                    outs = fused_flat_batch_offline_outputs(
                        spec, _p, x, tile=_t, n_evals=_ne, channels=_c,
                        hops_per_row=_k,
                    )
                    return outs[-1, -1, 0] + carry

                return fn

            dt = time_scanned(mk, xs)
            rate = c * n_evals / dt
            results[f"{label}_t{tile}_k{k}"] = rate
            log(f"{label} tile={tile} k={k} ne={n_evals}: "
                f"{dt*1e3:8.2f} ms/iter -> {rate:,.0f} win/s")
        except Exception as e:
            log(f"{label} tile={tile} k={k} FAILED: {type(e).__name__}: "
                f"{str(e)[:140]}")
    for name, rate in results.items():
        log(f"RESULT {name}: {rate/1e6:.1f}M")


def main():
    stage = "all"
    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform} stage={stage}")
    if stage in ("parity", "all"):
        stage_parity(spec, params)
    if stage in ("cap", "all"):
        stage_cap(spec, params)
    if stage in ("perf", "all"):
        stage_perf(spec, params)
    log("multihop_hw done")


if __name__ == "__main__":
    main()
