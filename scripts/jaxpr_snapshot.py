"""Dump jaxprs of every _make_kernel branch for refactor-safety diffing.

Usage: python scripts/jaxpr_snapshot.py OUTDIR
Writes one .txt per (path, variant). A pure-extraction refactor of the
kernel body must leave every file byte-identical.
"""
import sys
import pathlib

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.models.detector import detector_spec_from_config
from syllable_detector_tpu.kernels import fused_detector as fd


def perturbed(params, i):
    import jax.tree_util as jtu

    return jtu.tree_map(lambda a: a * (1.0 + 0.01 * (i + 1)), params)


def main(outdir):
    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)

    n = fd.fused_input_samples(spec, 2048, tile=256)
    x = np.zeros(n, np.float32)

    cases = {}

    cases["raw_single"] = lambda xx: fd.fused_offline_outputs(
        spec, params, xx, tile=256, interpret=True
    )
    cases["raw_single_out_t"] = lambda xx: fd.fused_offline_outputs(
        spec, params, xx, tile=256, interpret=True, out_t=True
    )
    cases["raw_single_unpacked"] = lambda xx: fd.fused_offline_outputs(
        spec, params, xx, tile=256, interpret=True, packed=False
    )
    cases["phase_split4"] = lambda xx: fd.fused_offline_outputs(
        spec, params, xx, tile=256, interpret=True, phase_split=4
    )
    for name in ("split", "fast"):
        cases[f"tier_{name}"] = (
            lambda xx, nm=name: fd.fused_offline_outputs(
                spec, params, xx, tile=256, interpret=True, **({"split": True} if nm == "split" else {"fast": True})
            )
        )

    import dataclasses

    for sc in ("linear", "log", "db"):
        if sc == spec.scaling:
            continue
        spec_sc = dataclasses.replace(spec, scaling=sc)
        cases[f"raw_scaling_{sc}"] = (
            lambda xx, s=spec_sc: fd.fused_offline_outputs(
                s, params, xx, tile=256, interpret=True
            )
        )

    xs = np.zeros((3, 40000), np.float32)
    plist = [perturbed(params, i) for i in range(3)]
    cases["flat_shared"] = lambda aa: fd.fused_flat_batch_offline_outputs(
        spec, params, aa, tile=128, interpret=True, out_t=False
    )
    cases["flat_shared_out_t"] = lambda aa: fd.fused_flat_batch_offline_outputs(
        spec, params, aa, tile=128, interpret=True, out_t=True
    )
    cases["flat_distinct"] = lambda aa: fd.fused_flat_batch_offline_outputs(
        spec, plist, aa, tile=128, interpret=True, out_t=False
    )
    cases["flat_distinct_out_t"] = (
        lambda aa: fd.fused_flat_batch_offline_outputs(
            spec, plist, aa, tile=128, interpret=True, out_t=True
        )
    )
    cases["rawk8_shared"] = lambda aa: fd.fused_flat_batch_offline_outputs(
        spec, params, aa, tile=128, interpret=True, hops_per_row=8,
        out_t=False
    )
    cases["rawk8_shared_out_t"] = (
        lambda aa: fd.fused_flat_batch_offline_outputs(
            spec, params, aa, tile=128, interpret=True, hops_per_row=8,
            out_t=True
        )
    )
    cases["rawk8_distinct_out_t"] = (
        lambda aa: fd.fused_flat_batch_offline_outputs(
            spec, plist, aa, tile=128, interpret=True, hops_per_row=8,
            out_t=True
        )
    )
    cases["grid_batched"] = lambda aa: fd.fused_batch_offline_outputs(
        spec, params, aa, tile=128, interpret=True, layout="grid"
    )

    for name, f in cases.items():
        arg = x if name.startswith(("raw_", "phase", "tier")) else xs
        txt = str(jax.make_jaxpr(f)(arg))
        (out / f"{name}.txt").write_text(txt)
        print(f"{name}: {len(txt)} chars")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxpr_before")
