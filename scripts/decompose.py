"""Decompose the fused kernel's per-program time on hardware.

Times stripped-down variants of the tile-2048 kernel: DMA only, DMA+DFT,
DMA+DFT+mag, full pipeline — to locate the ~30 us/program that neither MXU
passes nor DMA bytes explain. Results feed the round notes.
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import make_audio, time_scanned
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.kernels.fused_detector import (
    _folded,
    _raw_geometry,
)
from syllable_detector_tpu.models.detector import detector_spec_from_config

TILE = 2048


def make_pipelined(spec, meta, operands):
    """'full' math, but the slab arrives via TWO BlockSpec-managed VMEM
    inputs (main [TILE, hop_pad] + halo [HALO_ROWS, hop_pad] of the same
    array) so Mosaic double-buffers the HBM->VMEM traffic across grid
    programs instead of a serialized manual DMA."""
    gap, hop, hop_pad, rows_frames, n_parts, rows2d, parts = _raw_geometry(
        spec, TILE
    )
    halo = spec.time_range - 1
    prec = jax.lax.Precision.HIGHEST
    c_packed = operands[0]
    w1g = operands[1]
    halo_rows = rows2d - TILE  # 16 for the sample config at tile 2048
    assert TILE % halo_rows == 0, (TILE, halo_rows)
    step = TILE // halo_rows

    def kernel(main_ref, halo_ref, c_ref, w_ref, out_ref, slab):
        # restore the contiguous rows2d-row slab in scratch: two stores at
        # 8-aligned sublane offsets (concat of mismatched slices is not
        # lowerable, stores are)
        slab[0:TILE, :] = main_ref[:, :]
        slab[TILE:rows2d, :] = halo_ref[:, :]
        big = jnp.zeros((TILE + halo, meta.b_pad), jnp.float32)
        for j, (lo, hi, clo) in enumerate(parts):
            big = big + jnp.dot(
                slab[j : j + TILE + halo, clo : clo + (hi - lo)],
                c_ref[lo:hi, :],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        sq0 = big * big
        sq = sq0 + pltpu.roll(sq0, 64, axis=1)
        mag = jnp.sqrt(sq)
        conv = jnp.dot(
            mag, w_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
        acc = jnp.zeros((TILE, meta.hs), jnp.float32)
        rowsq = jnp.sum(sq0, axis=1, keepdims=True)
        norm = jnp.zeros((TILE, 1), jnp.float32)
        for t in range(spec.time_range):
            acc = acc + conv[t : t + TILE, t * meta.hs : (t + 1) * meta.hs]
            norm = norm + rowsq[t : t + TILE, :]
        acc = jnp.tanh(acc / jnp.sqrt(norm))
        out_ref[:, :] = acc

    @functools.partial(jax.jit, static_argnames=())
    def run(data):
        n_rows = data.shape[0]
        grid = (n_rows - rows2d) // TILE + 1
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((grid * TILE, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (TILE, hop_pad), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (halo_rows, hop_pad),
                    lambda i: ((i + 1) * step, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((rows2d, hop_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(data, data, jnp.asarray(c_packed), jnp.asarray(w1g))

    return run


def make_flat(spec, meta, operands):
    """'full' math, but the HBM layout is the UNPADDED signal viewed as
    [n/128, 128] (a free reshape — no 132->256 lane pad, half the DMA
    bytes, zero prep cost); the kernel DMAs a 128-lane slab whose element
    count is an exact multiple of 132*8 and reshapes it to hop rows in
    VMEM."""
    gap, hop, hop_pad, rows_frames, n_parts, rows2d, parts = _raw_geometry(
        spec, TILE
    )
    halo = spec.time_range - 1
    prec = jax.lax.Precision.HIGHEST
    c_packed = operands[0]
    w1g = operands[1]
    # hop-row span per program, rounded so span*hop is divisible by 128*8:
    # lcm(132, 128*8) / 132 = 256 hop rows granularity for hop 132
    import math
    gran = (math.lcm(hop, 128 * 8)) // hop
    span = -(-rows2d // gran) * gran            # 2304 for the sample config
    rows128 = span * hop // 128                  # 2376
    step128 = TILE * hop // 128                  # program stride in 128-rows
    assert TILE * hop % 128 == 0 and step128 % 8 == 0

    def kernel(flat_hbm, c_ref, w_ref, out_ref, fvmem, sem):
        i = pl.program_id(0)
        copy = pltpu.make_async_copy(
            flat_hbm.at[pl.ds(i * step128, rows128)],
            fvmem.at[pl.ds(0, rows128)],
            sem,
        )
        copy.start()
        copy.wait()
        slab = jnp.reshape(fvmem[0:rows128, :], (span, hop))
        big = jnp.zeros((TILE + halo, meta.b_pad), jnp.float32)
        for j, (lo, hi, clo) in enumerate(parts):
            big = big + jnp.dot(
                slab[j : j + TILE + halo, clo : clo + (hi - lo)],
                c_ref[lo:hi, :],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        sq0 = big * big
        sq = sq0 + pltpu.roll(sq0, 64, axis=1)
        mag = jnp.sqrt(sq)
        conv = jnp.dot(
            mag, w_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
        acc = jnp.zeros((TILE, meta.hs), jnp.float32)
        rowsq = jnp.sum(sq0, axis=1, keepdims=True)
        norm = jnp.zeros((TILE, 1), jnp.float32)
        for t in range(spec.time_range):
            acc = acc + conv[t : t + TILE, t * meta.hs : (t + 1) * meta.hs]
            norm = norm + rowsq[t : t + TILE, :]
        acc = jnp.tanh(acc / jnp.sqrt(norm))
        out_ref[:, :] = acc

    @functools.partial(jax.jit, static_argnames=())
    def run(data):
        # data arrives as the padded [total_rows, hop_pad] used by the other
        # variants; rebuild the flat unpadded view (prep outside the timer
        # is identical across variants)
        total_rows = data.shape[0]
        x = data[:, :hop].reshape(-1)
        grid = (total_rows - rows2d) // TILE + 1
        need128 = (grid - 1) * step128 + rows128
        pad = need128 * 128 - x.shape[0]
        if pad > 0:
            x = jnp.concatenate([x, jnp.zeros(pad, jnp.float32)])
        flat = x[: need128 * 128].reshape(need128, 128)
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((grid * TILE, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((rows128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(flat, jnp.asarray(c_packed), jnp.asarray(w1g))

    return run


def make_pipe132(spec, meta, operands):
    """Like 'pipelined' but the HBM array keeps its natural 132-lane width
    (no 132->256 pad): BlockSpec-managed blocks may not need the manual-DMA
    128-multiple lane rule. If this compiles and runs fast, the whole
    134 MB/call prep pad disappears."""
    gap, hop, hop_pad, rows_frames, n_parts, rows2d, parts = _raw_geometry(
        spec, TILE
    )
    halo_rows = rows2d - TILE
    assert halo_rows > 0 and TILE % halo_rows == 0, (TILE, rows2d)
    halo = spec.time_range - 1
    prec = jax.lax.Precision.HIGHEST
    c_packed = operands[0]
    w1g = operands[1]
    halo_rows = rows2d - TILE
    step = TILE // halo_rows

    def kernel(main_ref, halo_ref, c_ref, w_ref, out_ref, slab):
        slab[0:TILE, :] = main_ref[:, :]
        slab[TILE:rows2d, :] = halo_ref[:, :]
        big = jnp.zeros((TILE + halo, meta.b_pad), jnp.float32)
        for j, (lo, hi, clo) in enumerate(parts):
            big = big + jnp.dot(
                slab[j : j + TILE + halo, clo : clo + (hi - lo)],
                c_ref[lo:hi, :],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        sq0 = big * big
        sq = sq0 + pltpu.roll(sq0, 64, axis=1)
        mag = jnp.sqrt(sq)
        conv = jnp.dot(
            mag, w_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
        acc = jnp.zeros((TILE, meta.hs), jnp.float32)
        rowsq = jnp.sum(sq0, axis=1, keepdims=True)
        norm = jnp.zeros((TILE, 1), jnp.float32)
        for t in range(spec.time_range):
            acc = acc + conv[t : t + TILE, t * meta.hs : (t + 1) * meta.hs]
            norm = norm + rowsq[t : t + TILE, :]
        acc = jnp.tanh(acc / jnp.sqrt(norm))
        out_ref[:, :] = acc

    @functools.partial(jax.jit, static_argnames=())
    def run(narrow):
        total_rows = narrow.shape[0]
        grid = (total_rows - rows2d) // TILE + 1
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((grid * TILE, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (TILE, hop), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (halo_rows, hop),
                    lambda i: ((i + 1) * step, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((rows2d, hop), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(narrow, narrow, jnp.asarray(c_packed), jnp.asarray(w1g))

    return run


def make_variant(spec, meta, operands, stage: str):
    """stage: dma | dft | mag | full-ish"""
    if stage == "pipelined":
        return make_pipelined(spec, meta, operands)
    if stage == "flat":
        return make_flat(spec, meta, operands)
    if stage == "pipe132":
        return make_pipe132(spec, meta, operands)
    gap, hop, hop_pad, rows_frames, n_parts, rows2d, parts = _raw_geometry(
        spec, TILE
    )
    halo = spec.time_range - 1
    prec = jax.lax.Precision.HIGHEST
    c_packed = operands[0]
    w1g = operands[1]

    n_extra = 5 if stage == "ops7" else 0

    def kernel(frames_hbm, c_ref, w_ref, *rest):
        extras = rest[:n_extra]
        out_ref, fvmem, sem = rest[n_extra:]
        i = pl.program_id(0)
        copy = pltpu.make_async_copy(
            frames_hbm.at[pl.ds(i * TILE, rows2d)],
            fvmem.at[pl.ds(0, rows2d)],
            sem,
        )
        copy.start()
        copy.wait()
        if stage == "dma":
            out_ref[:, :] = fvmem[0:TILE, 0:8] * 2.0
            return
        if stage == "ops7":
            # same math as 'full' below but with 5 extra tiny VMEM operands
            # consumed trivially — isolates per-operand per-program cost
            pass
        big = jnp.zeros((TILE + halo, meta.b_pad), jnp.float32)
        for j, (lo, hi, clo) in enumerate(parts):
            big = big + jnp.dot(
                fvmem[j : j + TILE + halo, clo : clo + (hi - lo)],
                c_ref[lo:hi, :],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        if stage == "dft":
            out_ref[:, :] = big[0:TILE, 0:8]
            return
        sq0 = big * big
        sq = sq0 + pltpu.roll(sq0, 64, axis=1)
        mag = jnp.sqrt(sq)
        if stage == "mag":
            out_ref[:, :] = mag[0:TILE, 0:8]
            return
        conv = jnp.dot(
            mag, w_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
        acc = jnp.zeros((TILE, meta.hs), jnp.float32)
        rowsq = jnp.sum(sq0, axis=1, keepdims=True)
        norm = jnp.zeros((TILE, 1), jnp.float32)
        for t in range(spec.time_range):
            acc = acc + conv[t : t + TILE, t * meta.hs : (t + 1) * meta.hs]
            norm = norm + rowsq[t : t + TILE, :]
        acc = jnp.tanh(acc / jnp.sqrt(norm))
        for e in extras:
            acc = acc + e[0:1, 0:8]
        out_ref[:, :] = acc

    @functools.partial(jax.jit, static_argnames=())
    def run(data):
        n_rows = data.shape[0]
        grid = (n_rows - rows2d) // TILE + 1
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((grid * TILE, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_extra,
            out_specs=pl.BlockSpec(
                (TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((rows2d, hop_pad), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(data, jnp.asarray(c_packed), jnp.asarray(w1g),
          *[jnp.zeros((8, 128), jnp.float32)] * n_extra)

    return run


def main():
    cfg = load_config("/root/reference/sample.txt")
    spec, params = detector_spec_from_config(cfg)
    operands, meta = _folded(spec, params)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    n_evals = 1 << 17
    hop = spec.hop
    _, _, hop_pad, _, _, rows2d, _ = _raw_geometry(spec, TILE)
    grid = n_evals // TILE
    total_rows = (grid - 1) * TILE + rows2d
    x = make_audio(total_rows * hop)
    data = np.zeros((total_rows, hop_pad), np.float32)
    data[:, :hop] = x.reshape(total_rows, hop)
    data = jax.device_put(jnp.asarray(data), dev)
    narrow = jax.device_put(
        jnp.asarray(x.reshape(total_rows, hop)), dev
    )  # unpadded 132-lane layout for pipe132

    stages = sys.argv[1:] or ["full", "pipelined", "pipe132"]
    def data_for(stage):
        return narrow if stage == "pipe132" else data

    if "full" in stages:
        a = np.asarray(make_variant(spec, meta, operands, "full")(data))
        for other in stages:
            if other == "full":
                continue
            try:
                b = np.asarray(
                    make_variant(spec, meta, operands, other)(data_for(other))
                )
                print(f"{other} parity vs full: max abs err "
                      f"{np.abs(a-b).max():.2e}", flush=True)
            except Exception as e:
                print(f"{other} parity FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    for stage in stages:
        run = make_variant(spec, meta, operands, stage)

        def make_fn(run=run):
            def fn(d, carry):
                out = run(d)
                return out[-1, 0] + carry
            return fn

        try:
            dt = time_scanned(make_fn, data_for(stage))
            per_prog = dt / grid
            print(
                f"{stage:5s}: {dt*1e3:8.3f} ms/iter, {per_prog*1e6:7.2f} "
                f"us/program ({n_evals/dt:,.0f} windows/s)",
                flush=True,
            )
        except Exception as e:
            print(f"{stage}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
