"""Framed GEMM Pallas kernel: ``frames(x) @ G`` with the frames built in VMEM.

The building block shared by every op in this framework that contracts
hop-strided overlapping windows against a constant matrix — the band DFT
(reference: Common/CircularShortTimeFourierTransform.swift:311-334) and the
polyphase resampler (the TPU-idiomatic upgrade of Common/Resampler.swift) —
without ever materializing the ``[n_frames, window]`` frames matrix in HBM.

Same slab algebra as the fused detector kernel (kernels/fused_detector.py):
frame k's column block j is row ``k + j`` of the ``[rows, hop]`` reshape of
the raw samples, so

    frames @ G  =  sum_j  slab[j : j + tile, part_j_cols] @ G[part_j_rows]

one small GEMM per slab part (``ceil((gap+window)/hop)`` parts, usually
2-3). Input arrives through BlockSpec-pipelined VMEM blocks that Mosaic
double-buffers across grid programs; the natural hop-lane width is kept
(BlockSpec blocks need no 128-multiple lane alignment). Falls back to a
manual lane-padded DMA when the tile cannot host the pipelined halo
geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from syllable_detector_tpu.ops.stft import slab_parts

__all__ = ["framed_gemm", "pallas_polyphase_resample"]

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geometry(window: int, window_overlap: int, tile: int):
    """Slab geometry for one tile of frames (no sliding-window halo here —
    that is detector-specific). Part layout delegates to ops.stft.slab_parts
    (the single home for the slab decomposition)."""
    gap, hop, parts = slab_parts(window, window_overlap)
    rows2d = _round_up(tile + len(parts) - 1, 8)
    return gap, hop, rows2d, tuple(parts)


@functools.partial(
    jax.jit,
    static_argnames=("window", "window_overlap", "n_frames", "tile", "interpret"),
)
def framed_gemm(
    x: jax.Array,
    g: jax.Array,
    window: int,
    window_overlap: int,
    n_frames: int,
    tile: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """``frame_signal(x, n_frames, window, window_overlap) @ g`` fused:
    [n] x [window, m] -> [n_frames, m], frames never leave VMEM.

    ``interpret=None`` auto-selects interpret mode on CPU backends.
    """
    if interpret is None:
        interpret = jax.local_devices()[0].platform == "cpu"

    gap, hop, rows2d, parts = _geometry(window, window_overlap, tile)
    m = g.shape[1]
    if g.shape[0] != window:
        # a plain assert vanishes under python -O and a mismatched filter
        # matrix would then silently contract against the wrong slab slices
        raise ValueError(f"g rows {g.shape[0]} != window {window}")

    grid = max(1, -(-n_frames // tile))
    total_rows = (grid - 1) * tile + rows2d
    x = jnp.asarray(x, jnp.float32)
    g = jnp.asarray(g, jnp.float32)
    total = total_rows * hop
    n = x.shape[0]
    if total > n:
        x = jnp.concatenate([x, jnp.zeros(total - n, jnp.float32)])
    data = x[:total].reshape(total_rows, hop)

    halo_rows = rows2d - tile
    pipe = halo_rows == 0 or tile % halo_rows == 0
    hop_pad = _round_up(hop, LANE)
    if not pipe:
        data = jnp.pad(data, ((0, 0), (0, hop_pad - hop)))

    def kernel(*kargs):
        if pipe:
            if halo_rows:
                main_ref, halo_ref, g_ref, out_ref, svmem = kargs
            else:
                main_ref, g_ref, out_ref, svmem = kargs
            svmem[0:tile, :] = main_ref[:, :]
            if halo_rows:
                svmem[tile:rows2d, :] = halo_ref[:, :]
        else:
            data_hbm, g_ref, out_ref, svmem, sem = kargs
            i = pl.program_id(0)
            copy = pltpu.make_async_copy(
                data_hbm.at[pl.ds(i * tile, rows2d)],
                svmem.at[pl.ds(0, rows2d)],
                sem,
            )
            copy.start()
            copy.wait()
        acc = jnp.zeros((tile, m), jnp.float32)
        for j, (lo, hi, clo) in enumerate(parts):
            acc = acc + jnp.dot(
                svmem[j : j + tile, clo : clo + (hi - lo)],
                g_ref[lo:hi, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[:, :] = acc

    lanes = hop if pipe else hop_pad
    scratches = [pltpu.VMEM((rows2d, lanes), jnp.float32)]
    if pipe:
        step = tile // halo_rows if halo_rows else 0
        in_specs = [pl.BlockSpec((tile, hop), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        inputs = [data]
        if halo_rows:
            in_specs.append(
                pl.BlockSpec((halo_rows, hop),
                             lambda i, _s=step: ((i + 1) * _s, 0),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(data)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(g)
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        inputs = [data, g]
        scratches.append(pltpu.SemaphoreType.DMA(()))

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((grid * tile, m), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratches,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * grid * tile * window * m,
            bytes_accessed=grid * tile * hop * 4 + grid * tile * m * 4,
            transcendentals=0,
        ),
    )(*inputs)
    return out[:n_frames]


def pallas_polyphase_resample(
    x,
    in_rate: float,
    out_rate: float,
    half_width: int = 10,
    beta: float = 5.0,
    max_denominator: int = 1000,
    tile: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Rational resampling through the framed-GEMM kernel — the
    TPU-idiomatic polyphase path (SURVEY section 7 item 7): identical
    semantics to :func:`syllable_detector_tpu.ops.resample.polyphase_resample`
    (scipy upfirdn with a Kaiser windowed-sinc design), but the per-block
    input windows are framed in VMEM instead of materializing the
    ``[blocks, W]`` frames matrix in HBM."""
    from fractions import Fraction

    from syllable_detector_tpu.ops.resample import (
        _polyphase_lead,
        polyphase_plan,
    )

    frac = Fraction(float(out_rate) / float(in_rate)).limit_denominator(
        max_denominator
    )
    up, down = frac.numerator, frac.denominator
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if up == down:
        return x
    n_out = -(-n * up // down)
    g, lead, w_len, overlap = polyphase_plan(up, down, half_width, beta)
    blocks = -(-n_out // up)
    xin = _polyphase_lead(x, lead)
    y = framed_gemm(
        xin, jnp.asarray(g), w_len, overlap, blocks, tile=tile,
        interpret=interpret,
    )
    return y.reshape(-1)[:n_out]
