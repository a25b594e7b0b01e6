"""Fused STFT + feature + MLP detection kernel (Pallas, TPU).

One kernel evaluates the entire per-hop pipeline the reference spreads over
vDSP calls and ring buffers (reference: Common/SyllableDetector.swift:129-217,
Common/CircularShortTimeFourierTransform.swift:280-337,
Common/NeuralNet.swift:294-377): windowed band-limited DFT, spectrogram
scaling, sliding feature window, input processing, MLP layers, and output
mapping — with every intermediate kept in VMEM. The algebra that makes it a
pure GEMM pipeline:

  * window multiply + zero-pad + FFT + band slice fold into ONE matmul
    against a precomputed [window, 2*bins] matrix with re and im packed as
    two 128-aligned lane blocks (see ops/stft.py for the DFT matrices);
  * the first layer's matmul over the stacked feature vector
    ``concat(mag[e..e+T-1]) @ W1`` decomposes into a T-tap convolution over
    the frame axis, evaluated as ONE GEMM against a [bins, T*hs] filter bank
    followed by T shifted 8-lane block adds — the [E, T*B] feature matrix is
    never materialized;
  * l2normalize needs only ``||feat||`` = sqrt of a sliding sum of per-frame
    row sums of squares;
  * mapminmax / mapstd are affine, so they fold into W1/b1 exactly
    (W1' = W1 * gains, b1' = b1 + W1 @ (y_offset - x_offsets * gains)); the
    output chain's reverse mapping is an affine applied after the last
    transfer.

Grid: one program per tile of ``tile`` evaluations; each program DMAs its
frame slab (tile + timeRange - 1 rows, the sliding-window halo) from HBM to
VMEM, runs the full pipeline on the MXU/VPU, and writes only the [tile, out]
block. Configs outside the supported pattern (processing chains other than
optional l2normalize + affines) fall back to the unfused XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from syllable_detector_tpu.models.detector import WINDOW, DetectorSpec
from syllable_detector_tpu.ops.stft import band_dft_matrices, frame_signal, num_frames

__all__ = [
    "fusable", "fused_offline_outputs", "fused_batch_offline_outputs",
    "fused_flat_batch_offline_outputs", "flat_batch_input_samples",
    "fold_constants", "fold_constants_stacked", "fused_input_samples",
]

LANE = 128

# Physical-layout revision of the flat batched kernel. Bump whenever a
# change moves the optimal launch config — slab packing (hops_per_row),
# output transpose (out_t), the frame-rebuild strategy, tiling rules —
# so stale tune-cache entries are invalidated instead of silently
# serving a tile measured against the OLD layout (r4 proof: landing
# out_t moved the best distinct tile 512 -> 1024). rev 4 = the r4
# transposed-output (out_t) + multi-hop-row layout era.
FLAT_LAYOUT_REV = 4


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedMeta(NamedTuple):
    """Static (hashable) kernel configuration."""

    n_mids: int
    b: int          # true band bins
    b_pad: int      # bins padded to a full 128-lane block
    hs: int         # first-layer width padded to 8 lanes (per conv tap)
    o_pad: int      # final output width padded to 8 lanes
    has_l2: bool
    fast: bool = False  # bf16 MXU passes (~1e-2 rel err) instead of fp32
    packed: bool = False  # re+im share ONE 128-lane block (b <= 64)
    # GEMM precision ladder: False = 6-pass fp32-HIGHEST everywhere (full
    # fidelity); "conv" = split only the conv filter-bank GEMM into 3-pass
    # bf16 hi/lo (the DFT stays exact; measured ~1.5e-4 abs budget);
    # True = 3-pass split of both big GEMMs (~2e-3 max abs on the sample
    # net — the dropped x_lo@C_lo term's ~2^-16 relative error is amplified
    # ~100x by the folded mapminmax gains; opt-in fast tier);
    # 4 = 4-pass split of both (keeps x_lo@C_lo, residual ~2^-24 relative
    # before amplification) — 8 MXU passes vs HIGHEST's 12
    split: object = False


def fusable(spec: DetectorSpec) -> bool:
    """Whether the config fits the fused kernel's algebra."""
    for name in spec.net.input_processing:
        if name not in ("l2normalize", "mapminmax", "mapstd", "passthrough"):
            return False
    # l2normalize must come first if present (it does in MATLAB exports,
    # convert_to_text.m:118-182) so the affines fold into W1
    names = [n for n in spec.net.input_processing if n != "passthrough"]
    if "l2normalize" in names[1:]:
        return False
    for name in spec.net.output_processing:
        if name not in ("mapminmax", "mapstd", "passthrough"):
            return False
    for t in spec.net.transfers:
        if t not in ("TanSig", "LogSig", "PureLin", "SatLin"):
            return False
    return spec.scaling in ("linear", "log", "db")


def fold_constants(spec: DetectorSpec, params: dict, pack: bool | None = None):
    """Precompute the kernel's constant operands (lane-padded float32).

    Returns (operands tuple, FusedMeta): operands are
    (c_packed, w1g, c1, mid_w0, mid_b0, ..., out_a, out_c).
    ``pack`` overrides the automatic re+im single-lane-block layout choice.
    """
    if not fusable(spec):
        raise ValueError(
            "spec is not fusable (callers must check fusable(spec) first)"
        )
    b = spec.n_bins
    t_range = spec.time_range
    window = spec.window_length

    packed = pack if pack is not None else (b <= LANE // 2)
    if packed and b > LANE // 2:
        raise ValueError(
            f"pack=True requires n_bins <= {LANE // 2}, got {b}"
        )
    if packed:
        # re and im share ONE 128-lane block (re at lanes [0, b), im at
        # lanes [64, 64+b)) — halves the dominant DFT GEMM's N dimension;
        # the kernel merges re^2+im^2 with a 64-lane roll
        b_pad = LANE
        c_re, c_im = band_dft_matrices(
            spec.fourier_length, window, WINDOW, spec.bins
        )
        c_packed = np.zeros((window, LANE), np.float32)
        c_packed[:, :b] = c_re
        c_packed[:, LANE // 2 : LANE // 2 + b] = c_im
    else:
        # re and im as two 128-aligned lane blocks so the slices stay
        # relayout-free
        b_pad = _round_up(b, LANE)
        c_re, c_im = band_dft_matrices(
            spec.fourier_length, window, WINDOW, spec.bins
        )
        c_packed = np.zeros((window, 2 * b_pad), np.float32)
        c_packed[:, :b] = c_re
        c_packed[:, b_pad : b_pad + b] = c_im

    # fold the affine input chain into per-feature scale/shift
    from syllable_detector_tpu.ops.processing import fold_input_affines

    feat_scale, feat_shift, has_l2 = fold_input_affines(
        spec.net.input_processing, params["process_inputs"], t_range * b
    )

    w1 = np.asarray(params["layers"][0]["w"], np.float64)  # [H, D]
    b1 = np.asarray(params["layers"][0]["b"], np.float64)  # [H]
    h1 = w1.shape[0]
    # W1 @ (x*scale + shift) + b1 = (W1*scale) @ x + (b1 + W1 @ shift)
    w1_scaled = w1 * feat_scale[None, :]
    b1_eff = b1 + w1 @ feat_shift

    # conv filter bank: ONE GEMM [rows, b_pad] x [b_pad, T*hs] computes all
    # taps; tap t occupies the 8-lane-aligned column block [t*hs, (t+1)*hs)
    hs = _round_up(h1, 8)
    w1g = np.zeros((b_pad, t_range * hs), np.float32)
    for t in range(t_range):
        w1g[:b, t * hs : t * hs + h1] = w1_scaled[:, t * b : (t + 1) * b].T
    c1 = np.zeros((1, hs), np.float32)
    c1[0, :h1] = b1_eff

    mids = []
    prev = hs
    for layer in params["layers"][1:]:
        w = np.asarray(layer["w"], np.float32)  # [O, I]
        bb = np.asarray(layer["b"], np.float32)
        o_pad = _round_up(w.shape[0], 8)
        wp = np.zeros((prev, o_pad), np.float32)
        wp[: w.shape[1], : w.shape[0]] = w.T
        bp = np.zeros((1, o_pad), np.float32)
        bp[0, : w.shape[0]] = bb
        mids.append((wp, bp))
        prev = o_pad

    # output chain reverse as one affine y*a + c
    from syllable_detector_tpu.ops.processing import fold_output_affines

    n_out = spec.net.outputs
    a, cshift = fold_output_affines(
        spec.net.output_processing, params["process_outputs"], n_out
    )
    o_pad = prev
    out_a = np.zeros((1, o_pad), np.float32)
    out_c = np.zeros((1, o_pad), np.float32)
    out_a[0, :n_out] = a
    out_c[0, :n_out] = cshift

    # operands stay host-side numpy: jnp conversion must happen per trace
    # (a cached traced constant would leak tracers across jit contexts)
    operands = [c_packed, w1g, c1]
    for wp, bp in mids:
        operands += [wp, bp]
    operands += [out_a, out_c]
    meta = FusedMeta(
        n_mids=len(mids), b=b, b_pad=b_pad, hs=hs, o_pad=o_pad,
        has_l2=has_l2, packed=packed,
    )
    return tuple(operands), meta


def _transfer(x, name):
    if name == "TanSig":
        return jnp.tanh(x)
    if name == "LogSig":
        return 1.0 / (1.0 + jnp.exp(-x))
    if name == "SatLin":
        return jnp.clip(x, 0.0, 1.0)
    return x


def _raw_geometry(spec: DetectorSpec, tile: int):
    """Slab geometry for raw-sample input: the per-tile sample slab viewed as
    [rows2d, hop] (lane-padded to a 128 multiple — Mosaic requires DMA slice
    lane dims aligned to the (8, 128) tiling); frames are rebuilt in VMEM
    from static slices."""
    from syllable_detector_tpu.ops.stft import slab_parts

    gap, hop, parts = slab_parts(spec.window_length, spec.window_overlap)
    if hop != spec.hop:
        raise ValueError(
            f"slab_parts hop {hop} != spec.hop {spec.hop} (inconsistent spec)"
        )
    hop_pad = _round_up(hop, LANE)
    halo = spec.time_range - 1
    rows_frames = tile + halo
    n_parts = len(parts)
    rows2d = _round_up(rows_frames + n_parts - 1, 8)
    return gap, hop, hop_pad, rows_frames, n_parts, rows2d, tuple(parts)


def _pipelined_geometry(spec: DetectorSpec, tile: int):
    """(halo_rows, step) for the BlockSpec-pipelined raw path, or None when
    the tile cannot host it (halo block stride must divide the tile)."""
    _, _, _, _, _, rows2d, _ = _raw_geometry(spec, tile)
    halo_rows = rows2d - tile
    if halo_rows <= 0 or tile % halo_rows != 0:
        return None
    return halo_rows, tile // halo_rows


def _raw_geometry_k(spec: DetectorSpec, tile: int, k: int):
    """MULTI-HOP-PER-ROW slab geometry: ``k`` hop-rows pack into each slab
    row of ``k*hop`` lanes, shrinking the physical lane pad (the sample
    net's hop 132 pads to 256 = 1.9x per row; 8 hops = 1056 pad to 1152 =
    1.09x) — the r3 verdict's structural fix for the distinct-net HBM cap.

    Frame m = q*k + rho: its standard slab part j (hop-row m+j, col clo)
    lands at slab row q + (rho+j)//k, col ((rho+j)%k)*hop + clo — constant
    offsets per (rho, j), so the in-VMEM rebuild stays static slices and
    the per-frame GEMM accumulation order is IDENTICAL to the k=1 kernel
    (bit-exact results). Returns (gap, hop, L, q, h_q, rows2d, parts_k):
    q = tile//k evals per residue per program, h_q = extra conv rows
    (ceil(halo/k)), parts_k[rho] = ((lo, hi, row_off, col), ...).
    """
    from syllable_detector_tpu.ops.stft import slab_parts

    gap, hop, parts = slab_parts(spec.window_length, spec.window_overlap)
    if k < 2:
        raise ValueError("hops_per_row must be >= 2 (use the k=1 raw path)")
    if tile % (8 * k):
        # q = tile/k is the per-program slab row count: it must be a
        # multiple of 8 (DMA slice sublane alignment / block sublane dim)
        raise ValueError(
            f"tile {tile} must divide by 8*hops_per_row ({8 * k})"
        )
    halo = spec.time_range - 1
    q = tile // k
    h_q = (k - 1 + halo) // k  # == ceil(halo / k)
    row_off_max = (k - 1 + len(parts) - 1) // k
    rows2d = _round_up(q + h_q + row_off_max, 8)
    parts_k = tuple(
        tuple(
            (lo, hi, (rho + j) // k, ((rho + j) % k) * hop + clo)
            for j, (lo, hi, clo) in enumerate(parts)
        )
        for rho in range(k)
    )
    return gap, hop, k * hop, q, h_q, rows2d, parts_k


def _pipelined_geometry_k(spec: DetectorSpec, tile: int, k: int):
    """(halo_rows, step) for the BlockSpec-pipelined multi-hop path, or
    None when the halo block stride cannot divide the per-program rows."""
    _, _, _, q, _, rows2d, _ = _raw_geometry_k(spec, tile, k)
    halo_rows = rows2d - q
    if halo_rows <= 0 or q % halo_rows != 0:
        return None
    return halo_rows, q // halo_rows


def _make_kernel(
    spec: DetectorSpec,
    meta: FusedMeta,
    tile: int,
    input_mode: str = "frames",
    ch_rows: int | None = None,
    pipelined: bool = False,
    out3d: bool = False,
    per_channel: bool = False,
    hops_per_row: int = 1,
    phase_split: int = 1,
    out_t: bool = False,
):
    # per_channel: each channel of the batch grid runs a DISTINCT network —
    # the reference's one-net-per-audio-channel deployment
    # (Processor.swift:57-59, ViewControllerProcessor.swift:222-276). The
    # net operands arrive channel-stacked through BlockSpec-managed refs
    # (block (1, ...) indexed by the channel grid dim); the shared DFT
    # matrix stays whole. ``rd`` reads an operand either way.
    rd = (lambda r: r[0]) if per_channel else (lambda r: r[:])
    t_range = spec.time_range
    halo = t_range - 1
    scaling = spec.scaling
    transfers = spec.net.transfers
    n_mids = meta.n_mids

    # DMA slabs must be (8, 128)-tiling aligned in HBM: round the slab rows
    # up to a multiple of 8 (the input array is padded to match)
    rows = _round_up(tile + halo, 8)
    if input_mode == "raw":
        _, hop, hop_pad, rows_frames, n_parts, rows2d, parts = _raw_geometry(spec, tile)
    elif input_mode == "rawk":
        k = hops_per_row
        _, hop, L, q_sz, h_q, rows2d_k, parts_k = _raw_geometry_k(spec, tile, k)

    # precision ladder for the two big GEMMs (DFT + conv filter bank):
    #   fast  -> 1-pass bf16 (~1e-2 rel err, opt-in diagnostic only)
    #   split -> 3-pass bf16 hi/lo decomposition (~1e-5 rel err; the tf32x3
    #            analogue — x@C ~= xh@Ch + xh@Cl + xl@Ch, each pass bf16 on
    #            the MXU with fp32 accumulate). Half the MXU passes of
    #            HIGHEST at precision well inside the 1e-3 contract.
    #   else  -> 6-pass fp32 HIGHEST (Mosaic supports only DEFAULT/HIGHEST)
    prec = (
        jax.lax.Precision.DEFAULT if meta.fast else jax.lax.Precision.HIGHEST
    )
    split_dft = meta.split in (True, 4) and not meta.fast
    split_conv = meta.split in (True, 4, "conv") and not meta.fast
    four_pass = meta.split == 4 and not meta.fast

    def split_dot(x, c_hi, c_lo):
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (
            jnp.dot(x_hi, c_hi, preferred_element_type=jnp.float32)
            + jnp.dot(x_hi, c_lo, preferred_element_type=jnp.float32)
            + jnp.dot(x_lo, c_hi, preferred_element_type=jnp.float32)
        )
        if four_pass:
            acc = acc + jnp.dot(x_lo, c_lo, preferred_element_type=jnp.float32)
        return acc

    def _any_dot(x, c, split):
        """x @ c; c is (hi, lo) when that GEMM is split."""
        if split:
            return split_dot(x, c[0], c[1])
        return jnp.dot(x, c, preferred_element_type=jnp.float32, precision=prec)

    def big_dot(x, c):
        return _any_dot(x, c, split_dft)

    def conv_dot(x, c):
        return _any_dot(x, c, split_conv)

    def kernel(*kargs):
        # pipelined mode: the slab arrives through TWO BlockSpec-managed
        # VMEM inputs (main tile + trailing halo rows of the same array)
        # that Mosaic double-buffers across grid programs — measured 1.17x
        # over the manual serialized DMA; otherwise one ANY-space input is
        # DMA'd manually.
        if pipelined:
            main_ref, halo_ref = kargs[:2]
            args = kargs[2:]
        else:
            frames_hbm = kargs[0]
            args = kargs[1:]
        # unpack operands; bf16 operands arrive pre-sliced/pre-split (bf16
        # slices/casts at odd sublane offsets mis-lower on hardware, so
        # every bf16 ref here is read whole and already aligned)
        idx = 0
        if split_dft and input_mode == "raw":
            np_ = len(parts)
            c_parts = [(args[2 * j], args[2 * j + 1]) for j in range(np_)]
            idx = 2 * np_
            c_part = lambda j: (c_parts[j][0][:], c_parts[j][1][:])
        elif split_dft:
            c_hi, c_lo = args[:2]
            idx = 2
            c_full = lambda: (c_hi[:], c_lo[:])
        else:
            c_packed = args[0]
            idx = 1
            c_part = lambda j: c_packed[parts[j][0] : parts[j][1], :]
            c_full = lambda: c_packed[:]
        if split_conv:
            w1g_hi, w1g_lo = args[idx : idx + 2]
            idx += 2
            w1g_full = lambda: (rd(w1g_hi), rd(w1g_lo))
        else:
            w1g = args[idx]
            idx += 1
            w1g_full = lambda: rd(w1g)
        c1 = args[idx]
        rest = args[idx + 1 :]
        mids = [(rest[2 * i], rest[2 * i + 1]) for i in range(n_mids)]
        if pipelined:
            out_a, out_c, out_ref, fvmem = rest[2 * n_mids :]
        else:
            out_a, out_c, out_ref, fvmem, sem = rest[2 * n_mids :]

        # ---- stages shared VERBATIM by the raw / rawk / phase_split
        # branches (pure extractions — the traced op order is identical,
        # so all three stay bit-exact with each other by construction) ----

        def spect_scale(big):
            """DFT-GEMM output [R, n_big] -> (scaled spectrogram, sq0).

            packed: re at lanes [0, b), im at lanes [64, 64+b); one
            64-lane roll merges re^2+im^2 (lanes >= 64 hold a duplicate
            of [0, 64), which the zero rows of w1g annihilate). sq0 is
            that per-lane square (None when unpacked) — the
            linear+packed l2 norm sums it directly. Padded bins are
            masked to 0 under log/db so they don't poison the matmul
            (SyllableDetector.swift:183-212).
            """
            if meta.packed:
                sq0 = big * big
                sq = sq0 + pltpu.roll(sq0, 64, axis=1)
            else:
                b_pad = meta.b_pad
                re = big[:, :b_pad]
                im = big[:, b_pad:]
                sq0 = None
                sq = re * re + im * im
            mag = jnp.sqrt(sq)
            if scaling == "linear":
                return mag, sq0
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
            if scaling == "db":
                s = (20.0 / np.float32(np.log(10.0))) * jnp.log(mag)
            else:
                s = jnp.log(mag)
            return jnp.where(lane_ids < meta.b, s, 0.0), sq0

        def row_sq(scaled, sq0):
            """Per-row l2 accumulator term. In the linear+packed case
            scaled's duplicate im lanes would double-count; sq0 holds
            exactly re^2+im^2 summed over the packed lanes."""
            if scaling == "linear" and meta.packed:
                return jnp.sum(sq0, axis=1, keepdims=True)
            return jnp.sum(scaled * scaled, axis=1, keepdims=True)

        def mlp_affine(acc, norm):
            """Tap-accumulated conv rows -> final outputs: optional l2
            normalization, hidden transfers, folded output affine."""
            if meta.has_l2:
                acc = acc / jnp.sqrt(norm)
            h = _transfer(acc + rd(c1), transfers[0])
            for (w, bb), name in zip(mids, transfers[1:]):
                h = _transfer(
                    jnp.dot(
                        h, rd(w), preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                    + rd(bb),
                    name,
                )
            return h * rd(out_a) + rd(out_c)

        if input_mode == "rawk":
            # MULTI-HOP-PER-ROW path: k hop-rows per slab row. Each frame's
            # standard parts live at constant (row_off, col) offsets per
            # residue class rho = frame % k, so the rebuild stays static
            # slices and per-frame GEMM accumulation order matches the k=1
            # kernel exactly (bit-exact outputs).
            if pipelined:
                fvmem[0:q_sz, :] = main_ref[:, :]
                fvmem[q_sz:rows2d_k, :] = halo_ref[:, :]
            else:
                i = pl.program_id(0)
                copy = pltpu.make_async_copy(
                    frames_hbm.at[pl.ds(i * q_sz, rows2d_k)],
                    fvmem.at[pl.ds(0, rows2d_k)],
                    sem,
                )
                copy.start()
                copy.wait()
            qh = q_sz + h_q
            n_big = meta.b_pad if meta.packed else 2 * meta.b_pad
            convs = []
            rowsqs = []
            for rho in range(k):
                big = jnp.zeros((qh, n_big), jnp.float32)
                for lo, hi, row_off, col in parts_k[rho]:
                    big = big + big_dot(
                        fvmem[row_off : row_off + qh, col : col + (hi - lo)],
                        c_packed[lo:hi, :],
                    )
                scaled, sq0 = spect_scale(big)
                convs.append(conv_dot(scaled, w1g_full()))
                if meta.has_l2:
                    rowsqs.append(row_sq(scaled, sq0))
            hs = meta.hs
            for rho in range(k):
                # output frame m = q*k + rho consumes conv tap t from
                # residue (rho+t) % k at row shift (rho+t) // k
                acc = jnp.zeros((q_sz, hs), jnp.float32)
                norm = jnp.zeros((q_sz, 1), jnp.float32)
                for t in range(t_range):
                    rr = (rho + t) % k
                    sh = (rho + t) // k
                    acc = acc + convs[rr][sh : sh + q_sz, t * hs : (t + 1) * hs]
                    if meta.has_l2:
                        norm = norm + rowsqs[rr][sh : sh + q_sz, :]
                result = mlp_affine(acc, norm)
                if out_t:
                    # [o_pad, q] block slot: q lanes pad to 128 (2x at
                    # q=64) instead of o_pad 8 -> 128 (16x)
                    out_ref[0, rho, :, :] = jnp.transpose(result)
                else:
                    out_ref[0, rho, :, :] = result
            return

        # batched channels ride the SAME flat 2-D slab layout as the
        # single-stream kernel (channel ch's rows at [ch*ch_rows, ...)) —
        # 3-D .at[ch] HBM slicing measured ~25% slower DMA. Pipelined mode
        # addresses via the BlockSpec index maps instead (base unused).
        batched = out3d or ch_rows is not None
        if ch_rows is not None:
            ch = pl.program_id(0)
            i = pl.program_id(1)
            base = ch * ch_rows + i * tile
        elif not pipelined:
            i = pl.program_id(0)
            base = i * tile
        if input_mode == "raw":
            if pipelined:
                # rebuild the contiguous slab in scratch: two stores at
                # 8-aligned sublane offsets (mismatched-offset slices
                # cannot be concatenated, stores can)
                fvmem[0:tile, :] = main_ref[:, :]
                fvmem[tile:rows2d, :] = halo_ref[:, :]
            else:
                copy = pltpu.make_async_copy(
                    frames_hbm.at[pl.ds(base, rows2d)],
                    fvmem.at[pl.ds(0, rows2d)],
                    sem,
                )
                copy.start()
                copy.wait()
            if phase_split > 1:
                # PHASE-SPLIT A/B (r3 verdict #5): run the full
                # DFT-GEMM -> VPU mag -> conv-GEMM -> MLP pipeline over
                # tile/S row sub-blocks instead of whole-tile phases. The
                # sub-blocks are data-independent, so Mosaic's scheduler
                # can overlap sub-block s's VPU phase with s+1's MXU
                # phase; cost = the halo recompute per sub-block (~2%).
                ts = tile // phase_split
                n_big = meta.b_pad if meta.packed else 2 * meta.b_pad
                hs = meta.hs
                for s in range(phase_split):
                    r0 = s * ts
                    big = jnp.zeros((ts + halo, n_big), jnp.float32)
                    for j, (lo, hi, clo) in enumerate(parts):
                        big = big + big_dot(
                            fvmem[r0 + j : r0 + j + ts + halo,
                                  clo : clo + (hi - lo)],
                            c_part(j),
                        )
                    scaled, sq0 = spect_scale(big)
                    conv = conv_dot(scaled, w1g_full())
                    if meta.has_l2:
                        rowsq = row_sq(scaled, sq0)
                    acc = jnp.zeros((ts, hs), jnp.float32)
                    norm = jnp.zeros((ts, 1), jnp.float32)
                    for t in range(t_range):
                        acc = acc + conv[t : t + ts, t * hs : (t + 1) * hs]
                        if meta.has_l2:
                            norm = norm + rowsq[t : t + ts, :]
                    result = mlp_affine(acc, norm)
                    if batched:
                        out_ref[0, r0 : r0 + ts, :] = result
                    else:
                        out_ref[r0 : r0 + ts, :] = result
                return

            # frames never materialize: frames = concat_j(part_j) along
            # columns, so frames @ C = sum_j part_j @ C[rows of part j] —
            # the band DFT decomposes into one GEMM per slab part. When
            # splitting, the part GEMMs run over the full (aligned) slab and
            # the one-row part shift moves to the fp32 GEMM *output* —
            # sublane-offset slices are only safe in fp32 on hardware.
            n_big = meta.b_pad if meta.packed else 2 * meta.b_pad
            big = jnp.zeros((tile + halo, n_big), jnp.float32)
            for j, (lo, hi, clo) in enumerate(parts):
                if split_dft:
                    bigj = big_dot(
                        fvmem[0:rows2d, clo : clo + (hi - lo)], c_part(j)
                    )
                    big = big + bigj[j : j + tile + halo]
                else:
                    big = big + big_dot(
                        fvmem[j : j + tile + halo, clo : clo + (hi - lo)],
                        c_part(j),
                    )
        else:
            copy = pltpu.make_async_copy(
                frames_hbm.at[pl.ds(base, rows)],
                fvmem.at[pl.ds(0, rows)],
                sem,
            )
            copy.start()
            copy.wait()
            # slice back the real window columns (scratch lanes are padded
            # to a 128 multiple for the DMA; in-VMEM fp32 slices are free)
            f = fvmem[pl.ds(0, tile + halo), 0 : spec.window_length]
            # one GEMM computes re and im lane blocks together
            big = big_dot(f, c_full())

        scaled, sq0 = spect_scale(big)

        # all T conv taps in one GEMM; tap t lives in 8-lane block t
        conv = conv_dot(scaled, w1g_full())  # [rows, T*hs]
        if meta.has_l2:
            rowsq = row_sq(scaled, sq0)

        hs = meta.hs
        acc = jnp.zeros((tile, hs), jnp.float32)
        norm = jnp.zeros((tile, 1), jnp.float32)
        for t in range(t_range):
            acc = acc + conv[t : t + tile, t * hs : (t + 1) * hs]
            if meta.has_l2:
                norm = norm + rowsq[t : t + tile, :]

        result = mlp_affine(acc, norm)
        if out_t:
            # TRANSPOSED output block [o_pad, tile]: o_pad rides the
            # sublane dim (pads 8 -> 8, not 8 lanes -> 128) so the HBM
            # output array shrinks 16x — what lets the giant distinct
            # capacity shapes fit at k=1 speed. Mosaic lowers the small
            # [tile, 8] transpose exactly (measured bit-exact).
            out_ref[0, :, :] = jnp.transpose(result)
        elif batched:
            out_ref[0, :, :] = result
        else:
            out_ref[:, :] = result

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "meta", "grid", "tile", "n_evals", "interpret", "input_mode",
        "channels", "ch_rows", "per_channel", "flat_blocks_per_ch",
        "hops_per_row", "phase_split", "out_t",
    ),
)
def _fused_call(
    spec, meta, data, operands, grid, n_evals, tile, interpret, input_mode,
    channels=None, ch_rows=None, per_channel=False, flat_blocks_per_ch=None,
    hops_per_row=1, phase_split=1, out_t=False,
):
    if out_t and (
        input_mode not in ("raw", "rawk")
        or channels is not None
        or phase_split > 1
    ):
        raise ValueError(
            "out_t (transposed output) supports only the flat/single-"
            "stream raw paths"
        )
    if phase_split > 1:
        if input_mode != "raw" or meta.split or meta.fast:
            raise ValueError(
                "phase_split > 1 supports only the full-fidelity raw path"
            )
        if tile % (8 * phase_split):
            raise ValueError(
                f"tile {tile} must divide by 8*phase_split "
                f"({8 * phase_split})"
            )
    # per_channel operands index either the channel grid dim (channels
    # mode) or, in FLAT layout, the 1-D grid position divided by the
    # channel's block count (flat_blocks_per_ch)
    if per_channel and channels is None and not flat_blocks_per_ch:
        # a plain assert would vanish under `python -O`, after which the
        # operand BlockSpec index lambdas mismatch the grid arity and fail
        # obscurely inside Mosaic
        raise ValueError(
            "per_channel calls need channels= or flat_blocks_per_ch="
        )
    halo = spec.time_range - 1
    window = spec.window_length

    split_dft = meta.split in (True, 4) and not meta.fast
    split_conv = meta.split in (True, 4, "conv") and not meta.fast
    if split_dft or split_conv:
        # pre-split the big GEMM constants into bf16 hi/lo halves once per
        # launch (outside the kernel, so grid programs reuse them). In raw
        # mode the DFT matrix is additionally pre-sliced per slab part:
        # bf16 slices at odd sublane offsets mis-lower on hardware.
        def hi_lo(c):
            c = jnp.asarray(c, jnp.float32)
            hi = c.astype(jnp.bfloat16)
            lo = (c - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        if split_dft and input_mode == "raw":
            parts = _raw_geometry(spec, tile)[6]
            c_ops = []
            for lo_row, hi_row, _ in parts:
                c_ops.extend(hi_lo(operands[0][lo_row:hi_row]))
        elif split_dft:
            c_ops = list(hi_lo(operands[0]))
        else:
            c_ops = [operands[0]]
        w_ops = list(hi_lo(operands[1])) if split_conv else [operands[1]]
        operands = (*c_ops, *w_ops, *operands[2:])
        n_shared = len(c_ops)
    else:
        n_shared = 1  # only the spec-derived DFT matrix is channel-shared

    # raw path: BlockSpec-pipelined slab (Mosaic double-buffers the
    # HBM->VMEM traffic across grid programs — 1.17x over manual DMA).
    # BlockSpec-managed blocks do NOT need the manual-DMA 128-multiple lane
    # rule, so the data keeps its natural hop-lane width — no 132->256 lane
    # pad at all (another ~1.35x end-to-end, bit-exact). Batched pipelining
    # additionally needs ch_rows divisible by tile (the caller pads).
    if input_mode == "rawk":
        if meta.fast or meta.split:
            raise ValueError(
                "hops_per_row > 1 supports only the full-fidelity tier "
                "(no fast/split)"
            )
        pipe = _pipelined_geometry_k(spec, tile, hops_per_row) is not None
    else:
        pipe = (
            input_mode == "raw"
            and _pipelined_geometry(spec, tile) is not None
            and (
                channels is None
                or (ch_rows is not None and ch_rows % tile == 0)
            )
        )

    kernel = _make_kernel(
        spec, meta, tile, input_mode,
        ch_rows=None if pipe else ch_rows, pipelined=pipe,
        out3d=channels is not None, per_channel=per_channel,
        hops_per_row=hops_per_row, phase_split=phase_split, out_t=out_t,
    )

    # operand specs: channel-stacked net operands (everything after the
    # shared DFT matrices when per_channel) ride BlockSpec blocks of
    # (1, ...) indexed by the channel grid dim — Mosaic re-fetches only
    # when the channel changes (the tile dim iterates innermost)
    def _op_spec(j, op):
        if per_channel and j >= n_shared:
            zeros = (0,) * (op.ndim - 1)
            if flat_blocks_per_ch is not None:
                idx = (
                    lambda i, _z=zeros, _b=flat_blocks_per_ch: (i // _b, *_z)
                )
            else:
                idx = lambda ch, i, _z=zeros: (ch, *_z)
            return pl.BlockSpec(
                (1, *op.shape[1:]), idx, memory_space=pltpu.VMEM
            )
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    op_specs = [_op_spec(j, op) for j, op in enumerate(operands)]
    if input_mode == "rawk":
        _, _, L, q_sz, _, rows2d_k, _ = _raw_geometry_k(
            spec, tile, hops_per_row
        )
        lanes = L if pipe else _round_up(L, LANE)
        scratches = [pltpu.VMEM((rows2d_k, lanes), jnp.float32)]
    elif input_mode == "raw":
        _, hop, hop_pad, _, _, rows2d, _ = _raw_geometry(spec, tile)
        lanes = hop if pipe else hop_pad
        scratches = [pltpu.VMEM((rows2d, lanes), jnp.float32)]
    else:
        scratches = [
            pltpu.VMEM(
                (_round_up(tile + halo, 8), _round_up(window, LANE)),
                jnp.float32,
            )
        ]

    if pipe and input_mode == "rawk":
        halo_rows, step = _pipelined_geometry_k(spec, tile, hops_per_row)
        in_specs = [
            pl.BlockSpec((q_sz, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (halo_rows, L),
                lambda i, _s=step: ((i + 1) * _s, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + op_specs
        inputs = (data, data, *operands)
    elif pipe:
        halo_rows, step = _pipelined_geometry(spec, tile)
        if channels is None:
            main_map = lambda i: (i, 0)
            halo_map = lambda i, _s=step: ((i + 1) * _s, 0)
        else:
            blocks_per_ch = ch_rows // tile
            main_map = lambda ch, i, _b=blocks_per_ch: (ch * _b + i, 0)
            halo_map = (
                lambda ch, i, _b=blocks_per_ch, _s=step:
                ((ch * _b + i + 1) * _s, 0)
            )
        in_specs = [
            pl.BlockSpec((tile, hop), main_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (halo_rows, hop), halo_map, memory_space=pltpu.VMEM
            ),
        ] + op_specs
        inputs = (data, data, *operands)
    else:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + op_specs
        inputs = (data, *operands)

    if input_mode == "rawk":
        # residue-major output: program i writes result rows for frames
        # i*tile + q*k + rho into [i, rho, q]; the host-side transpose to
        # frame order is an 8-lane-wide copy, negligible next to the slab.
        # out_t flips the block to [o_pad, q] (q-lane pad instead of the
        # o_pad 16x lane pad) — the deep-capacity combination.
        k = hops_per_row
        grid_dims = (grid,)
        dims = (k, meta.o_pad, q_sz) if out_t else (k, q_sz, meta.o_pad)
        out_shape = jax.ShapeDtypeStruct((grid, *dims), jnp.float32)
        out_spec = pl.BlockSpec(
            (1, *dims), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    elif channels is not None:
        # batched: flat 2-D slab, channel ch's rows at [ch*ch_rows, ...);
        # grid (channels, tiles-per-channel)
        grid_dims = (channels, grid)
        out_shape = jax.ShapeDtypeStruct(
            (channels, grid * tile, meta.o_pad), jnp.float32
        )
        out_spec = pl.BlockSpec(
            (1, tile, meta.o_pad), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        )
    elif out_t:
        # transposed output: o_pad on sublanes, tile on lanes — the HBM
        # output array is 16x smaller than the [rows, o_pad] layout
        grid_dims = (grid,)
        out_shape = jax.ShapeDtypeStruct(
            (grid, meta.o_pad, tile), jnp.float32
        )
        out_spec = pl.BlockSpec(
            (1, meta.o_pad, tile), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        grid_dims = (grid,)
        out_shape = jax.ShapeDtypeStruct((grid * tile, meta.o_pad), jnp.float32)
        out_spec = pl.BlockSpec(
            (tile, meta.o_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        grid=grid_dims,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratches
        + ([] if pipe else [pltpu.SemaphoreType.DMA(())]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * grid * tile * window * meta.b_pad * 2
            + 2 * grid * tile * meta.b_pad * spec.time_range * meta.hs,
            bytes_accessed=grid * tile * window * 4,
            transcendentals=grid * tile * meta.hs,
        ),
    )(*inputs)
    if input_mode == "rawk":
        if out_t:
            # [grid, k, o_pad, q] -> frame order. The transpose must keep
            # k*o_pad (>= 64) as the LANE dim: transposing after slicing
            # outputs to 1 lane materializes a [N, 1] intermediate that
            # (8,128)-tiles at 128x — measured 8.7 GiB at the 16384-eval
            # capacity shape, the difference between fitting and OOM.
            k = hops_per_row
            out = out.reshape(grid, k * meta.o_pad, q_sz)
            out = jnp.transpose(out, (0, 2, 1))  # [grid, q, k*o_pad]
            out = out.reshape(grid * tile, meta.o_pad)
            return out[:n_evals, : spec.net.outputs]
        # [grid, k, q, o_pad] -> frame-ordered [grid*tile, outputs]
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
            grid * tile, meta.o_pad
        )
        return out[:n_evals, : spec.net.outputs]
    if out_t:
        # [grid, o_pad, tile]: slice the real outputs FIRST (o_pad 8 ->
        # n_out, usually 1) so the frame-order transpose never
        # re-materializes the 16x-padded layout at capacity shapes
        out = out[:, : spec.net.outputs, :]
        out = jnp.transpose(out, (0, 2, 1)).reshape(
            grid * tile, spec.net.outputs
        )
        return out[:n_evals]
    if channels is not None:
        return out[:, :n_evals, : spec.net.outputs]
    return out[:n_evals, : spec.net.outputs]


from collections import OrderedDict

# bounded LRU so long-lived servers don't accumulate folds for dead configs
_fold_cache: "OrderedDict" = OrderedDict()
_FOLD_CACHE_MAX = 16


def _folded(spec: DetectorSpec, params: dict, pack: bool | None = None):
    """Memoized fold_constants. The cache holds a strong reference to params
    so its id cannot be recycled by a different dict after garbage
    collection; bounded LRU keeps long-lived servers from leaking."""
    key = (spec, id(params), pack)
    if key not in _fold_cache or _fold_cache[key][2] is not params:
        _fold_cache[key] = (*fold_constants(spec, params, pack=pack), params)
        while len(_fold_cache) > _FOLD_CACHE_MAX:
            _fold_cache.popitem(last=False)
    else:
        _fold_cache.move_to_end(key)
    operands, meta, _ = _fold_cache[key]
    return operands, meta


# device-resident copies of folded operands, memoized per (operand
# identity chain, device). Live drains call the flat path EAGERLY every
# few milliseconds; numpy operands passed to the kernel re-transfer the
# whole stacked fold host->device on every call (~350 MB per drain at
# 1024 distinct lanes — more bytes than the audio itself). The cache
# holds concrete jax.Arrays ONLY: inputs are the _fold_cache's numpy
# outputs, and when the flat path is itself being TRACED (a caller's
# jit/scan — e.g. the tuner's scanned measurement), device_put yields
# tracers and _device_operands refuses to cache (the CLAUDE.md
# tracer-leak trap, hit for real in r5).
_dev_operand_cache: "OrderedDict" = OrderedDict()
_DEV_OPERAND_CACHE_MAX = 8


def _device_operands(operands):
    import jax as _jax

    try:
        dev = _jax.local_devices()[0]
    except Exception:  # backend not ready: pass numpy through
        return operands
    key = (tuple(id(o) for o in operands), dev)
    hit = _dev_operand_cache.get(key)
    if hit is not None and len(hit[0]) == len(operands) and all(
        a is b for a, b in zip(hit[0], operands)
    ):
        _dev_operand_cache.move_to_end(key)
        return hit[1]
    put = tuple(_jax.device_put(o, dev) for o in operands)
    if any(isinstance(p, _jax.core.Tracer) for p in put):
        # called under an ACTIVE trace (a caller jitted the flat path):
        # device_put yields tracers — caching one leaks it out of the
        # trace (the CLAUDE.md trap; the tuner's scanned measurement hit
        # exactly this). Hand back the numpy operands: the trace embeds
        # them as constants, identical to the pre-cache behavior, and
        # the dead puts are DCE'd.
        return operands
    # strong ref to the source operands so their ids can't be recycled
    _dev_operand_cache[key] = (operands, put)
    while len(_dev_operand_cache) > _DEV_OPERAND_CACHE_MAX:
        _dev_operand_cache.popitem(last=False)
    return put


def fold_constants_stacked(
    spec: DetectorSpec, params_list, pack: bool | None = None
):
    """Fold DISTINCT per-channel networks into channel-stacked kernel
    operands: (shared DFT matrix, then each net operand with a leading
    channel axis). All nets must fit ``spec`` (one geometry — the same
    contract as models.neural_net.stack_params); the folded operands then
    ride the flagship fused kernel with per-channel BlockSpec indexing,
    the reference's one-net-per-audio-channel deployment
    (Processor.swift:57-59, ViewControllerProcessor.swift:222-276)."""
    if not params_list:
        raise ValueError("params_list must contain at least one network")
    folds = [fold_constants(spec, p, pack=pack) for p in params_list]
    meta = folds[0][1]
    if any(f[1] != meta for f in folds[1:]):
        raise ValueError(
            "per-channel networks must share one fused geometry "
            "(same layer sizes / processing chain under one DetectorSpec)"
        )
    shared = folds[0][0][0]  # DFT matrix: spec-derived, identical per net
    stacked = tuple(
        np.stack([f[0][j] for f in folds])
        for j in range(1, len(folds[0][0]))
    )
    return (shared, *stacked), meta


def _folded_stacked(spec: DetectorSpec, params_list, pack: bool | None = None):
    """Memoized fold_constants_stacked (same LRU as :func:`_folded`)."""
    params_list = tuple(params_list)
    key = (spec, tuple(id(p) for p in params_list), pack)
    hit = _fold_cache.get(key)
    if hit is None or len(hit[2]) != len(params_list) or any(
        a is not b for a, b in zip(hit[2], params_list)
    ):
        _fold_cache[key] = (
            *fold_constants_stacked(spec, params_list, pack=pack),
            params_list,
        )
        while len(_fold_cache) > _FOLD_CACHE_MAX:
            _fold_cache.popitem(last=False)
    else:
        _fold_cache.move_to_end(key)
    operands, meta, _ = _fold_cache[key]
    return operands, meta


def fused_input_samples(
    spec: DetectorSpec, n_evals: int, tile: int = 256, batched: bool = False
) -> int:
    """Samples per stream at which the fused raw path does ZERO host-side
    padding for ``n_evals`` evaluations: the slab reshape becomes a pure
    view and the tail zero-concat (a whole-input copy, ~10% of iteration
    time at the headline shape) disappears. Pass the matching ``n_evals``
    explicitly to :func:`fused_offline_outputs` /
    :func:`fused_batch_offline_outputs`."""
    grid = max(1, -(-n_evals // tile))
    _, hop, _, _, _, rows2d, _ = _raw_geometry(spec, tile)
    total_rows = (grid - 1) * tile + rows2d
    if batched and _pipelined_geometry(spec, tile) is not None:
        total_rows = _round_up(total_rows, tile)
    return total_rows * hop


def fused_offline_outputs(
    spec: DetectorSpec,
    params: dict,
    x: jax.Array,
    tile: int = 256,
    interpret: bool | None = None,
    input_mode: str = "raw",
    fast: bool = False,
    split: bool | None = None,
    packed: bool | None = None,
    n_evals: int | None = None,
    phase_split: int = 1,
    out_t: bool = False,
) -> jax.Array:
    """Whole-signal detection through the fused kernel: [n] -> [E, outputs].

    ``input_mode='raw'`` (default) ships raw samples to the kernel and
    rebuilds the overlapping windows in VMEM — no HBM frames matrix at all;
    ``'frames'`` pre-gathers hop-strided windows with XLA. ``split``/
    ``packed`` override the GEMM precision ladder and re+im lane packing
    (for A/B benchmarking). ``interpret=None`` auto-selects interpret mode
    on CPU backends (Mosaic is TPU-only). Falls back to the unfused XLA
    path for unsupported configs.

    ``n_evals`` overrides the evaluation count derived from ``len(x)``
    (must not exceed it). With ``len(x) == fused_input_samples(spec,
    n_evals, tile)`` the host-side tail pad is skipped entirely.

    ``out_t`` writes TRANSPOSED [o_pad, tile] kernel output blocks (16x
    smaller HBM output, bit-exact, +4-8% at batched scale — see
    :func:`fused_flat_batch_offline_outputs`). Only valid with
    ``input_mode='raw'`` and ``phase_split=1``; other combinations
    raise ``ValueError``. Single-stream throughput is neutral, so it
    stays opt-in here while the flat batched path defaults to it.
    """
    if not fusable(spec):
        from syllable_detector_tpu.models.detector import offline_outputs

        if x.ndim == 2:
            raise ValueError(
                "pre-slabbed input requires a fusable spec; pass 1-D samples"
            )
        out = offline_outputs(spec, params, x)
        # the fallback honors the same n_evals contract as the kernel
        # path: callers size downstream buffers to it
        if n_evals is not None:
            if n_evals > out.shape[0]:
                raise ValueError(
                    f"n_evals={n_evals} needs more than {x.shape[0]} samples"
                )
            out = out[:n_evals]
        return out
    if interpret is None:
        interpret = jax.local_devices()[0].platform == "cpu"

    operands, meta = _folded(spec, params, pack=packed)
    operands = _device_operands(operands)
    if fast:
        meta = meta._replace(fast=True)
    if split is not None:
        meta = meta._replace(split=split)

    pre_slabbed = x.ndim == 2
    if pre_slabbed:
        # [total_rows, hop] input (the fused_input_samples layout reshaped
        # host-side): device-puts directly in the kernel's tiled layout, so
        # the in-graph 1-D->2-D relayout COPY disappears (measured ~15% of
        # iteration time at the headline shape)
        if input_mode != "raw":
            raise ValueError("pre-slabbed input requires input_mode='raw'")
        if n_evals is None:
            raise ValueError("pre-slabbed input needs an explicit n_evals")
        n = x.shape[0] * x.shape[1]
    else:
        n = x.shape[0]
    f = num_frames(n, spec.window_length, spec.window_overlap)
    max_evals = f - spec.time_range + 1
    if n_evals is None:
        n_evals = max_evals
    elif n_evals > max_evals:
        raise ValueError(f"n_evals={n_evals} needs more than {n} samples")
    if n_evals <= 0:
        return jnp.zeros((0, spec.net.outputs), jnp.float32)

    halo = spec.time_range - 1
    grid = max(1, -(-n_evals // tile))

    if input_mode == "raw":
        # hop-strided 2-D view of the raw samples; frames rebuilt in VMEM.
        # The pipelined path keeps the natural hop-lane width (BlockSpec
        # blocks need no lane alignment); only the manual-DMA fallback
        # lane-pads to a 128 multiple.
        _, hop, hop_pad, _, _, rows2d, _ = _raw_geometry(spec, tile)
        total_rows = (grid - 1) * tile + rows2d
        total = total_rows * hop
        x = jnp.asarray(x, jnp.float32)
        if pre_slabbed:
            if x.shape != (total_rows, hop):
                raise ValueError(
                    f"pre-slabbed input must have shape ({total_rows}, {hop})"
                    f" (= fused_input_samples reshaped); got {x.shape}"
                )
            data = x
        else:
            if total > n:
                x = jnp.concatenate([x, jnp.zeros(total - n, jnp.float32)])
            data = x[:total].reshape(total_rows, hop)
        pipe = _pipelined_geometry(spec, tile) is not None
        if hop_pad != hop and not pipe:
            data = jnp.pad(data, ((0, 0), (0, hop_pad - hop)))
    else:
        # pre-gathered frames in HBM
        rows_needed = (grid - 1) * tile + _round_up(tile + halo, 8)
        frames = frame_signal(x, f, spec.window_length, spec.window_overlap)
        pad_rows = rows_needed - f
        if pad_rows > 0:
            frames = jnp.concatenate(
                [frames, jnp.zeros((pad_rows, frames.shape[1]), frames.dtype)]
            )
        # manual-DMA lane rule: the HBM array's lane dim must be a 128
        # multiple (hit only by window_length < 128 — config windows are
        # powers of two); the kernel reads back the real window columns
        window_pad = _round_up(spec.window_length, LANE)
        if window_pad != spec.window_length:
            frames = jnp.pad(
                frames, ((0, 0), (0, window_pad - spec.window_length))
            )
        data = frames

    return _fused_call(
        spec, meta, data, operands, grid, n_evals, tile, interpret,
        input_mode, phase_split=phase_split, out_t=out_t,
    )


def _batch_core(
    spec: DetectorSpec,
    meta: FusedMeta,
    operands,
    xs: jax.Array,
    tile: int,
    interpret: bool,
    n_evals: int,
    per_channel: bool = False,
) -> jax.Array:
    """Slab layout + kernel launch for a [C, n] batch. Fully traceable
    (plain jnp ops into the jitted ``_fused_call``), so it can run under
    ``lax.map`` / ``shard_map`` with traced ``operands``/``xs``."""
    c, n = xs.shape
    grid = max(1, -(-n_evals // tile))
    _, hop, hop_pad, _, _, rows2d, _ = _raw_geometry(spec, tile)
    total_rows = (grid - 1) * tile + rows2d
    xs = jnp.asarray(xs, jnp.float32)
    # flat 2-D slab: channel ch's rows occupy [ch*ch_rows, (ch+1)*ch_rows) —
    # the same layout and DMA arithmetic as the single-stream kernel
    # (3-D .at[ch] slicing measured slower). When the pipelined geometry is
    # available, pad ch_rows up to a whole number of tile blocks (BlockSpec
    # index maps need integral block indices) and keep the natural hop-lane
    # width — no 128-multiple lane pad.
    pipe = _pipelined_geometry(spec, tile) is not None
    if pipe:
        ch_rows = _round_up(total_rows, tile)
    else:
        ch_rows = total_rows
    total = ch_rows * hop
    if total > n:
        xs = jnp.concatenate([xs, jnp.zeros((c, total - n), jnp.float32)], axis=1)
    data = xs[:, :total].reshape(c * ch_rows, hop)
    if hop_pad != hop and not pipe:
        data = jnp.pad(data, ((0, 0), (0, hop_pad - hop)))

    return _fused_call(
        spec, meta, data, operands, grid, n_evals, tile, interpret, "raw",
        channels=c, ch_rows=ch_rows, per_channel=per_channel,
    )


def fused_batch_offline_outputs(
    spec: DetectorSpec,
    params,
    xs: jax.Array,
    tile: int | None = None,
    interpret: bool | None = None,
    fast: bool = False,
    split: bool | None = None,
    packed: bool | None = None,
    n_evals: int | None = None,
    slab_channels: int | None = 64,
    layout: str = "flat",
) -> jax.Array:
    """[C, n] streams -> [C, E, outputs] through the fused kernel.

    ``params`` is either ONE shared net (a params dict) or a sequence of C
    DISTINCT per-channel nets — the reference's deployment loads a different
    network per audio channel (Processor.swift:57-59,
    ViewControllerProcessor.swift:222-276); distinct nets must share one
    geometry (the stack_params contract).

    ``layout='flat'`` (default) routes through
    :func:`fused_flat_batch_offline_outputs` — channels as consecutive row
    ranges of ONE slab through the single-stream kernel, measured r3 at
    93M windows/s shared / 80M distinct vs the channel-grid kernel's
    50-69M. ``layout='grid'`` keeps the channel-grid kernel (the channel
    axis as a leading grid dimension; ``slab_channels`` bounds launch
    width via ``lax.map`` slabs) — also used automatically for the
    ``fast``/``split``/``packed`` diagnostic tiers.
    """
    distinct = isinstance(params, (list, tuple))
    c, n = xs.shape
    if distinct and len(params) != c:
        raise ValueError(
            f"{len(params)} per-channel networks for {c} channels"
        )
    if (
        layout == "flat"
        and not fast
        and split is None
        and packed is None
        and fusable(spec)
    ):
        ne = n_evals
        if ne is None:
            f = num_frames(n, spec.window_length, spec.window_overlap)
            ne = f - spec.time_range + 1
        if ne > 0:
            # flat tile: an explicit tile= wins; else a tune-cache entry
            # for this (device, geometry, workload) bucket (see
            # tuning.py); else the measured v5e defaults — 2048 shared
            # (r2 sweep, reconfirmed by the r5 on-chip tune: 167.8M),
            # and for distinct nets 1024 at high channel counts (r4
            # out_t sweep at c=1024: t512 110.8M / t1024 113.3M / t2048
            # 103.7M) but 512 at small ones (r5 on-chip tune at c=64:
            # t512 87.5M / t1024 82.2M — matching the r3 hand-sweep).
            # Always clamped down for small drains so a live bucket of
            # 8-128 evals doesn't compute a full 2048-row tile per
            # channel.
            if tile is not None:
                flat_tile = tile
            else:
                from syllable_detector_tpu.tuning import tuned_flat_tile

                tuned = tuned_flat_tile(spec, c, ne, distinct)
                default = (
                    (512 if c <= 256 else 1024) if distinct else 2048
                )
                flat_tile = min(
                    tuned or default,
                    max(8, _round_up(ne, 8)),
                )
            # shapes whose padded flat footprint exceeds HBM fall back to
            # the memory-safe grid path (lax.map channel slabs) instead of
            # raising — 'batched is safe at any channel count' holds.
            # flat_admission is the ONE policy (k=1 -> k=8 -> grid),
            # shared with the mesh shard path; out_t=True explicitly: the
            # admission estimates assume the transposed output — keep
            # guard and launch structurally coupled
            interp = (
                interpret
                if interpret is not None
                else jax.local_devices()[0].platform == "cpu"
            )
            lay, hops = (
                ("flat", 1)
                if interp
                else flat_admission(spec, ne, c, flat_tile, distinct)
            )
            if lay == "flat":
                return fused_flat_batch_offline_outputs(
                    spec, params, xs, tile=flat_tile, interpret=interpret,
                    n_evals=n_evals, hops_per_row=hops, out_t=True,
                )
    if tile is None:
        tile = 256  # the grid kernel's historical default
    if not fusable(spec):
        from syllable_detector_tpu.models.detector import offline_outputs

        if distinct:
            from syllable_detector_tpu.models.neural_net import stack_params

            out = jax.vmap(lambda p, x: offline_outputs(spec, p, x))(
                stack_params(list(params)), xs
            )
        else:
            out = jax.vmap(lambda x: offline_outputs(spec, params, x))(xs)
        # same n_evals contract as the kernel path
        if n_evals is not None:
            if n_evals > out.shape[1]:
                raise ValueError(
                    f"n_evals={n_evals} needs more than {n} samples"
                )
            out = out[:, :n_evals]
        return out
    if interpret is None:
        interpret = jax.local_devices()[0].platform == "cpu"

    if distinct:
        operands, meta = _folded_stacked(spec, params, pack=packed)
    else:
        operands, meta = _folded(spec, params, pack=packed)
    operands = _device_operands(operands)
    if fast:
        meta = meta._replace(fast=True)
    if split is not None:
        meta = meta._replace(split=split)

    f = num_frames(n, spec.window_length, spec.window_overlap)
    max_evals = f - spec.time_range + 1
    if n_evals is None:
        n_evals = max_evals
    elif n_evals > max_evals:
        raise ValueError(f"n_evals={n_evals} needs more than {n} samples")
    if n_evals <= 0:
        return jnp.zeros((c, 0, spec.net.outputs), jnp.float32)

    return _batch_core_slabbed(
        spec, meta, operands, xs, tile, interpret, n_evals,
        per_channel=distinct, slab_channels=slab_channels,
    )


def _batch_core_slabbed(
    spec: DetectorSpec,
    meta: FusedMeta,
    operands,
    xs: jax.Array,
    tile: int,
    interpret: bool,
    n_evals: int,
    per_channel: bool = False,
    slab_channels: int | None = 64,
) -> jax.Array:
    """:func:`_batch_core` with channel slabbing: counts above
    ``slab_channels`` run as ``lax.map`` over slabs of the ONE compiled
    slab-wide kernel (with per_channel, the channel-stacked operands slab
    along with the streams; padding channels reuse net 0's operands and
    their outputs are sliced away). Traceable — used directly by the
    mesh-sharded fused path with traced shard operands."""
    c, n = xs.shape
    if slab_channels is None or c <= slab_channels:
        return _batch_core(
            spec, meta, operands, xs, tile, interpret, n_evals,
            per_channel=per_channel,
        )
    s = slab_channels
    c_pad = _round_up(c, s)
    xs = jnp.asarray(xs, jnp.float32)
    if c_pad > c:
        xs = jnp.concatenate([xs, jnp.zeros((c_pad - c, n), jnp.float32)])
    shared = operands[0]
    if per_channel:
        st = [
            jnp.concatenate(
                [op, jnp.broadcast_to(op[:1], (c_pad - c, *op.shape[1:]))]
            )
            if c_pad > c
            else jnp.asarray(op)
            for op in operands[1:]
        ]
        st_slabs = tuple(
            op.reshape(c_pad // s, s, *op.shape[1:]) for op in st
        )
        outs = jax.lax.map(
            lambda args: _batch_core(
                spec, meta, (shared, *args[1]), args[0], tile, interpret,
                n_evals, per_channel=True,
            ),
            (xs.reshape(c_pad // s, s, n), st_slabs),
        )
    else:
        outs = jax.lax.map(
            lambda sl: _batch_core(
                spec, meta, operands, sl, tile, interpret, n_evals,
            ),
            xs.reshape(c_pad // s, s, n),
        )
    return outs.reshape(c_pad, *outs.shape[2:])[:c]


# ---------------------------------------------------------------------------
# FLAT batched layout: channels as consecutive row ranges of ONE slab,
# processed by the single-stream kernel (no channel grid dimension)
# ---------------------------------------------------------------------------
# Measured r3 (tile 2048, c=64): the flat kernel runs 115M windows/s — the
# full single-stream rate — where the (c, grid) channel-grid kernel
# plateaus at ~50M and lax.map slabbing at ~69M. The plateau was never
# per-program overhead of the batched kernel body; it was the layout.
# Channel boundaries need NO tile alignment for shared nets: each
# channel's valid evals live at rows [ch*R, ch*R + n_evals) and the
# boundary evals whose windows read into the next channel's head are
# exactly the rows sliced away (<2% waste). Distinct nets need R to be a
# multiple of tile (so a program never straddles two channels' operands;
# the per-program operand block index is i // (R/tile)) — choose larger
# n_evals per channel to amortize the alignment pad.


def _flat_geometry(spec: DetectorSpec, n_evals: int, tile: int, distinct: bool):
    grid = max(1, -(-n_evals // tile))
    _, hop, hop_pad, _, _, rows2d, _ = _raw_geometry(spec, tile)
    halo_rows = rows2d - tile
    r = grid * tile + halo_rows  # per-channel rows incl. own sliding halo
    if distinct:
        r = _round_up(r, tile)
    return grid, hop, hop_pad, rows2d, halo_rows, r


def _flat_geometry_k(
    spec: DetectorSpec, n_evals: int, tile: int, distinct: bool, k: int
):
    """Flat-batch geometry in MULTI-HOP slab rows (k hop-rows per row of
    ``k*hop`` lanes). ``r_k`` is each channel's slab-row count (its frames
    span ``r_k * k`` hop-rows); distinct nets round it to a whole number
    of per-program blocks so no program straddles two channels' operands.
    """
    grid = max(1, -(-n_evals // tile))
    _, hop, L, q_sz, _, rows2d_k, _ = _raw_geometry_k(spec, tile, k)
    halo_rows = rows2d_k - q_sz
    r_k = grid * q_sz + halo_rows
    if distinct:
        r_k = _round_up(r_k, q_sz)
    return grid, hop, L, q_sz, rows2d_k, halo_rows, r_k


_FLAT_HBM_BUDGET = 11 << 30  # measured: 12.8G requirement OOMs a v5e chip
# headroom reserved off the device-reported HBM limit for XLA scratch,
# folded operands, and double-buffered pipeline blocks — calibrated so a
# v5e (bytes_limit ~15-16 GiB) lands at the measured 11 GiB safe point
_FLAT_HBM_HEADROOM = 4 << 30


_flat_hbm_budget_cache: int | None = None


def _flat_hbm_budget() -> int:
    """Usable HBM bytes for the flat slab + output, derived from the local
    device's reported memory limit (minus a fixed scratch headroom) so the
    guard scales across chip generations; falls back to the measured v5e
    constant when the backend exposes no memory stats (CPU/interpret).
    Memoized per process: the limit is constant for the process lifetime
    and the live-drain router consults it 2-3x per drain (a backend query
    through the tunneled runtime is measurable against the hop deadline)."""
    global _flat_hbm_budget_cache
    if _flat_hbm_budget_cache is not None:
        return _flat_hbm_budget_cache
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return _FLAT_HBM_BUDGET  # backend not ready: don't cache
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    budget = (
        max(int(limit) - _FLAT_HBM_HEADROOM, int(limit) // 2)
        if limit
        else _FLAT_HBM_BUDGET
    )
    _flat_hbm_budget_cache = budget
    return budget


def _flat_hbm_estimate(
    spec: DetectorSpec,
    n_evals: int,
    c: int,
    tile: int,
    distinct: bool,
    hops_per_row: int = 1,
    out_t: bool = False,
) -> int:
    """Padded HBM bytes of the flat slab + kernel output: the slab lane
    dim pads to a 128 multiple (k=1: 132->256 = 1.9x; k=8: 1056->1152 =
    1.09x) and the [rows, o_pad] output pads its lanes to 128 (16x for
    o_pad=8)."""
    # transposed output (out_t): o_pad sublanes x tile lanes — the
    # 128-lane pad disappears. o_pad = final net output width padded to
    # 8 sublanes (typ. 8, but a >8-output net doubles it — use the real
    # value or a near-budget shape is admitted and then OOMs on device)
    o_pad = _round_up(spec.net.outputs, 8)
    if hops_per_row > 1:
        k = hops_per_row
        _, _, L, q_sz, rows2d_k, halo_rows, r_k = _flat_geometry_k(
            spec, n_evals, tile, distinct, k
        )
        grid_total = max(1, -(-(c * r_k - halo_rows) // q_sz))
        need_rows = (grid_total - 1) * q_sz + rows2d_k
        if out_t:
            # [grid, k, o_pad, q]: o_pad sublanes exact, q lanes pad to 128
            out_bytes = grid_total * k * o_pad * _round_up(q_sz, LANE) * 4
        else:
            out_bytes = grid_total * tile * _round_up(o_pad, LANE) * 4
        return need_rows * _round_up(L, LANE) * 4 + out_bytes
    _, hop, _, rows2d, halo_rows, r = _flat_geometry(
        spec, n_evals, tile, distinct
    )
    grid_total = max(1, -(-(c * r - halo_rows) // tile))
    need_rows = (grid_total - 1) * tile + rows2d
    if out_t:
        # [grid, o_pad, tile]: tile is the LANE dim and physically pads to
        # a 128 multiple (the live router clamps flat_tile to multiples of
        # 8, not 128 — an unrounded estimate under-admits small buckets)
        out_bytes = grid_total * o_pad * _round_up(tile, LANE) * 4
    else:
        out_bytes = grid_total * tile * _round_up(o_pad, LANE) * 4
    return need_rows * _round_up(hop, LANE) * 4 + out_bytes


def flat_admission(
    spec: DetectorSpec,
    n_evals: int,
    c: int,
    tile: int,
    distinct: bool,
) -> tuple[str, int]:
    """The HBM admission ladder for batched detection, shared by the
    fused_batch router and the mesh shard path (one policy — they must
    route identically or a mesh shard and a single-chip call diverge):
    k=1 flat -> k=8 multi-hop flat (capacity tier, ~0.75x) -> grid
    (memory-safe, 50-70M). Returns ``(layout, hops_per_row)``; estimates
    assume the transposed (``out_t=True``) output the flat launches use."""
    budget = _flat_hbm_budget()
    if _flat_hbm_estimate(spec, n_evals, c, tile, distinct, out_t=True) <= budget:
        return "flat", 1
    if tile % 64 == 0 and _flat_hbm_estimate(
        spec, n_evals, c, tile, distinct, hops_per_row=8, out_t=True
    ) <= budget:
        return "flat", 8
    return "grid", 1


def flat_batch_input_samples(
    spec: DetectorSpec,
    n_evals: int,
    channels: int,
    tile: int = 2048,
    distinct: bool = False,
    hops_per_row: int = 1,
) -> tuple[int, int]:
    """(per_channel_samples, total_flat_samples) for a ZERO-COPY flat
    batched call: pack channel ch's samples at offset
    ``ch * per_channel_samples`` of a flat float32 buffer of
    ``total_flat_samples`` (zero-fill the tail). For the fastest path,
    reshape it host-side to ``[total // (hops_per_row*hop),
    hops_per_row*hop]`` and pass that 2-D array with ``channels=channels``
    (device-puts directly in the kernel's tiled layout — no in-graph
    copy)."""
    if hops_per_row > 1:
        _, hop, L, q_sz, rows2d_k, halo_rows, r_k = _flat_geometry_k(
            spec, n_evals, tile, distinct, hops_per_row
        )
        grid_total = max(1, -(-(channels * r_k - halo_rows) // q_sz))
        need_rows = (grid_total - 1) * q_sz + rows2d_k
        return r_k * L, need_rows * L
    _, hop, _, rows2d, halo_rows, r = _flat_geometry(
        spec, n_evals, tile, distinct
    )
    grid_total = max(1, -(-(channels * r - halo_rows) // tile))
    need_rows = (grid_total - 1) * tile + rows2d
    return r * hop, need_rows * hop


def fused_batch_program(
    spec: DetectorSpec,
    params,
    n: int,
    wire_dtype: str = "float32",
    interpret: bool | None = None,
):
    """Build a ONE-device-program drain callable for the live bank path:
    wire dequantization + the flat slab repack + the fused kernel + the
    output view compiled into a single jitted program.

    Why: the eager flat path runs ~9 standalone jnp primitives per call
    (asarray/concat/pad/reshape around the kernel). Each eager primitive
    is its own device execution — invisible on a PCIe host, but on this
    chip's network tunnel a 384-lane live drain measured 153 ms of its
    224 ms wall waiting on that dispatch chain (cProfile, r5). Compiling
    the chain into one program leaves ONE host->device transfer and ONE
    execution per drain round, the same per-round cost structure as the
    reference's single vDSP pass (reference:
    SyllableDetector/SyllableDetector.swift:156-217).

    ``params`` must be the bank's per-lane list (the distinct-net stacked
    fold); the folded operands are passed as TRACED ARGUMENTS — closing
    over them would embed ~MBs of per-channel constants as HLO literals
    (the r1 remote-compile "413" trap).

    Returns ``fn(xs_wire[C, n]) -> jax.Array [C, n_evals, outputs]``, or
    ``None`` when this shape routes off the k=1/k=8 flat path (grid
    fallback, unfusable spec, or no evaluable hops) — callers keep the
    eager path there. Routing (tuned tile, HBM admission) matches
    :func:`fused_batch_offline_outputs` exactly.
    """
    if not isinstance(params, (list, tuple)):
        raise ValueError("fused_batch_program needs the per-lane params list")
    if not fusable(spec):
        return None
    c = len(params)
    f = num_frames(n, spec.window_length, spec.window_overlap)
    ne = f - spec.time_range + 1
    if ne <= 0:
        return None
    from syllable_detector_tpu.tuning import tuned_flat_tile

    tuned = tuned_flat_tile(spec, c, ne, True)
    default = 512 if c <= 256 else 1024
    flat_tile = min(tuned or default, max(8, _round_up(ne, 8)))
    if interpret is None:
        interpret = jax.local_devices()[0].platform == "cpu"
    lay, hops = (
        ("flat", 1)
        if interpret
        else flat_admission(spec, ne, c, flat_tile, True)
    )
    if lay != "flat":
        return None
    operands, meta = _folded_stacked(spec, tuple(params))
    dev_ops = _device_operands(operands)

    if wire_dtype == "int16":
        scale = np.float32(1.0 / 32767.0)

        def dequant(v):
            return v.astype(jnp.float32) * scale

    elif wire_dtype == "mulaw8":
        ln1mu = np.float32(np.log1p(255.0))
        inv_mu = np.float32(1.0 / 255.0)
        inv127 = np.float32(1.0 / 127.0)

        def dequant(v):
            y = v.astype(jnp.float32) * inv127
            return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * ln1mu) * inv_mu)

    elif wire_dtype == "float32":
        dequant = None
    else:
        raise ValueError(f"unknown wire_dtype {wire_dtype!r}")

    @jax.jit
    def run(xs, ops):
        x = dequant(xs) if dequant is not None else xs
        return _flat_core(
            spec, meta, ops, x, flat_tile, interpret, ne,
            per_channel=True, hops_per_row=hops, out_t=True,
        )

    return lambda xs: run(xs, dev_ops)


def fused_flat_batch_offline_outputs(
    spec: DetectorSpec,
    params,
    xs: jax.Array,
    tile: int = 2048,
    interpret: bool | None = None,
    n_evals: int | None = None,
    channels: int | None = None,
    hops_per_row: int = 1,
    out_t: bool = True,
) -> jax.Array:
    """[C, n] streams -> [C, E, outputs] through the single-stream kernel
    over one flat slab — the FAST batched layout (shared or distinct nets).

    ``xs`` forms (fastest first):
      * pre-slabbed 2-D ``[need_rows, hops_per_row*hop]`` with
        ``channels=C`` and an explicit ``n_evals`` (the
        :func:`flat_batch_input_samples` layout reshaped host-side) — TRUE
        zero copy: the array device-puts in the kernel's tiled layout, so
        no in-graph copy and no doubled HBM;
      * flat 1-D of ``total_flat_samples`` with ``channels=C`` — the
        in-graph reshape to the tiled 2-D layout materializes ONE copy
        (fine for small batches, doubles peak HBM at 1024-channel scale);
      * ``[C, n]`` — one per-channel repack copy.

    ``out_t`` (default True) writes TRANSPOSED [o_pad, tile] kernel
    output blocks — 16x smaller output array and 15/16 less output write
    bandwidth, measured bit-exact and +4-8% on hardware (r4); it is what
    lets distinct c=1024 run 8192 evals/channel at full k=1 speed.
    At ``hops_per_row`` > 1 it is honored too: the kernel writes
    [o_pad, q] blocks (q-lane pad, ~2x, instead of the o_pad 8->128 16x
    lane pad) — the k=8 capacity tier's HBM admission estimates in the
    router and the mesh escalation DEPEND on this.

    ``hops_per_row`` > 1 packs k hop-rows per slab row (k*hop lanes),
    shrinking the physical lane pad from 1.9x to ~1.1x (k=8) — bit-exact
    with k=1, it lifts the distinct-net HBM ceiling (the r3 verdict's
    4096-eval cap at c=1024). Requires ``tile % (8*k) == 0``; the
    full-fidelity tier only.
    """
    distinct = isinstance(params, (list, tuple))
    # pre-slabbed form = [need_rows, k*hop] with channels given; a [C, n]
    # array with a redundant channels=C is still treated as [C, n], even
    # when n coincides with the k*hop slab width (shape[0] == channels is
    # the tie-breaker — a true pre-slab whose need_rows equals C as well
    # is ambiguous; pass the 1-D flat form there)
    pre_slabbed = (
        channels is not None
        and xs.ndim == 2
        and xs.shape[1] == spec.hop * hops_per_row
        and xs.shape[0] != channels
    )
    if xs.ndim == 1 or pre_slabbed:
        if channels is None:
            raise ValueError("flat 1-D input needs channels=C")
        c = channels
        if n_evals is None:
            raise ValueError("flat/pre-slabbed input needs an explicit n_evals")
    else:
        c, n_in = xs.shape
        if channels is not None and channels != c:
            raise ValueError(
                f"channels={channels} does not match xs.shape[0]={c}"
            )
    if distinct and len(params) != c:
        raise ValueError(f"{len(params)} per-channel networks for {c} channels")
    if not fusable(spec):
        if xs.ndim == 1 or pre_slabbed:
            raise ValueError(
                "flat/pre-slabbed input requires a fusable spec; use the "
                "[C, n] form for the unfused fallback"
            )
        return fused_batch_offline_outputs(
            spec, params, xs,
            tile=min(tile, 512), interpret=interpret, n_evals=n_evals,
        )
    if interpret is None:
        interpret = jax.local_devices()[0].platform == "cpu"

    if distinct:
        operands, meta = _folded_stacked(spec, tuple(params))
    else:
        operands, meta = _folded(spec, params)
    operands = _device_operands(operands)

    if not pre_slabbed and xs.ndim == 2:
        # the grid path's contract: an impossible n_evals raises instead
        # of silently evaluating zero-padded silence
        f = num_frames(n_in, spec.window_length, spec.window_overlap)
        max_evals = f - spec.time_range + 1
        if n_evals is None:
            n_evals = max_evals
        elif n_evals > max_evals:
            raise ValueError(
                f"n_evals={n_evals} needs more than {n_in} samples"
            )
    if n_evals <= 0:
        return jnp.zeros((c, 0, spec.net.outputs), jnp.float32)

    # ONE dispatch sequence for k=1 and the k>1 multi-hop slab — only the
    # geometry differs: a "unit" of `unit` slab rows carries `tile` evals
    # (k=1: unit == tile hop-rows of `width` == hop lanes; k>1: unit ==
    # q_sz rows of k*hop lanes), and `r` is each channel's row span.
    k = hops_per_row
    if k > 1:
        _, hop, width, unit, rows2d_u, halo_rows_u, r = _flat_geometry_k(
            spec, n_evals, tile, distinct, k
        )
        width_pad = _round_up(width, LANE)
        pipe = _pipelined_geometry_k(spec, tile, k) is not None
        mode = "rawk"
    else:
        _, width, width_pad, rows2d_u, halo_rows_u, r = _flat_geometry(
            spec, n_evals, tile, distinct
        )
        unit = tile
        pipe = _pipelined_geometry(spec, tile) is not None
        mode = "raw"
    grid_total = max(1, -(-(c * r - halo_rows_u) // unit))
    need_rows = (grid_total - 1) * unit + rows2d_u

    # loud HBM guard: the flat slab's lane dim pads to a multiple of 128
    # (k=1: 132->256 = 1.9x for the sample net; k=8: 1056->1152 = 1.09x)
    # and the output pads too (see _flat_hbm_estimate). At 1024 channels x
    # 8192 evals the k=1 layout is a measured 12.8G program requirement —
    # fail with advice instead of an opaque RESOURCE_EXHAUSTED mid-run.
    # (The fused_batch router falls back through flat_admission's ladder
    # before reaching this.)
    est = _flat_hbm_estimate(
        spec, n_evals, c, tile, distinct, hops_per_row=k, out_t=out_t
    )
    if not interpret and est > _flat_hbm_budget():
        raise ValueError(
            f"flat batched footprint ~{est/2**30:.1f} GiB (padded slab + "
            f"output) exceeds a single chip's HBM"
            + (f" even at hops_per_row={k}" if k > 1 else "")
            + "; reduce n_evals per channel (e.g. 2048) or chunk the "
            "channels"
        )

    xs = jnp.asarray(xs, jnp.float32)
    if pre_slabbed:
        if xs.shape != (need_rows, width):
            raise ValueError(
                f"pre-slabbed input must have shape ({need_rows}, {width}) "
                f"(= flat_batch_input_samples layout); got {xs.shape}"
            )
        data = xs
    elif xs.ndim == 1:
        total = need_rows * width
        if xs.shape[0] != total:
            raise ValueError(
                f"flat input must have exactly {total} samples "
                f"(= flat_batch_input_samples(...)[1]); got {xs.shape[0]}"
            )
        data = xs.reshape(need_rows, width)
    else:
        return _flat_core(
            spec, meta, operands, xs, tile, interpret, n_evals,
            per_channel=distinct, hops_per_row=k, out_t=out_t,
        )
    if not pipe and width_pad != width:
        data = jnp.pad(data, ((0, 0), (0, width_pad - width)))

    out = _fused_call(
        spec, meta, data, operands, grid_total, grid_total * tile, tile,
        interpret, mode, per_channel=distinct,
        flat_blocks_per_ch=(r // unit) if distinct else None,
        hops_per_row=k, out_t=out_t,
    )
    # r slab rows per channel hold r*k evals (k=1: r == per-channel evals)
    return _flat_outputs(out, c, r * k, n_evals)


def _flat_outputs(out, c, r, n_evals):
    """Recover [c, n_evals, outputs] from the flat kernel's row-major
    output: channel ch's evals are CONTIGUOUS at rows [ch*r, ch*r +
    n_evals) — pad to c*r rows (the final halo rows produce no evals) and
    view, a static pad + reshape, never a gather (a materialized gather is
    ~1000x slower on this hardware)."""
    pad = c * r - out.shape[0]
    if pad > 0:
        out = jnp.concatenate(
            [out, jnp.zeros((pad, out.shape[1]), out.dtype)]
        )
    return out[: c * r].reshape(c, r, -1)[:, :n_evals]


def _flat_core(
    spec: DetectorSpec,
    meta: FusedMeta,
    operands,
    xs: jax.Array,
    tile: int,
    interpret: bool,
    n_evals: int,
    per_channel: bool = False,
    hops_per_row: int = 1,
    out_t: bool = True,
) -> jax.Array:
    """Flat-layout launch for a [c, n] batch (one per-channel repack into
    slab rows; ``hops_per_row`` > 1 packs k hops per row — the capacity
    tier). Fully traceable — runs under ``shard_map``/``lax.map`` with
    traced ``operands``/``xs`` (the mesh-sharded fused path's per-device
    core)."""
    c, n_in = xs.shape
    k = hops_per_row
    if k > 1:
        _, _, width, unit, rows2d_u, halo_rows_u, r = _flat_geometry_k(
            spec, n_evals, tile, per_channel, k
        )
        pipe = _pipelined_geometry_k(spec, tile, k) is not None
        mode = "rawk"
    else:
        _, width, _, rows2d_u, halo_rows_u, r = _flat_geometry(
            spec, n_evals, tile, per_channel
        )
        unit = tile
        pipe = _pipelined_geometry(spec, tile) is not None
        mode = "raw"
    grid_total = max(1, -(-(c * r - halo_rows_u) // unit))
    need_rows = (grid_total - 1) * unit + rows2d_u

    xs = jnp.asarray(xs, jnp.float32)
    want = r * width
    if want > n_in:
        xs = jnp.concatenate(
            [xs, jnp.zeros((c, want - n_in), jnp.float32)], axis=1
        )
    data = xs[:, :want].reshape(c * r, width)
    if need_rows > c * r:
        data = jnp.concatenate(
            [data, jnp.zeros((need_rows - c * r, width), jnp.float32)]
        )
    width_pad = _round_up(width, LANE)
    if not pipe and width_pad != width:
        data = jnp.pad(data, ((0, 0), (0, width_pad - width)))

    out = _fused_call(
        spec, meta, data, operands, grid_total, grid_total * tile, tile,
        interpret, mode, per_channel=per_channel,
        flat_blocks_per_ch=(r // unit) if per_channel else None,
        hops_per_row=k, out_t=out_t,
    )
    return _flat_outputs(out, c, r * k, n_evals)
