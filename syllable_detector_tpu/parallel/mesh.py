"""Mesh-sharded multi-channel detection.

Maps the reference's channel fan-out (one SyllableDetector per channel,
Processor.swift:57-59) onto TPU devices: channels are a leading batch axis,
vmapped on-chip and sharded across the mesh's ``channel`` axis. Distinct
per-channel networks ride along as stacked parameter pytrees
(models/neural_net.stack_params). Aggregate metrics reduce with ``psum``
over the mesh — the only cross-device communication this workload needs
(SURVEY.md section 2, parallelism table).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from syllable_detector_tpu.models.detector import (
    DetectorSpec,
    offline_outputs,
    streaming_step,
)

__all__ = [
    "make_mesh",
    "batch_offline_outputs",
    "sharded_offline_outputs",
    "sharded_detection_counts",
    "sharded_streaming_step",
    "time_sharded_offline_outputs",
]

CHANNEL_AXIS = "channel"
TIME_AXIS = "time"


def make_mesh(n_devices: int | None = None, axis: str = CHANNEL_AXIS) -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


@partial(jax.jit, static_argnames=("spec", "method"))
def batch_offline_outputs(
    spec: DetectorSpec, stacked_params, xs: jax.Array, method: str = "matmul"
) -> jax.Array:
    """[C, n] streams + stacked per-channel params -> [C, E, outputs]."""
    return jax.vmap(lambda p, x: offline_outputs(spec, p, x, method=method))(
        stacked_params, xs
    )


def sharded_offline_outputs(
    mesh: Mesh,
    spec: DetectorSpec,
    stacked_params,
    xs: jax.Array,
    method: str = "matmul",
) -> jax.Array:
    """Shard the channel axis across the mesh; each device runs its local
    channels with zero cross-device communication."""
    axis = mesh.axis_names[0]

    def local(params, x):
        return batch_offline_outputs(spec, params, x, method=method)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(fn)(stacked_params, xs)


def sharded_detection_counts(
    mesh: Mesh, spec: DetectorSpec, stacked_params, xs: jax.Array
) -> jax.Array:
    """Global detection count per output via psum — the cross-device metrics
    reduction (the TPU analogue of SummaryStat aggregation)."""
    axis = mesh.axis_names[0]
    thresholds = jnp.asarray(spec.thresholds, jnp.float32)

    def local(params, x):
        outs = batch_offline_outputs(spec, params, x)  # [c_local, E, O]
        hits = jnp.sum(outs >= thresholds, axis=(0, 1)).astype(jnp.int32)
        return jax.lax.psum(hits, axis)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
    return jax.jit(fn)(stacked_params, xs)


def time_sharded_offline_outputs(
    mesh: Mesh,
    spec: DetectorSpec,
    params,
    x: jax.Array,
    method: str = "matmul",
) -> jax.Array:
    """One long stream's TIME axis sharded across the mesh — the
    sequence-parallel form of this workload (SURVEY.md section 5: "shard the
    time axis across devices with halo exchange of window-hop samples").

    Each device evaluates a contiguous block of hops from its local segment
    plus a ``(timeRange-2)*hop + gap + window`` sample halo received from its
    right neighbor over one ``lax.ppermute`` (ICI); the last device takes the
    zero-padded stream tail instead. Numerically identical to
    :func:`~syllable_detector_tpu.models.detector.offline_outputs` on the
    whole stream. Use for offline corpus scans whose single stream is too
    long for one device's HBM; channel-parallel sharding remains the
    deployment shape for many independent streams.
    """
    from syllable_detector_tpu.ops.stft import normalize_overlap, num_frames

    axis = mesh.axis_names[0]
    d = int(mesh.shape[axis])
    gap, _ = normalize_overlap(spec.window_overlap)
    hop = spec.hop
    halo = (spec.time_range - 2) * hop + gap + spec.window_length

    n = int(x.shape[0])
    f = num_frames(n, spec.window_length, spec.window_overlap)
    e_total = f - spec.time_range + 1
    if e_total <= 0:
        return jnp.zeros((0, spec.net.outputs), jnp.float32)
    e_loc = -(-e_total // d)
    if e_loc * hop < halo:
        # segments shorter than the halo cannot feed the neighbor exchange;
        # the stream is too short to be worth sharding anyway
        return offline_outputs(spec, params, x, method=method)

    body = d * e_loc * hop
    need = body + halo
    x = jnp.asarray(x, jnp.float32)
    if need > n:
        x = jnp.concatenate([x, jnp.zeros(need - n, jnp.float32)])
    xs = x[:body].reshape(d, e_loc * hop)
    tail = x[body:need]  # the last device's halo lives in the stream tail

    perm = [((i + 1) % d, i) for i in range(d)]  # receive from right neighbor

    def local(params, x_own, tail):
        x_own = x_own[0]
        idx = jax.lax.axis_index(axis)
        from_right = jax.lax.ppermute(x_own[:halo], axis, perm)
        halo_recv = jnp.where(idx == d - 1, tail, from_right)
        seg = jnp.concatenate([x_own, halo_recv])
        return offline_outputs(spec, params, seg, method=method)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(axis),
    )
    outs = jax.jit(fn)(params, xs, tail)  # [d*e_loc, outputs]
    return outs[:e_total]


def sharded_streaming_step(
    mesh: Mesh,
    spec: DetectorSpec,
    stacked_params,
    carries,
    chunks: jax.Array,
):
    """One fixed-shape streaming step for all channels, sharded over the mesh.

    ``carries`` is the stacked streaming carry ([C, ...] leaves from
    models.detector.streaming_init); ``chunks`` is [C, H*hop]. Returns
    (new_carries, outputs [C, H, outputs]).
    """
    axis = mesh.axis_names[0]

    def local(params, carry, chunk):
        return jax.vmap(lambda p, c, x: streaming_step(spec, p, c, x))(
            params, carry, chunk
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    return jax.jit(fn)(stacked_params, carries, chunks)
