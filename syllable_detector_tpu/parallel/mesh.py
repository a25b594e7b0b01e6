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
]

CHANNEL_AXIS = "channel"


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
