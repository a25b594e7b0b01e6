"""Batched multi-channel streaming detector — the live deployment shape.

The reference runs one independent SyllableDetector object per audio
channel and drains them one at a time on the processing queue (reference:
SyllableDetector/Processor.swift:57-59, 128-149). On TPU that serial
per-lane drain wastes the chip: every live channel's hop work is a few
kFLOP, so the only way to feed the MXU is to evaluate ALL channels in one
launch. :class:`DetectorBank` does exactly that — per-lane sample buffers
on the host, one fused batched kernel call
(kernels/fused_detector.fused_batch_offline_outputs) evaluating every
lane's new hops together, with per-channel DISTINCT networks riding the
kernel's channel-stacked folded operands.

Semantics match a bank of :class:`~syllable_detector_tpu.models.detector.
Detector` objects drained in lockstep: the same hop accounting, the same
warm-up discard, the same outputs (tested element-for-element). Lanes that
received fewer samples simply wait — a drain evaluates ``min`` over lanes
of newly available hops, keeping the batch shape uniform (live capture
fills all lanes at the device callback rate, so lanes stay aligned).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from syllable_detector_tpu.config.model_format import SyllableDetectorConfig
from syllable_detector_tpu.models.detector import (
    _FRAME_BUCKETS,
    detector_spec_from_config,
)
from syllable_detector_tpu.ops.stft import normalize_overlap, num_frames

__all__ = ["DetectorBank"]


class DetectorBank:
    """N streaming detectors drained together in one fused device call.

    ``configs``: one per lane; all must share the first lane's pipeline
    geometry (thresholds may differ per lane — they are applied per lane).
    ``method='fused'`` (default) uses the flagship Pallas kernel with
    channel-stacked distinct nets; ``'matmul'`` uses the unfused XLA
    pipeline via vmap (same batching, slower kernel).

    ``max_buffer_seconds`` bounds each lane's sample buffer: the lockstep
    drain waits for the slowest lane, so a dead/starved capture channel
    would otherwise grow every OTHER lane's buffer without bound. Appends
    beyond the cap are counted in ``overflows[lane]`` and dropped — the
    same count-and-drop contract as the Processor ring (the reference
    fatalErrors instead, CircularShortTimeFourierTransform.swift:199).
    """

    def __init__(
        self,
        configs: list[SyllableDetectorConfig],
        method: str = "fused",
        max_buffer_seconds: float = 30.0,
        pairs=None,
    ):
        if not configs:
            raise ValueError("DetectorBank needs at least one lane")
        self.configs = list(configs)
        # pairs: precomputed [(spec, params)] matching configs — callers
        # that already built them (Processor's geometry grouping) skip a
        # second full weight-pytree construction per lane
        if pairs is None:
            pairs = [detector_spec_from_config(c) for c in self.configs]
        elif len(pairs) != len(self.configs):
            raise ValueError("pairs must match configs one-to-one")
        self.spec = pairs[0][0]
        base = dataclasses.replace(self.spec, thresholds=())
        for s, _ in pairs[1:]:
            if dataclasses.replace(s, thresholds=()) != base:
                raise ValueError(
                    "all lanes must share the first network's geometry "
                    "(sampling rate, FFT/window, band, layer sizes)"
                )
        self.params_list = [p for _, p in pairs]
        self.thresholds = np.asarray(
            [s.thresholds[0] for s, _ in pairs], np.float64
        )
        if method == "fused":
            from syllable_detector_tpu.kernels.fused_detector import fusable

            if not fusable(self.spec):
                method = "matmul"
        self.method = method
        self.n_lanes = len(configs)
        self.max_buffer_samples = int(
            max_buffer_seconds * self.spec.sampling_rate
        )
        self.overflows = [0] * self.n_lanes
        self._matmul_fn = None  # built once; a per-drain jit would retrace
        self._stacked = None
        self._residuals = [np.zeros(0, np.float32) for _ in configs]
        # lockstep hop counter (the first timeRange-1 frames emit nothing,
        # which the raw-sample evaluation handles inherently — an eval needs
        # timeRange frames of context, SyllableDetector.swift:164-178)
        self._frames_seen = 0
        self.last_outputs = np.zeros(
            (self.n_lanes, self.spec.net.outputs), np.float32
        )

    # -- feeding ------------------------------------------------------------

    def append_audio_data(self, lane: int, samples: np.ndarray) -> None:
        samples = np.asarray(samples, np.float32).reshape(-1)
        if len(self._residuals[lane]) + len(samples) > self.max_buffer_samples:
            # count-and-drop like the Processor ring on overflow; keeps a
            # starved lockstep from growing active lanes without bound
            self.overflows[lane] += 1
            return
        self._residuals[lane] = np.concatenate([self._residuals[lane], samples])

    # -- draining -----------------------------------------------------------

    def _evaluable_hops(self) -> int:
        """Newly evaluable hops across ALL lanes (min over lanes)."""
        spec = self.spec
        t = spec.time_range
        f_min = min(
            num_frames(len(r), spec.window_length, spec.window_overlap)
            for r in self._residuals
        )
        return max(0, f_min - (t - 1))

    def drain(self) -> np.ndarray:
        """Evaluate every lane's newly available hops in one batched device
        call -> [n_lanes, n_new, outputs] (n_new may be 0).

        Like Detector._drain_fused, the buffers retain the trailing
        ``(timeRange-1)`` hops of samples so the next drain's evaluations
        continue exactly where this one stopped; sample lengths bucket to
        the shared _FRAME_BUCKETS sizes so device kernels compile once per
        bucket.
        """
        spec = self.spec
        t = spec.time_range
        hop = spec.hop
        gap, _ = normalize_overlap(spec.window_overlap)
        n_new = self._evaluable_hops()
        out_w = spec.net.outputs
        if n_new <= 0:
            return np.zeros((self.n_lanes, 0, out_w), np.float32)

        chunks = []
        while n_new > 0:
            take = min(n_new, _FRAME_BUCKETS[-1])
            bucket = next(b for b in _FRAME_BUCKETS if b >= take)
            need = (bucket + t - 2) * hop + gap + spec.window_length
            xs = np.zeros((self.n_lanes, need), np.float32)
            for i, r in enumerate(self._residuals):
                m = min(len(r), need)
                xs[i, :m] = r[:m]
            outs = np.asarray(self._batched_outputs(jnp.asarray(xs)))[:, :take]
            chunks.append(outs)
            self._residuals = [r[take * hop :] for r in self._residuals]
            n_new -= take
        self._frames_seen += sum(c.shape[1] for c in chunks)
        outs = np.concatenate(chunks, axis=1)
        if outs.shape[1]:
            self.last_outputs = outs[:, -1]
        return outs

    def _batched_outputs(self, xs):
        from syllable_detector_tpu.kernels.fused_detector import (
            fused_batch_offline_outputs,
        )

        # fused_batch handles both the distinct-net fused path and the
        # unfused vmap fallback (when method == 'matmul' we force it)
        if self.method == "fused":
            return fused_batch_offline_outputs(self.spec, self.params_list, xs)
        if self._matmul_fn is None:
            # built exactly once: a fresh jit wrapper per drain would be
            # cached by function identity and retrace every call
            import jax

            from syllable_detector_tpu.models.detector import offline_outputs
            from syllable_detector_tpu.models.neural_net import stack_params

            spec = self.spec
            self._stacked = stack_params(self.params_list)
            self._matmul_fn = jax.jit(
                jax.vmap(lambda p, x: offline_outputs(spec, p, x))
            )
        return self._matmul_fn(self._stacked, xs)

    def seen_syllables(self) -> np.ndarray:
        """Drain and OR detections per lane (output 0 vs each lane's own
        threshold) -> bool[n_lanes] (SyllableDetector.swift:220-230, per
        lane)."""
        outs = self.drain()
        if not outs.shape[1]:
            return np.zeros(self.n_lanes, bool)
        # float32 comparison, like Detector.seen_syllable
        return np.any(
            outs[:, :, 0] >= self.thresholds.astype(np.float32)[:, None],
            axis=1,
        )

    # -- state checkpoint / resume (mirrors Detector.get_state/set_state) ---

    def get_state(self) -> dict:
        """Snapshot every lane's streaming state as plain numpy arrays."""
        return {
            "residuals": [r.copy() for r in self._residuals],
            "frames_seen": int(self._frames_seen),
            "last_outputs": np.asarray(self.last_outputs, np.float32).copy(),
            "overflows": list(self.overflows),
        }

    def set_state(self, state: dict) -> None:
        """Restore a :meth:`get_state` snapshot (possibly in a different
        process); continuing the streams afterwards produces exactly the
        outputs an uninterrupted bank would."""
        residuals = [np.asarray(r, np.float32) for r in state["residuals"]]
        if len(residuals) != self.n_lanes:
            raise ValueError(
                f"state has {len(residuals)} lanes, bank has {self.n_lanes}"
            )
        self._residuals = [r.copy() for r in residuals]
        self._frames_seen = int(state["frames_seen"])
        self.last_outputs = np.asarray(state["last_outputs"], np.float32).copy()
        self.overflows = list(state.get("overflows", [0] * self.n_lanes))

    def save_state(self, path) -> None:
        state = self.get_state()
        np.savez(
            path,
            frames_seen=state["frames_seen"],
            last_outputs=state["last_outputs"],
            overflows=np.asarray(state["overflows"], np.int64),
            **{f"residual_{i}": r for i, r in enumerate(state["residuals"])},
        )

    def load_state(self, path) -> None:
        with np.load(path) as data:
            n_saved = sum(1 for k in data.files if k.startswith("residual_"))
            self.set_state(
                {
                    "residuals": [
                        data[f"residual_{i}"] for i in range(n_saved)
                    ],
                    "frames_seen": int(data["frames_seen"]),
                    "last_outputs": data["last_outputs"],
                    "overflows": list(data["overflows"]),
                }
            )

    def warm_up(self, buckets: tuple = _FRAME_BUCKETS) -> int:
        """Eagerly compile every batched drain shape (one per bucket)."""
        spec = self.spec
        gap, _ = normalize_overlap(spec.window_overlap)
        n = 0
        import jax

        for b in buckets:
            need = (b + spec.time_range - 2) * spec.hop + gap + spec.window_length
            out = self._batched_outputs(
                jnp.zeros((self.n_lanes, need), jnp.float32)
            )
            jax.block_until_ready(out)
            n += 1
        return n
