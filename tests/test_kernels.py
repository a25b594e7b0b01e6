"""Fused Pallas kernel vs the unfused XLA pipeline (interpret mode on CPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from syllable_detector_tpu.kernels.fused_detector import (
    fold_constants,
    fusable,
    fused_offline_outputs,
)
from syllable_detector_tpu.models.detector import (
    detector_spec_from_config,
    offline_outputs,
)
from test_detector import make_audio


@pytest.fixture(scope="module")
def audio():
    return make_audio(np.random.default_rng(11), seconds=1.5)


def test_fusable(sample_config):
    spec, params = detector_spec_from_config(sample_config)
    assert fusable(spec)


def test_fold_constants_shapes(sample_config):
    spec, params = detector_spec_from_config(sample_config)
    operands, meta = fold_constants(spec, params)
    c_packed, w1g, c1 = operands[:3]
    # 29 bins fit a single 128-lane block: re at lanes [0,29), im at [64,93);
    # conv bank = one [bins, T*hs] GEMM
    assert meta.packed
    assert c_packed.shape == (256, 128)
    assert np.count_nonzero(c_packed[:, 29:64]) == 0
    assert np.count_nonzero(c_packed[:, 64 + 29 :]) == 0
    assert w1g.shape == (128, 10 * 8)
    assert c1.shape == (1, 8)
    assert meta.n_mids == 1 and meta.b == 29 and meta.has_l2 and meta.hs == 8

    # the two-lane-block layout is still available for wide bands / A-B tests
    operands2, meta2 = fold_constants(spec, params, pack=False)
    assert not meta2.packed and operands2[0].shape == (256, 256)


def test_fused_matches_unfused(sample_config, audio):
    spec, params = detector_spec_from_config(sample_config)
    want = np.asarray(offline_outputs(spec, params, jnp.asarray(audio)))
    got = np.asarray(
        fused_offline_outputs(spec, params, jnp.asarray(audio), interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("scaling", ["db", "log"])
def test_fused_scalings(sample_config, audio, scaling):
    cfg = dataclasses.replace(sample_config, scaling=scaling)
    spec, params = detector_spec_from_config(cfg)
    want = np.asarray(offline_outputs(spec, params, jnp.asarray(audio)))
    got = np.asarray(
        fused_offline_outputs(spec, params, jnp.asarray(audio), interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("split", [False, True, "conv"])
@pytest.mark.parametrize("scaling", ["linear", "log"])
def test_fused_variants(sample_config, audio, packed, split, scaling):
    """Every (re+im lane packing) x (GEMM precision ladder) combination must
    match the unfused oracle; 'linear'+packed exercises the sq0 l2 rowsum,
    'log'+packed the masked duplicate lanes."""
    cfg = dataclasses.replace(sample_config, scaling=scaling)
    spec, params = detector_spec_from_config(cfg)
    want = np.asarray(offline_outputs(spec, params, jnp.asarray(audio)))
    got = np.asarray(
        fused_offline_outputs(
            spec, params, jnp.asarray(audio), interpret=True,
            packed=packed, split=split,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


def test_fused_small_input(sample_config):
    """Fewer evals than one tile: padding path."""
    spec, params = detector_spec_from_config(sample_config)
    x = make_audio(np.random.default_rng(0), seconds=0.1)
    want = np.asarray(offline_outputs(spec, params, jnp.asarray(x)))
    got = np.asarray(
        fused_offline_outputs(spec, params, jnp.asarray(x), interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_fused_too_short_returns_empty(sample_config):
    spec, params = detector_spec_from_config(sample_config)
    got = fused_offline_outputs(spec, params, jnp.zeros(300, jnp.float32))
    assert got.shape == (0, 1)


def test_unfusable_falls_back(sample_config):
    from syllable_detector_tpu.config.model_format import ProcessingSpec

    cfg = dataclasses.replace(
        sample_config,
        process_inputs=[ProcessingSpec("normalize")],
    )
    spec, params = detector_spec_from_config(cfg)
    assert not fusable(spec)
    x = make_audio(np.random.default_rng(0), seconds=0.2)
    got = np.asarray(fused_offline_outputs(spec, params, jnp.asarray(x)))
    want = np.asarray(offline_outputs(spec, params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_raw_matches_frames_mode(sample_config, audio):
    spec, params = detector_spec_from_config(sample_config)
    a = np.asarray(
        fused_offline_outputs(
            spec, params, jnp.asarray(audio), interpret=True, input_mode="raw"
        )
    )
    b = np.asarray(
        fused_offline_outputs(
            spec, params, jnp.asarray(audio), interpret=True, input_mode="frames"
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_raw_mode_gap_config():
    """Gap (negative overlap) geometry through the raw-slab rebuild."""
    from syllable_detector_tpu.config.model_format import loads_config

    text = (
        "samplingRate = 8000\nfourierLength = 64\nwindowLength = 64\n"
        "windowOverlap = -16\nfreqRange = 100, 3000\ntimeRange = 3\n"
        "thresholds = 0.5\nscaling = linear\nprocessInputsCount = 1\n"
        "processInputs0.function = l2normalize\nprocessOutputsCount = 0\n"
        "layers = 1\nlayer0.inputs = 72\nlayer0.outputs = 1\n"
        "layer0.weights = " + ", ".join(["0.1"] * 72) + "\n"
        "layer0.biases = 0\nlayer0.transferFunction = TanSig\n"
    )
    cfg = loads_config(text)
    spec, params = detector_spec_from_config(cfg)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(20000).astype(np.float32)
    want = np.asarray(offline_outputs(spec, params, jnp.asarray(x)))
    got = np.asarray(
        fused_offline_outputs(
            spec, params, jnp.asarray(x), interpret=True, input_mode="raw", tile=64
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("tile", [256, 64])
def test_fused_batch(sample_config, tile):
    """tile=256 -> one grid program per channel; tile=64 -> four programs
    per channel, exercising the flat-slab row arithmetic (base =
    ch*ch_rows + i*tile) at i > 0."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((4, 30000)).astype(np.float32))
    outs = fused_batch_offline_outputs(spec, params, xs, tile=tile, interpret=True)
    ref = jnp.stack([offline_outputs(spec, params, x) for x in xs])
    assert outs.shape == ref.shape
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref), rtol=1e-3, atol=2e-4)


def test_exact_sized_input_no_pad(sample_config, audio):
    # fused_input_samples sizes the stream so the tail zero-pad is a no-op;
    # outputs must equal the unfused oracle over the first n_evals windows
    from syllable_detector_tpu.kernels.fused_detector import fused_input_samples

    spec, params = detector_spec_from_config(sample_config)
    tile, n_evals = 64, 200
    n = fused_input_samples(spec, n_evals, tile=tile)
    assert n <= len(audio)
    x = jnp.asarray(audio[:n])
    got = np.asarray(
        fused_offline_outputs(
            spec, params, x, tile=tile, interpret=True, n_evals=n_evals
        )
    )
    want = np.asarray(offline_outputs(spec, params, x))[:n_evals]
    assert got.shape == want.shape == (n_evals, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    # batched flavor: [C, exact_n] with explicit n_evals
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )

    nb = fused_input_samples(spec, n_evals, tile=tile, batched=True)
    xs = jnp.stack([jnp.asarray(audio[:nb]), jnp.asarray(audio[1 : nb + 1])])
    got_b = np.asarray(
        fused_batch_offline_outputs(
            spec, params, xs, tile=tile, interpret=True, n_evals=n_evals
        )
    )
    assert got_b.shape == (2, n_evals, 1)
    np.testing.assert_allclose(got_b[0], want, rtol=1e-3, atol=2e-4)

    # asking for more evals than the samples support is an error
    with pytest.raises(ValueError, match="n_evals"):
        fused_offline_outputs(
            spec, params, x, tile=tile, interpret=True, n_evals=10**6
        )


def test_batch_slab_channels_matches_native(sample_config, audio):
    # channel counts above slab_channels run as lax.map over slabs of one
    # compiled kernel (the remote-compiler request-size workaround); results
    # must equal the native wide launch, including the padded last slab
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    n = 8000
    xs = jnp.stack([jnp.asarray(audio[i : i + n]) for i in range(5)])
    native = np.asarray(
        fused_batch_offline_outputs(
            spec, params, xs, tile=64, interpret=True, slab_channels=None
        )
    )
    slabbed = np.asarray(
        fused_batch_offline_outputs(
            spec, params, xs, tile=64, interpret=True, slab_channels=2
        )
    )
    assert slabbed.shape == native.shape == (5, native.shape[1], 1)
    np.testing.assert_allclose(slabbed, native, rtol=1e-5, atol=1e-6)


def test_split4_interpret_algebra(sample_config, audio):
    # interpret mode cannot measure bf16 accuracy (CLAUDE.md: interpret
    # showed 5e-6 where hardware shows 2e-3), but it does validate the
    # 4-pass decomposition's plumbing end to end
    spec, params = detector_spec_from_config(sample_config)
    want = np.asarray(offline_outputs(spec, params, jnp.asarray(audio)))
    got = np.asarray(
        fused_offline_outputs(
            spec, params, jnp.asarray(audio), interpret=True, split=4
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# per-channel DISTINCT networks on the fused path (the reference loads one
# net per audio channel: Processor.swift:57-59,
# ViewControllerProcessor.swift:222-276)
# ---------------------------------------------------------------------------


def _perturbed_params(params, seed, scale=0.05):
    import jax

    r = np.random.default_rng(seed)
    return jax.tree.map(
        lambda a: jnp.asarray(
            np.asarray(a) * (1.0 + scale * r.standard_normal(np.asarray(a).shape))
        ),
        params,
    )


def test_fold_constants_stacked_shapes(sample_config):
    from syllable_detector_tpu.kernels.fused_detector import (
        fold_constants,
        fold_constants_stacked,
    )

    spec, params = detector_spec_from_config(sample_config)
    plist = [_perturbed_params(params, i) for i in range(3)]
    operands, meta = fold_constants_stacked(spec, plist)
    single, meta1 = fold_constants(spec, params)
    assert meta == meta1
    # DFT matrix stays shared (spec-derived); every net operand gains a
    # leading channel axis
    assert operands[0].shape == single[0].shape
    for op, s in zip(operands[1:], single[1:]):
        assert op.shape == (3, *s.shape)
    np.testing.assert_allclose(operands[0], single[0])


def test_fused_batch_distinct_nets(sample_config, audio):
    import jax

    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )
    from syllable_detector_tpu.models.detector import offline_outputs
    from syllable_detector_tpu.models.neural_net import stack_params

    spec, params = detector_spec_from_config(sample_config)
    n = 8000
    xs = jnp.stack([jnp.asarray(audio[i : i + n]) for i in range(3)])
    plist = [_perturbed_params(params, i) for i in range(3)]
    got = np.asarray(
        fused_batch_offline_outputs(spec, plist, xs, tile=64, interpret=True)
    )
    want = np.asarray(
        jax.vmap(lambda p, x: offline_outputs(spec, p, x))(
            stack_params(plist), xs
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
    # the channels genuinely differ (distinct nets produce distinct outputs
    # even though every input column here overlaps heavily)
    assert np.abs(got[0] - got[1]).max() > 1e-4


def test_fused_batch_distinct_slabbed(sample_config, audio):
    import jax

    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )
    from syllable_detector_tpu.models.detector import offline_outputs
    from syllable_detector_tpu.models.neural_net import stack_params

    spec, params = detector_spec_from_config(sample_config)
    n = 8000
    c = 5
    xs = jnp.stack([jnp.asarray(audio[i : i + n]) for i in range(c)])
    plist = [_perturbed_params(params, 10 + i) for i in range(c)]
    slabbed = np.asarray(
        fused_batch_offline_outputs(
            spec, plist, xs, tile=64, interpret=True, slab_channels=2
        )
    )
    want = np.asarray(
        jax.vmap(lambda p, x: offline_outputs(spec, p, x))(
            stack_params(plist), xs
        )
    )
    np.testing.assert_allclose(slabbed, want, rtol=1e-3, atol=2e-4)


def test_fused_batch_distinct_wrong_count(sample_config, audio):
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.stack([jnp.asarray(audio[:8000])] * 3)
    with pytest.raises(ValueError, match="per-channel networks"):
        fused_batch_offline_outputs(
            spec, [params, params], xs, tile=64, interpret=True
        )


def test_fused_batch_distinct_split_tier(sample_config, audio):
    # the bf16 split precision ladder composes with per-channel operands
    # (stacked hi/lo halves ride the same BlockSpec indexing)
    import jax

    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )
    from syllable_detector_tpu.models.detector import offline_outputs
    from syllable_detector_tpu.models.neural_net import stack_params

    spec, params = detector_spec_from_config(sample_config)
    n = 8000
    xs = jnp.stack([jnp.asarray(audio[i : i + n]) for i in range(3)])
    plist = [_perturbed_params(params, 20 + i) for i in range(3)]
    got = np.asarray(
        fused_batch_offline_outputs(
            spec, plist, xs, tile=64, interpret=True, split=True
        )
    )
    want = np.asarray(
        jax.vmap(lambda p, x: offline_outputs(spec, p, x))(
            stack_params(plist), xs
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# FLAT batched layout (single-stream kernel over concatenated channel slabs)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("distinct", [False, True])
def test_flat_batch_matches_vmap(sample_config, audio, distinct):
    import jax

    from syllable_detector_tpu.kernels.fused_detector import (
        fused_flat_batch_offline_outputs,
    )
    from syllable_detector_tpu.models.detector import offline_outputs
    from syllable_detector_tpu.models.neural_net import stack_params

    spec, params = detector_spec_from_config(sample_config)
    n = 9000
    c = 3
    xs = jnp.stack([jnp.asarray(audio[i : i + n]) for i in range(c)])
    if distinct:
        p = [_perturbed_params(params, 30 + i) for i in range(c)]
        want = np.asarray(
            jax.vmap(lambda pp, x: offline_outputs(spec, pp, x))(
                stack_params(p), xs
            )
        )
    else:
        p = params
        want = np.asarray(
            jax.vmap(lambda x: offline_outputs(spec, params, x))(xs)
        )
    got = np.asarray(
        fused_flat_batch_offline_outputs(spec, p, xs, tile=64, interpret=True)
    )
    assert got.shape[0] == c and got.shape[2] == want.shape[2]
    np.testing.assert_allclose(
        got, want[:, : got.shape[1]], rtol=1e-3, atol=2e-4
    )


def test_flat_batch_zero_copy_input(sample_config, audio):
    """The flat 1-D packed input form (flat_batch_input_samples layout)
    equals the 2-D form exactly."""
    from syllable_detector_tpu.kernels.fused_detector import (
        flat_batch_input_samples,
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    c, n_evals, tile = 3, 128, 64
    per_ch, total = flat_batch_input_samples(spec, n_evals, c, tile=tile)
    flat = np.zeros(total, np.float32)
    for ch in range(c):
        m = min(per_ch, len(audio) - ch)
        flat[ch * per_ch : ch * per_ch + m] = audio[ch : ch + m]
    got = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, params, jnp.asarray(flat), tile=tile, n_evals=n_evals,
            channels=c, interpret=True,
        )
    )
    xs2d = jnp.asarray(
        np.stack([flat[ch * per_ch : (ch + 1) * per_ch] for ch in range(c)])
    )
    want = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, params, xs2d, tile=tile, n_evals=n_evals, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_flat_batch_input_validation(sample_config, audio):
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    flat = jnp.zeros(1000, jnp.float32)
    with pytest.raises(ValueError, match="channels"):
        fused_flat_batch_offline_outputs(
            spec, params, flat, tile=64, n_evals=64, interpret=True
        )
    with pytest.raises(ValueError, match="exactly"):
        fused_flat_batch_offline_outputs(
            spec, params, flat, tile=64, n_evals=64, channels=2,
            interpret=True,
        )


def test_flat_batch_pre_slabbed_input(sample_config, audio):
    """The pre-slabbed 2-D [need_rows, hop] form (true zero copy) equals
    the flat 1-D form exactly."""
    from syllable_detector_tpu.kernels.fused_detector import (
        flat_batch_input_samples,
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    c, n_evals, tile = 3, 128, 64
    per_ch, total = flat_batch_input_samples(spec, n_evals, c, tile=tile)
    flat = np.zeros(total, np.float32)
    for ch in range(c):
        m = min(per_ch, len(audio) - ch)
        flat[ch * per_ch : ch * per_ch + m] = audio[ch : ch + m]
    a = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, params, jnp.asarray(flat), tile=tile, n_evals=n_evals,
            channels=c, interpret=True,
        )
    )
    b = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, params, jnp.asarray(flat.reshape(-1, spec.hop)),
            tile=tile, n_evals=n_evals, channels=c, interpret=True,
        )
    )
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


@pytest.mark.parametrize("distinct", [False, True])
def test_grid_layout_still_matches(sample_config, audio, distinct):
    """layout='grid' (the channel-grid kernel: mesh shards + diagnostic
    tiers ride it) keeps matching the flat default."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    n = 8000
    c = 3
    xs = jnp.stack([jnp.asarray(audio[i : i + n]) for i in range(c)])
    p = (
        [_perturbed_params(params, 40 + i) for i in range(c)]
        if distinct
        else params
    )
    flat = np.asarray(
        fused_batch_offline_outputs(spec, p, xs, tile=64, interpret=True)
    )
    grid = np.asarray(
        fused_batch_offline_outputs(
            spec, p, xs, tile=64, interpret=True, layout="grid"
        )
    )
    np.testing.assert_allclose(flat, grid, rtol=1e-5, atol=1e-6)
    # the grid slab path too
    grid_slab = np.asarray(
        fused_batch_offline_outputs(
            spec, p, xs, tile=64, interpret=True, layout="grid",
            slab_channels=2,
        )
    )
    np.testing.assert_allclose(grid_slab, grid, rtol=1e-6, atol=1e-7)


def test_flat_router_falls_back_to_grid_on_hbm(monkeypatch, sample_config, audio):
    """Shapes whose flat footprint would exceed HBM route to the
    memory-safe grid path instead of raising."""
    import jax

    from syllable_detector_tpu.kernels import fused_detector as fd

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.stack([jnp.asarray(audio[:8000])] * 3)
    monkeypatch.setattr(fd, "_flat_hbm_budget", lambda: 1)
    called = {}

    def fake_grid(spec_, meta, operands, xs_, *a, **k):
        called["grid"] = True
        return jnp.zeros((3, 4, spec_.net.outputs), jnp.float32)

    monkeypatch.setattr(fd, "_batch_core_slabbed", fake_grid)
    out = fd.fused_batch_offline_outputs(
        spec, params, xs, interpret=False
    )
    assert called.get("grid")

    # interpret mode (CPU tests) ignores the budget and stays flat
    called.clear()
    out2 = fd.fused_batch_offline_outputs(spec, params, xs, interpret=True)
    assert "grid" not in called and out2.shape[0] == 3


def test_flat_hbm_budget_scales_with_device(monkeypatch):
    """The HBM guard derives its budget from the device's reported memory
    limit (so a larger chip generation raises the ceiling), falling back
    to the measured v5e constant when stats are unavailable."""
    import jax

    from syllable_detector_tpu.kernels import fused_detector as fd

    class _Dev:
        def __init__(self, stats):
            self._stats = stats

        def memory_stats(self):
            return self._stats

    def fresh_budget():
        # the budget memoizes per process (the device limit is constant,
        # and the live-drain router consults it 2-3x per drain) — reset
        # the memo so each monkeypatched device is actually queried
        monkeypatch.setattr(fd, "_flat_hbm_budget_cache", None)
        return fd._flat_hbm_budget()

    # a hypothetical 96 GiB chip: budget = limit - headroom
    monkeypatch.setattr(
        jax, "local_devices", lambda: [_Dev({"bytes_limit": 96 << 30})]
    )
    assert fresh_budget() == (96 << 30) - fd._FLAT_HBM_HEADROOM
    # memoized: a second call must NOT re-query the (now different) device
    monkeypatch.setattr(
        jax, "local_devices", lambda: (_ for _ in ()).throw(RuntimeError())
    )
    assert fd._flat_hbm_budget() == (96 << 30) - fd._FLAT_HBM_HEADROOM
    # a tiny limit keeps at least half the chip usable
    monkeypatch.setattr(
        jax, "local_devices", lambda: [_Dev({"bytes_limit": 6 << 30})]
    )
    assert fresh_budget() == 3 << 30
    # no stats (CPU backend) -> measured fallback
    monkeypatch.setattr(jax, "local_devices", lambda: [_Dev(None)])
    assert fresh_budget() == fd._FLAT_HBM_BUDGET
    # backend error -> fallback, NOT cached (the backend may not be up yet)
    monkeypatch.setattr(
        jax, "local_devices", lambda: (_ for _ in ()).throw(RuntimeError())
    )
    assert fresh_budget() == fd._FLAT_HBM_BUDGET
    assert fd._flat_hbm_budget_cache is None


def test_flat_rejects_impossible_n_evals(sample_config, audio):
    """The flat default keeps the grid path's contract: n_evals beyond the
    stream raises instead of silently evaluating zero padding."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.stack([jnp.asarray(audio[:8000])] * 2)
    with pytest.raises(ValueError, match="needs more than"):
        fused_batch_offline_outputs(
            spec, params, xs, interpret=True, n_evals=10**6
        )


def test_flat_channels_redundant_with_2d(sample_config, audio):
    """[C, n] plus a redundant channels=C is accepted (and validated)."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.stack([jnp.asarray(audio[:8000])] * 2)
    out = fused_flat_batch_offline_outputs(
        spec, params, xs, tile=64, interpret=True, channels=2
    )
    assert out.shape[0] == 2
    with pytest.raises(ValueError, match="does not match"):
        fused_flat_batch_offline_outputs(
            spec, params, xs, tile=64, interpret=True, channels=3
        )


# ---------------------------------------------------------------------------
# multi-hop-per-row flat slab (r4: lifts the distinct-net HBM ceiling)
# ---------------------------------------------------------------------------


def test_flat_multi_hop_matches_k1(sample_config, audio):
    """hops_per_row=8 packs 8 hop-rows per slab row; the part-based frame
    rebuild keeps the per-frame GEMM accumulation order identical, so the
    outputs match the k=1 layout (bit-exact on hardware; CPU interpret
    differs only by dot blocking ~1e-7)."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.stack([jnp.asarray(audio[:50000])] * 3) * jnp.asarray(
        [[1.0], [0.8], [1.2]], jnp.float32
    )
    o1 = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, params, xs, tile=256, interpret=True
        )
    )
    o8 = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, params, xs, tile=256, interpret=True, hops_per_row=8
        )
    )
    assert o1.shape == o8.shape and o1.shape[1] > 0
    np.testing.assert_allclose(o8, o1, rtol=0, atol=1e-6)


def test_flat_multi_hop_distinct_nets(sample_config, audio):
    """Per-channel DISTINCT nets on the multi-hop layout: per-channel
    operand BlockSpec indexing rides the same flat_blocks_per_ch contract
    (in q-sized blocks)."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.stack([jnp.asarray(audio[:40000])] * 3)
    plist = [_perturbed_params(params, i) for i in range(3)]
    o1 = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, plist, xs, tile=128, interpret=True
        )
    )
    o8 = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, plist, xs, tile=128, interpret=True, hops_per_row=8
        )
    )
    np.testing.assert_allclose(o8, o1, rtol=0, atol=1e-6)
    assert np.abs(o1[0] - o1[1]).max() > 1e-4  # genuinely distinct


def test_flat_multi_hop_pre_slabbed_form(sample_config, audio):
    """The zero-copy pre-slabbed 2-D form ([need_rows, k*hop]) equals the
    [C, n] form exactly."""
    from syllable_detector_tpu.kernels.fused_detector import (
        flat_batch_input_samples,
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    c, n_evals, tile, k = 3, 128, 64, 8
    per_ch, total = flat_batch_input_samples(
        spec, n_evals, c, tile=tile, hops_per_row=k
    )
    L = spec.hop * k
    flat = np.zeros(total, np.float32)
    for ch in range(c):
        m = min(per_ch, len(audio) - ch)
        flat[ch * per_ch : ch * per_ch + m] = audio[ch : ch + m]
    got = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, params, jnp.asarray(flat.reshape(-1, L)), tile=tile,
            n_evals=n_evals, channels=c, interpret=True, hops_per_row=k,
        )
    )
    xs2d = jnp.asarray(
        np.stack([flat[ch * per_ch : (ch + 1) * per_ch] for ch in range(c)])
    )
    want = np.asarray(
        fused_flat_batch_offline_outputs(
            spec, params, xs2d, tile=tile, n_evals=n_evals, interpret=True,
            hops_per_row=k,
        )
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_flat_multi_hop_tile_divisibility(sample_config, audio):
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.stack([jnp.asarray(audio[:20000])] * 2)
    with pytest.raises(ValueError, match="8\\*hops_per_row"):
        fused_flat_batch_offline_outputs(
            spec, params, xs, tile=100, interpret=True, hops_per_row=8
        )


def test_flat_multi_hop_shrinks_hbm_estimate(sample_config):
    """k=8 lane pad 1056->1152 (1.09x) vs k=1's 132->256 (1.94x): the
    slab estimate shrinks ~1.8x, which is what lifts the distinct c=1024
    cap past 8192 evals/channel on a v5e."""
    from syllable_detector_tpu.kernels import fused_detector as fd

    spec, _ = detector_spec_from_config(sample_config)
    e1 = fd._flat_hbm_estimate(spec, 8192, 1024, 512, True)
    e8 = fd._flat_hbm_estimate(spec, 8192, 1024, 512, True, hops_per_row=8)
    assert e8 < e1
    assert e1 > fd._FLAT_HBM_BUDGET        # k=1 would be guarded out
    assert e8 <= fd._FLAT_HBM_BUDGET       # k=8 fits the measured budget


def test_flat_router_escalates_to_multi_hop(sample_config, audio, monkeypatch):
    """fused_batch over budget at k=1 but within it at k=8 routes to the
    multi-hop flat layout, not the grid fallback."""
    from syllable_detector_tpu.kernels import fused_detector as fd

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.stack([jnp.asarray(audio[:20000])] * 2)
    ne = 128
    # the router checks k=1 with the out_t default; k=8 stays plain
    e1 = fd._flat_hbm_estimate(spec, ne, 2, 128, False, out_t=True)
    e8 = fd._flat_hbm_estimate(
        spec, ne, 2, 128, False, hops_per_row=8, out_t=True
    )
    assert e8 < e1
    monkeypatch.setattr(fd, "_flat_hbm_budget", lambda: (e1 + e8) // 2)
    seen = {}
    real = fd.fused_flat_batch_offline_outputs

    def spy(*a, **kw):
        seen["k"] = kw.get("hops_per_row", 1)
        kw["interpret"] = True  # CPU test: routing decided, now interpret
        return real(*a, **kw)

    monkeypatch.setattr(fd, "fused_flat_batch_offline_outputs", spy)
    out = fd.fused_batch_offline_outputs(
        spec, params, xs, tile=128, interpret=False, n_evals=ne
    )
    assert seen.get("k") == 8
    want = real(spec, params, xs, tile=128, interpret=True, n_evals=ne)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=0, atol=1e-6
    )


def test_phase_split_matches(sample_config, audio):
    """phase_split runs the DFT->VPU->conv->MLP pipeline over tile/S row
    sub-blocks (r3 verdict #5 A/B: give Mosaic independent MXU/VPU chains
    to overlap); semantics identical to the whole-tile phases."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    x = jnp.asarray(audio[:60000])
    o1 = np.asarray(
        fused_offline_outputs(spec, params, x, tile=256, interpret=True)
    )
    for s in (2, 4):
        os_ = np.asarray(
            fused_offline_outputs(
                spec, params, x, tile=256, interpret=True, phase_split=s
            )
        )
        np.testing.assert_allclose(os_, o1, rtol=0, atol=1e-6)
    with pytest.raises(ValueError, match="phase_split"):
        fused_offline_outputs(
            spec, params, x, tile=256, interpret=True, phase_split=7
        )


def test_out_t_transposed_output_matches(sample_config, audio):
    """out_t writes [o_pad, tile] output blocks (16x smaller HBM output);
    results identical to the row-major layout on single-stream and flat
    batched (shared + distinct) paths."""
    from syllable_detector_tpu.kernels import fused_detector as fd

    spec, params = detector_spec_from_config(sample_config)
    x = jnp.asarray(audio[:60000])
    o1 = np.asarray(
        fd.fused_offline_outputs(spec, params, x, tile=256, interpret=True)
    )
    ot = np.asarray(
        fd.fused_offline_outputs(
            spec, params, x, tile=256, interpret=True, out_t=True
        )
    )
    np.testing.assert_array_equal(o1, ot)

    xs = jnp.stack([jnp.asarray(audio[:40000])] * 3)
    plist = [_perturbed_params(params, i) for i in range(3)]
    # spy on _fused_call so the flat [C, n] branch demonstrably FORWARDS
    # out_t (it silently dropped it once — both sides then compared the
    # same layout and this test was vacuous)
    seen = []
    real_call = fd._fused_call

    def spy(*a, **kw):
        seen.append(kw.get("out_t", False))
        return real_call(*a, **kw)

    fd._fused_call = spy
    try:
        for p in (params, plist):
            seen.clear()
            b1 = np.asarray(
                fd.fused_flat_batch_offline_outputs(
                    spec, p, xs, tile=128, interpret=True, out_t=False
                )
            )
            bt = np.asarray(
                fd.fused_flat_batch_offline_outputs(
                    spec, p, xs, tile=128, interpret=True, out_t=True
                )
            )
            assert seen == [False, True]
            np.testing.assert_array_equal(b1, bt)
    finally:
        fd._fused_call = real_call
    # the estimate drops: distinct c=1024 x 8192 evals fits under the
    # fallback budget with the transposed output
    e = fd._flat_hbm_estimate(spec, 8192, 1024, 512, True, out_t=True)
    assert e <= fd._FLAT_HBM_BUDGET

    # the out_t estimate tracks the net's real padded output width: a
    # 9-output net (o_pad 16) must cost more than the 1-output sample
    # net (o_pad 8), or near-budget shapes get admitted and OOM on device
    import dataclasses

    net9 = dataclasses.replace(
        spec.net,
        layer_sizes=spec.net.layer_sizes[:-1]
        + ((spec.net.layer_sizes[-1][0], 9),),
    )
    spec9 = dataclasses.replace(spec, net=net9)
    for k in (1, 8):
        e8 = fd._flat_hbm_estimate(spec, 4096, 64, 512, False,
                                   hops_per_row=k, out_t=True)
        e16 = fd._flat_hbm_estimate(spec9, 4096, 64, 512, False,
                                    hops_per_row=k, out_t=True)
        assert e16 > e8


# _deepen lives in utils/synth.py (shared with scripts/deep_net_hw.py
# and the detector/bank tests)
from syllable_detector_tpu.utils.synth import deepen_net as _deepen


@pytest.mark.parametrize("transfer", ["LogSig", "SatLin", "TanSig"])
def test_fused_deep_net(sample_config, audio, transfer):
    """2-hidden-layer nets (any supported mid transfer) through the fused
    kernel match the unfused pipeline."""
    spec, params = detector_spec_from_config(sample_config)
    spec2, params2 = _deepen(spec, params, transfer=transfer)
    assert fusable(spec2)
    _, meta = fold_constants(spec2, params2)
    assert meta.n_mids == 2
    want = np.asarray(offline_outputs(spec2, params2, jnp.asarray(audio)))
    got = np.asarray(
        fused_offline_outputs(spec2, params2, jnp.asarray(audio), interpret=True)
    )
    np.testing.assert_allclose(got, want[: got.shape[0]], rtol=1e-3, atol=2e-4)


def test_flat_batch_deep_distinct(sample_config, audio):
    """Distinct deep nets through the flat batched path (stacked mids)."""
    import jax

    from syllable_detector_tpu.kernels.fused_detector import (
        fused_flat_batch_offline_outputs,
    )
    from syllable_detector_tpu.models.neural_net import stack_params

    spec, params = detector_spec_from_config(sample_config)
    spec2, params2 = _deepen(spec, params)
    c, n = 3, 9000
    xs = jnp.stack([jnp.asarray(audio[i : i + n]) for i in range(c)])
    plist = [
        _perturbed_params(params2, 40 + i) for i in range(c)
    ]
    want = np.asarray(
        jax.vmap(lambda pp, x: offline_outputs(spec2, pp, x))(
            stack_params(plist), xs
        )
    )
    got = np.asarray(
        fused_flat_batch_offline_outputs(
            spec2, plist, xs, tile=64, interpret=True
        )
    )
    np.testing.assert_allclose(
        got, want[:, : got.shape[1]], rtol=1e-3, atol=2e-4
    )


def test_unfusable_fallback_honors_n_evals(sample_config):
    """The non-fusable fallbacks obey the same n_evals contract as the
    kernel paths (slice to n_evals, raise when impossible) — callers size
    downstream buffers to it."""
    from syllable_detector_tpu.config.model_format import ProcessingSpec
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_batch_offline_outputs,
    )

    cfg = dataclasses.replace(
        sample_config, process_inputs=[ProcessingSpec("normalize")]
    )
    spec, params = detector_spec_from_config(cfg)
    assert not fusable(spec)
    x = make_audio(np.random.default_rng(1), seconds=0.2)
    full = np.asarray(offline_outputs(spec, params, jnp.asarray(x)))
    got = np.asarray(
        fused_offline_outputs(spec, params, jnp.asarray(x), n_evals=3)
    )
    np.testing.assert_array_equal(got, full[:3])
    with pytest.raises(ValueError, match="n_evals"):
        fused_offline_outputs(
            spec, params, jnp.asarray(x), n_evals=len(full) + 1
        )

    xs = jnp.stack([jnp.asarray(x)] * 2)
    fullb = np.asarray(fused_batch_offline_outputs(spec, params, xs))
    gotb = np.asarray(fused_batch_offline_outputs(spec, params, xs, n_evals=3))
    assert gotb.shape == (2, 3, spec.net.outputs)
    # same-path comparison: the vmapped fallback drifts last-ulp from the
    # single-stream path, so pin the slicing contract, not cross-path bits
    np.testing.assert_array_equal(gotb, fullb[:, :3])
    with pytest.raises(ValueError, match="n_evals"):
        fused_batch_offline_outputs(spec, params, xs, n_evals=len(full) + 1)


def test_flat_hbm_estimate_out_t_pads_tile_lanes(sample_config):
    """The k=1 out_t output term must lane-pad tile to a 128 multiple:
    the live router clamps flat_tile to 8-multiples, so small drain
    buckets would otherwise be under-estimated up to 16x and admitted
    shapes could OOM on device."""
    import syllable_detector_tpu.kernels.fused_detector as fd

    spec, _ = detector_spec_from_config(sample_config)
    tile = 8
    _, hop, _, rows2d, halo_rows, r = fd._flat_geometry(spec, 16, tile, False)
    grid_total = max(1, -(-(4 * r - halo_rows) // tile))
    need_rows = (grid_total - 1) * tile + rows2d
    o_pad = fd._round_up(spec.net.outputs, 8)
    want = (
        need_rows * fd._round_up(hop, fd.LANE) * 4
        + grid_total * o_pad * fd._round_up(tile, fd.LANE) * 4
    )
    assert fd._flat_hbm_estimate(spec, 16, 4, tile, False, out_t=True) == want


def test_flat_admission_ladder(sample_config, monkeypatch):
    """ONE admission policy for the router and the mesh shard path:
    k=1 flat under budget, k=8 when only the multi-hop slab fits, grid
    when nothing does."""
    import syllable_detector_tpu.kernels.fused_detector as fd

    spec, _ = detector_spec_from_config(sample_config)
    e1 = fd._flat_hbm_estimate(spec, 2048, 64, 512, True, out_t=True)
    e8 = fd._flat_hbm_estimate(
        spec, 2048, 64, 512, True, hops_per_row=8, out_t=True
    )
    assert e8 < e1  # the capacity tier really is smaller
    monkeypatch.setattr(fd, "_flat_hbm_budget", lambda: e1)
    assert fd.flat_admission(spec, 2048, 64, 512, True) == ("flat", 1)
    monkeypatch.setattr(fd, "_flat_hbm_budget", lambda: e8)
    assert fd.flat_admission(spec, 2048, 64, 512, True) == ("flat", 8)
    monkeypatch.setattr(fd, "_flat_hbm_budget", lambda: e8 - 1)
    assert fd.flat_admission(spec, 2048, 64, 512, True) == ("grid", 1)


def test_flat_admission_v5e_routing_table(sample_config, monkeypatch):
    """Pin the router's concrete decisions at the v5e's measured 11 GiB
    budget over the deployment (c, n_evals) grid. The k=8 capacity tier
    costs ~25% (r4 hardware A/B: distinct 113.3M k=1 vs 80.4M k=8), so a
    regression in the admission estimates — e.g. one that stopped
    assuming the transposed (out_t) output the flat launches actually
    use — must not silently escalate a k=1-servable shape. The pinned
    rows include the r4 hardware facts: distinct c=1024 ne=8192 at tile
    1024 RUNS at k=1 (9.28 GiB measured vs 12.8 OOM pre-out_t)."""
    import syllable_detector_tpu.kernels.fused_detector as fd

    spec, _ = detector_spec_from_config(sample_config)
    monkeypatch.setattr(fd, "_flat_hbm_budget", lambda: 11 << 30)

    table = [
        # (c, n_evals, tile, distinct) -> (layout, hops_per_row)
        ((1024, 2048, 2048, False), ("flat", 1)),   # bench batched_c1024
        ((1024, 8192, 1024, True), ("flat", 1)),    # bench distinct_c1024
        ((64, 8192, 1024, True), ("flat", 1)),      # bench c64 distinct
        ((4096, 2048, 2048, False), ("flat", 1)),
        ((1024, 16384, 1024, True), ("flat", 8)),   # capacity tier
        ((8192, 2048, 2048, False), ("flat", 8)),
        ((1024, 32768, 1024, True), ("grid", 1)),   # memory-safe floor
        ((4096, 8192, 1024, True), ("grid", 1)),
    ]
    for (c, ne, tile, distinct), want in table:
        got = fd.flat_admission(spec, ne, c, tile, distinct)
        assert got == want, (c, ne, tile, distinct, got, want)
        # the structural invariant behind the table: k=8 is entered ONLY
        # when the k=1 out_t footprint genuinely exceeds the budget
        if got == ("flat", 8):
            assert fd._flat_hbm_estimate(
                spec, ne, c, tile, distinct, out_t=True
            ) > fd._flat_hbm_budget()


def test_flat_batch_redundant_channels_keeps_2d_form(sample_config):
    """[C, n] with a redundant channels=C stays [C, n] even when n
    coincides with the slab width (hop) — the documented tie-break."""
    from syllable_detector_tpu.kernels.fused_detector import (
        fused_flat_batch_offline_outputs,
    )

    spec, params = detector_spec_from_config(sample_config)
    xs = jnp.zeros((4, spec.hop), jnp.float32)  # too short for any eval
    out = fused_flat_batch_offline_outputs(
        spec, params, xs, channels=4, interpret=True
    )
    assert out.shape == (4, 0, spec.net.outputs)


def test_device_operand_cache_never_caches_tracers(sample_config):
    """Calling the fused paths UNDER A TRACE (a caller's jit/scan — the
    tuner's scanned measurement does exactly this) must not leak tracers
    into the device-resident operand cache; the r5 on-chip tuner run hit
    jax.errors.UnexpectedTracerError here before the guard."""
    import jax
    import jax.numpy as jnp

    from syllable_detector_tpu.kernels import fused_detector as fd
    from syllable_detector_tpu.models.detector import (
        detector_spec_from_config,
    )

    spec, params = detector_spec_from_config(sample_config)
    n = fd.fused_input_samples(spec, 64, tile=64)
    x = jnp.asarray(
        np.random.default_rng(3)
        .standard_normal((n // spec.hop, spec.hop))
        .astype(np.float32)
    )

    fd._dev_operand_cache.clear()

    @jax.jit
    def traced(x):
        return fd.fused_offline_outputs(spec, params, x, tile=64, n_evals=64)

    out1 = traced(x)  # trace 1: device_put under trace -> must not cache
    assert not fd._dev_operand_cache, (
        "operand cache polluted under trace"
    )

    @jax.jit
    def traced2(x):  # a second, separate trace (the second tuner tile)
        o = fd.fused_offline_outputs(spec, params, x, tile=64, n_evals=64)
        return o * 2.0

    out2 = traced2(x)  # pre-guard this raised UnexpectedTracerError
    assert jnp.all(jnp.isfinite(out1)) and jnp.all(jnp.isfinite(out2))

    # eager call: NOW the cache may hold concrete arrays only
    out3 = fd.fused_offline_outputs(spec, params, x, tile=64, n_evals=64)
    assert jnp.allclose(out3, out1)
    for _, put in fd._dev_operand_cache.values():
        assert all(not isinstance(p, jax.core.Tracer) for p in put)
