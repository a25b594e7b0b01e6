"""Auto-tuner: sweep/caching logic and the router's tuned-tile lookup.

Real measurements need the TPU (scan-slope timing is meaningless on CPU
for these kernels); these tests inject a fake ``measure`` and pin the
selection, persistence, bucketing, and router-consultation contracts.
"""

import json

import numpy as np
import pytest

import syllable_detector_tpu.tuning as tuning
from syllable_detector_tpu.models.detector import detector_spec_from_config
from syllable_detector_tpu.tuning import (
    geometry_key,
    reset_tune_cache,
    tune_flat_batch,
    tune_single,
    tuned_flat_tile,
)


@pytest.fixture
def tune_cache(tmp_path, monkeypatch):
    path = tmp_path / "tune.json"
    monkeypatch.setenv("SD_TUNE_CACHE", str(path))
    reset_tune_cache()
    yield path
    reset_tune_cache()


def test_geometry_key_ignores_weights(sample_config):
    spec, _ = detector_spec_from_config(sample_config)
    spec2, _ = detector_spec_from_config(sample_config)
    assert geometry_key(spec) == geometry_key(spec2)
    import dataclasses

    spec3 = dataclasses.replace(spec, time_range=spec.time_range + 1)
    assert geometry_key(spec3) != geometry_key(spec)


def test_tune_flat_batch_picks_winner_and_persists(sample_config, tune_cache):
    spec, params = detector_spec_from_config(sample_config)
    scores = {512: 100.0, 1024: 130.0, 2048: 90.0}
    trials = tune_flat_batch(
        spec, params, c=64, n_evals=2048,
        measure=lambda tile, hops: scores[tile],
    )
    assert [t.tile for t in trials] == [1024, 512, 2048]
    assert trials[0].hops_per_row == 1

    # the winner is consulted back (same bucket)
    assert tuned_flat_tile(spec, 64, 2048, False) == 1024
    # power-of-two bucketing covers the neighborhood
    assert tuned_flat_tile(spec, 40, 1500, False) == 1024
    # different bucket / workload: no entry
    assert tuned_flat_tile(spec, 640, 2048, False) is None
    assert tuned_flat_tile(spec, 64, 2048, True) is None

    # the cache file is plain JSON with the full trial list
    cache = json.loads(tune_cache.read_text())
    (key,) = cache.keys()
    assert "shared" in key and "c64" in key and "ne2048" in key
    assert cache[key]["trials"] == [[1024, 1, 130.0], [512, 1, 100.0],
                                    [2048, 1, 90.0]]


def test_tune_flat_batch_skips_inadmissible_tiles(
    sample_config, tune_cache, monkeypatch
):
    """Tiles whose footprint exceeds HBM even at k=8 are skipped, and the
    ladder's k escalation is recorded in the trial."""
    import syllable_detector_tpu.kernels.fused_detector as fd

    spec, params = detector_spec_from_config(sample_config)
    e1 = fd._flat_hbm_estimate(spec, 2048, 64, 512, False, out_t=True)
    e8 = fd._flat_hbm_estimate(
        spec, 2048, 64, 512, False, hops_per_row=8, out_t=True
    )
    monkeypatch.setattr(fd, "_flat_hbm_budget", lambda: (e1 + e8) // 2)
    logs = []
    trials = tune_flat_batch(
        spec, params, c=64, n_evals=2048, tiles=(512, 100),
        measure=lambda tile, hops: 42.0, log=logs.append,
    )
    # 512 admitted at k=8 (the only 8-multiple under budget); 100 is not
    # an 8-multiple and is dropped before admission
    assert [(t.tile, t.hops_per_row) for t in trials] == [(512, 8)]
    assert tuned_flat_tile(spec, 64, 2048, False) == 512


def test_router_consults_tuned_tile(sample_config, tune_cache, monkeypatch):
    """fused_batch_offline_outputs (tile=None) launches the flat path
    with the cached tile instead of the baked default."""
    import jax.numpy as jnp

    import syllable_detector_tpu.kernels.fused_detector as fd

    spec, params = detector_spec_from_config(sample_config)
    tune_flat_batch(
        spec, params, c=2, n_evals=512,
        tiles=(512, 256), measure=lambda tile, hops: float(tile == 256),
    )
    assert tuned_flat_tile(spec, 2, 512, False) == 256

    seen = {}
    real = fd.fused_flat_batch_offline_outputs

    def spy(spec_, params_, xs_, tile=None, **kw):
        seen["tile"] = tile
        return real(spec_, params_, xs_, tile=tile, **kw)

    monkeypatch.setattr(fd, "fused_flat_batch_offline_outputs", spy)
    n = fd.fused_input_samples(spec, 512, tile=256)
    xs = jnp.zeros((2, n), jnp.float32)
    fd.fused_batch_offline_outputs(spec, params, xs, n_evals=512,
                                   interpret=True)
    assert seen["tile"] == 256

    # the small-drain clamp still applies on top of the cache: a 64-eval
    # call never launches a 256-row tile
    fd.fused_batch_offline_outputs(spec, params, xs, n_evals=64,
                                   interpret=True)
    assert seen["tile"] == 64

    # an explicit tile= always wins over the cache
    fd.fused_batch_offline_outputs(spec, params, xs, tile=64, n_evals=512,
                                   interpret=True)
    assert seen["tile"] == 64


def test_tune_single_persists_winner(sample_config, tune_cache):
    from syllable_detector_tpu.tuning import tuned_single_tile

    spec, params = detector_spec_from_config(sample_config)
    assert tuned_single_tile(spec) is None
    trials = tune_single(
        spec, params, tiles=(512, 1024),
        measure=lambda tile, hops: {512: 2.0, 1024: 1.0}[tile],
    )
    assert [t.tile for t in trials] == [512, 1024]
    # the winner is served back (the driver entry() consults this)
    assert tuned_single_tile(spec) == 512
    cache = json.loads(tune_cache.read_text())
    (key,) = cache.keys()
    assert "/single/" in key


def test_layout_revision_invalidates_stale_entries(
    sample_config, tune_cache, monkeypatch
):
    """A tune entry measured against an OLDER kernel layout must never be
    served: r4's out_t layout change moved the best distinct tile
    512 -> 1024, so a stale winner would silently cost ~10% in production.
    The layout revision is part of the cache key — bumping it orphans old
    entries (fallback to baked defaults), it does not serve them."""
    import syllable_detector_tpu.kernels.fused_detector as fd
    from syllable_detector_tpu.tuning import tuned_single_tile

    spec, params = detector_spec_from_config(sample_config)
    tune_flat_batch(spec, params, c=64, n_evals=2048,
                    tiles=(512,), measure=lambda tile, hops: 1.0)
    tune_single(spec, params, tiles=(512,), measure=lambda tile, hops: 1.0)
    assert tuned_flat_tile(spec, 64, 2048, False) == 512
    assert tuned_single_tile(spec) == 512
    # the key records the revision it was measured at
    for key in json.loads(tune_cache.read_text()):
        assert f"/rev{fd.FLAT_LAYOUT_REV}/" in key

    # simulate the next layout change: the entries written above are stale
    monkeypatch.setattr(fd, "FLAT_LAYOUT_REV", fd.FLAT_LAYOUT_REV + 1)
    reset_tune_cache()
    assert tuned_flat_tile(spec, 64, 2048, False) is None
    assert tuned_single_tile(spec) is None


def test_flat_key_separates_output_layouts(sample_config, tune_cache):
    """out_t (transposed output) and the legacy layout must not share an
    entry — they have different winners (r4 sweep)."""
    spec, params = detector_spec_from_config(sample_config)
    tune_flat_batch(spec, params, c=64, n_evals=2048,
                    tiles=(512,), measure=lambda tile, hops: 1.0)
    assert tuned_flat_tile(spec, 64, 2048, False, out_t=True) == 512
    assert tuned_flat_tile(spec, 64, 2048, False, out_t=False) is None


def test_corrupt_cache_is_ignored(sample_config, tune_cache):
    tune_cache.write_text("{not json")
    reset_tune_cache()
    spec, _ = detector_spec_from_config(sample_config)
    assert tuned_flat_tile(spec, 64, 2048, False) is None


def test_geometry_key_includes_transfers(sample_config):
    """Same layer sizes but different transfer functions must not share a
    tune entry — the in-kernel VPU work differs per transfer."""
    import dataclasses

    spec, _ = detector_spec_from_config(sample_config)
    net2 = dataclasses.replace(
        spec.net, transfers=("purelin",) * len(spec.net.transfers)
    )
    spec2 = dataclasses.replace(spec, net=net2)
    assert geometry_key(spec2) != geometry_key(spec)


def test_save_entry_survives_concurrent_writer(sample_config, tune_cache):
    """_save_entry re-reads the file inside the lock: an entry written by
    ANOTHER process after this process memoized the cache must survive the
    read-modify-write (the stale-memo lost-update bug)."""
    spec, params = detector_spec_from_config(sample_config)
    tune_flat_batch(spec, params, c=2, n_evals=64,
                    tiles=(64,), measure=lambda tile, hops: 1.0)
    # memoize the current cache in-process
    assert tuned_flat_tile(spec, 2, 64, False) == 64
    # simulate another process appending an entry directly to the file
    cache = json.loads(tune_cache.read_text())
    cache["other/process/entry"] = {"tile": 512}
    tune_cache.write_text(json.dumps(cache))
    # this process writes a new entry from its (stale) memo epoch
    tune_flat_batch(spec, params, c=16, n_evals=64,
                    tiles=(64,), measure=lambda tile, hops: 1.0)
    final = json.loads(tune_cache.read_text())
    assert "other/process/entry" in final  # not lost
    assert len(final) == 3


def test_main_errors_when_nothing_admissible(sample_config, tune_cache,
                                             tmp_path, capsys):
    """A typo'd --tiles list (no multiple of 8) must not look like a
    successful tune: exit 1, nothing cached, a log line per skip."""
    net = tmp_path / "net.txt"
    net.write_text(open("/root/reference/sample.txt").read())
    rc = tuning.main(["-n", str(net), "--tiles", "100", "300",
                      "--workload", "single"])
    assert rc == 1
    assert not tune_cache.exists()
    err = capsys.readouterr().err
    assert "not a multiple of 8" in err
    assert "no admissible tile" in err
