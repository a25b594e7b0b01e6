"""Processing chain and transfer function numerics."""

import jax.numpy as jnp
import numpy as np
import pytest

from syllable_detector_tpu.ops.processing import (
    apply_input_chain,
    apply_named,
    reverse_named,
    specs_to_chain,
)
from syllable_detector_tpu.ops.scaling import apply_scaling
from syllable_detector_tpu.ops.transfer import apply_transfer
from syllable_detector_tpu.config.model_format import ProcessingSpec


def test_mapminmax_forward_and_reverse(rng):
    d = 8
    xo = rng.standard_normal(d).astype(np.float32)
    g = (rng.random(d) + 0.5).astype(np.float32)
    spec = ProcessingSpec("mapminmax", xo, g, -1.0)
    names, params = specs_to_chain([spec])
    x = rng.standard_normal((3, d)).astype(np.float32)
    y = apply_named(jnp.asarray(x), "mapminmax", params[0])
    np.testing.assert_allclose(np.asarray(y), (x - xo) * g + (-1.0), rtol=1e-6)
    back = reverse_named(y, "mapminmax", params[0])
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-6)


def test_mapstd(rng):
    d = 5
    xo = rng.standard_normal(d).astype(np.float32)
    g = (rng.random(d) + 0.5).astype(np.float32)
    spec = ProcessingSpec("mapstd", xo, g, 0.25)
    _, params = specs_to_chain([spec])
    x = rng.standard_normal(d).astype(np.float32)
    y = apply_named(jnp.asarray(x), "mapstd", params[0])
    np.testing.assert_allclose(np.asarray(y), (x - xo) * g + 0.25, rtol=1e-6)


def test_l2normalize(rng):
    x = rng.standard_normal((4, 7)).astype(np.float32)
    y = apply_named(jnp.asarray(x), "l2normalize", {})
    want = x / np.sqrt((x**2).sum(axis=1, keepdims=True))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)


def test_normalize_and_zero_range(rng):
    x = rng.standard_normal(9).astype(np.float32)
    y = np.asarray(apply_named(jnp.asarray(x), "normalize", {}))
    assert y.min() == pytest.approx(-1.0, abs=1e-6)
    assert y.max() == pytest.approx(1.0, abs=1e-6)
    # zero range fills with -1 (NeuralNet.swift:84-87)
    const = jnp.full((5,), 3.25)
    np.testing.assert_array_equal(
        np.asarray(apply_named(const, "normalize", {})), np.full(5, -1.0, np.float32)
    )


def test_normalizestd(rng):
    x = rng.standard_normal(64).astype(np.float32)
    y = np.asarray(apply_named(jnp.asarray(x), "normalizestd", {}))
    assert y.mean() == pytest.approx(0.0, abs=1e-5)
    # population std (denominator N)
    assert np.sqrt(np.mean(y**2)) == pytest.approx(1.0, abs=1e-5)


def test_chain_order(rng):
    # l2normalize then mapminmax, like sample.txt
    d = 4
    specs = [
        ProcessingSpec("l2normalize"),
        ProcessingSpec("mapminmax", np.zeros(d, np.float32), np.full(d, 2.0, np.float32), -1.0),
    ]
    names, params = specs_to_chain(specs)
    x = np.asarray([3.0, 0.0, 4.0, 0.0], np.float32)
    y = np.asarray(apply_input_chain(jnp.asarray(x), names, params))
    np.testing.assert_allclose(y, np.asarray([0.2, -1.0, 0.6, -1.0]), rtol=1e-6)


def test_transfer_functions():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(apply_transfer(x, "TanSig")), np.tanh(np.asarray(x)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(apply_transfer(x, "LogSig")),
        1.0 / (1.0 + np.exp(-np.asarray(x))),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(apply_transfer(x, "PureLin")), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(apply_transfer(x, "SatLin")), [0.0, 0.0, 0.0, 0.5, 1.0]
    )
    with pytest.raises(ValueError):
        apply_transfer(x, "ReLU")


def test_scaling():
    x = jnp.asarray([1.0, 10.0, 100.0], jnp.float32)
    np.testing.assert_array_equal(np.asarray(apply_scaling(x, "linear")), np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(apply_scaling(x, "db")), [0.0, 20.0, 40.0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(apply_scaling(x, "log")), np.log(np.asarray(x)), rtol=1e-6
    )
