"""Test configuration: force CPU JAX with 8 virtual devices so sharding tests
run anywhere (no TPU needed), per the multi-chip dry-run contract."""

import os

# the session environment pins JAX_PLATFORMS to the real TPU tunnel; tests
# must run on the host CPU with virtual devices, so overwrite it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# an `axon` pytest plugin imports jax before this conftest runs, so the env
# var above can be too late — force the platform through the live config too
# (backends initialize lazily, so this still wins)
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

from syllable_detector_tpu.config.model_format import load_config

SAMPLE_TXT = "/root/reference/sample.txt"


@pytest.fixture(scope="session")
def sample_config():
    return load_config(SAMPLE_TXT)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
