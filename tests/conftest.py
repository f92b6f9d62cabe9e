"""Test configuration: force a virtual 8-device CPU mesh before JAX imports.

Multi-chip sharding paths are exercised on a simulated CPU mesh
(``xla_force_host_platform_device_count=8``) so TPU collectives are testable
without hardware, per SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config update after import is what actually pins tests to the CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
