"""Test config: force local CPU with an 8-device virtual mesh.

The shell env pins JAX_PLATFORMS=axon (tunneled TPU) — every small op would
round-trip the tunnel.  Tests run on host CPU; sharding tests use the
8 virtual devices (SURVEY.md §4: distributed tests are the same tests under
a multi-device launcher, not a mock).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def frames():
    from cudf_tpu.utils.testing import make_random_frame

    return make_random_frame(500, seed=1)
