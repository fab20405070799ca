"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip hardware is unavailable in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices, per the framework's
multi-chip test strategy (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # unconditional: the session env may pin a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize may have registered a TPU plugin and overridden jax_platforms
# after env-var processing; re-pin to CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
