"""Test environment: force JAX onto a virtual 8-device CPU mesh.

The host environment presets JAX_PLATFORMS=axon (a real TPU tunnel);
tests must run on virtual CPU devices instead. A pytest plugin may have
imported jax already, so set the config through jax.config (effective
until the backend is first initialized) in addition to the env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above applies

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
