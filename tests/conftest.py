"""Test configuration: force CPU with 8 virtual devices.

This is the JAX analog of the reference's local `mpirun -n K` testing story
(reference: examples/bars-test/README.md:76-80): multi-device semantics are
exercised on a single host via XLA's virtual CPU devices.

Note: plugins (jaxtyping) import jax before this conftest runs, so setting
env vars alone is too late — use jax.config.update as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if a TPU is attached
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
