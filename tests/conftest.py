"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (halo exchange, psum reductions, data-parallel training)
is validated without TPU pods by forcing the host platform to expose 8
devices — the honest "distributed" testing strategy the reference never had
(its exchanger tests need real 13-proc MPI launches, citcoms/tests/test1.sh).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-appends itself to jax_platforms via sitecustomize,
# ignoring JAX_PLATFORMS — override it back to pure CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
