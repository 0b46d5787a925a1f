"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (halo exchange, psum reductions, data-parallel training)
is validated without TPU pods by forcing the host platform to expose 8
devices — the honest "distributed" testing strategy the reference never had
(its exchanger tests need real 13-proc MPI launches, citcoms/tests/test1.sh).
"""

import os
import resource

# Two full-suite runs segfaulted natively inside XLA:CPU compile/cache-load
# of the largest df64 solver graphs (deep-recursion compiler passes on a
# ~1e5-instruction unrolled module). The default 8 MB stack is marginal for
# those passes; raise the soft limit to 64 MB before JAX spawns any threads.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 64 << 20
if _soft != resource.RLIM_INFINITY and _soft < _want:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
    except (ValueError, OSError):
        pass

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

# Persistent XLA compilation cache: the suite is dominated by repeated
# compilations of the same solver graphs; cached reruns (driver checks,
# bisection, CI) skip them entirely. Per-machine dir: loading CPU AOT
# entries compiled on a different host can SIGILL (see
# g4s_tpu.utils.platform.machine_cache_dir).
from g4s_tpu.utils.platform import machine_cache_dir  # noqa: E402

# "-tests" namespace: two full-suite runs aborted inside the cache
# write/read paths (compilation_cache.put/get_executable_and_time on the
# largest df64 executables) while a bench/driver process was using the
# SAME cache directory concurrently; isolating the suite's cache removes
# that interference surface (suite-alone runs stay green).
_cache_dir = machine_cache_dir(os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir,
                 ".jax_cache-tests")))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
