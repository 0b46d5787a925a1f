"""Platform selection helpers.

The TPU environment's sitecustomize force-appends its own platform to
jax_platforms, overriding the JAX_PLATFORMS environment variable. Every
CLI entry point calls `honor_env_platforms()` so `JAX_PLATFORMS=cpu
python -m g4s_tpu...` behaves as documented.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> None:
    """Point XLA's persistent compilation cache at the repo-local
    .jax_cache directory (the one tests/conftest.py uses), so repeated
    bench/driver runs skip recompiles of unchanged programs — on the
    remote-tunnel backend a cold compile of a large fused kernel can
    cost minutes."""
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def honor_env_platforms() -> None:
    enable_persistent_cache()
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    # always keep the CPU host backend available: the df64 tier and the
    # f64 oracles run their exact-double parts on jax.devices("cpu")
    # even when the accelerator platform is selected (JAX_PLATFORMS=axon
    # is exported by the environment itself)
    plats = env if "cpu" in env.split(",") else env + ",cpu"
    import jax
    if jax.config.jax_platforms != plats:
        jax.config.update("jax_platforms", plats)
