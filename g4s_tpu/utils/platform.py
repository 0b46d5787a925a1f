"""Platform selection helpers.

The TPU environment's sitecustomize force-appends its own platform to
jax_platforms, overriding the JAX_PLATFORMS environment variable. Every
CLI entry point calls `honor_env_platforms()` so `JAX_PLATFORMS=cpu
python -m g4s_tpu...` behaves as documented.
"""

from __future__ import annotations

import os


def honor_env_platforms() -> None:
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
