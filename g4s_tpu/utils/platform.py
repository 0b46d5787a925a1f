"""Platform selection helpers.

The TPU environment's sitecustomize force-appends its own platform to
jax_platforms, overriding the JAX_PLATFORMS environment variable. Every
CLI entry point calls `honor_env_platforms()` so `JAX_PLATFORMS=cpu
python -m g4s_tpu...` behaves as documented.
"""

from __future__ import annotations

import hashlib
import os


def machine_cache_dir(base: str) -> str:
    """Per-machine, per-platform-context compilation cache directory.

    XLA's CPU AOT results embed the COMPILE process's target features,
    and loading a mismatched entry warns 'could lead to execution errors
    such as SIGILL' (cpu_aot_loader.cc) — observed as hard aborts inside
    compilation_cache.get_executable_and_time. Two mismatch sources:
    (a) different hosts (different cpuinfo flags), and (b) the SAME host
    under different platform contexts — a TPU-attached process compiles
    its host-side CPU executables with +prefer-no-scatter/+prefer-no-
    gather tuning features that a pure-CPU (JAX_PLATFORMS=cpu) process
    then refuses/aborts on (reproduced round 4: full CPU suite aborted
    loading an entry written by a bench run). Suffix with a hash of
    cpuinfo flags AND the JAX_PLATFORMS context so each combination
    keeps its own cache."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
            else:
                flags = "generic"
    except OSError:
        flags = "generic"
    ctx = os.environ.get("JAX_PLATFORMS", "auto") or "auto"
    tag = hashlib.sha1(f"{flags}|{ctx}".encode()).hexdigest()[:8]
    return f"{base}-{tag}"


def enable_persistent_cache() -> None:
    """Point XLA's persistent compilation cache at the repo-local
    per-machine .jax_cache-<cpu-hash> directory (the one
    tests/conftest.py uses), so repeated bench/driver runs skip
    recompiles of unchanged programs — on the remote-tunnel backend a
    cold compile of a large fused kernel can cost minutes."""
    import jax
    cache = machine_cache_dir(os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def nocache_jit(fn):
    """jax.jit whose compiles bypass the persistent compilation cache.

    XLA's executable serializer ABORTS (SIGABRT inside
    executable.serialize(), jax compilation_cache.put_executable_and_time)
    on the largest df64 solver executables (~1e5-instruction unrolled
    modules), and deserializing previously-written entries of the same
    programs has segfaulted the read path — both reproduced full-suite,
    same test, fresh cache. Every call of the returned wrapper toggles
    jax_enable_compilation_cache off for its duration, so neither the
    write nor the read path ever touches these executables; the config
    flag is not part of jax's trace context, so toggling it does not
    invalidate jit caches."""
    import jax
    jitted = jax.jit(fn)

    def call(*args, **kwargs):
        # jax 0.9's compilation_cache.is_cache_used MEMOIZES the
        # enabled check (module globals _cache_checked/_cache_used), so
        # toggling jax_enable_compilation_cache alone no longer stops
        # the write path once any earlier compile used the cache —
        # reproduced round 4 as a native serializer abort inside
        # put_executable_and_time on the df64 initial_solve executable,
        # 30% into the full suite. The min-compile-time gate IS read
        # live at write time (compiler._cache_write), so raising it
        # around the call keeps these executables out of the cache on
        # every path; the enable toggle stays as defense in depth.
        old = jax.config.jax_enable_compilation_cache
        old_min = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update("jax_enable_compilation_cache", False)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1e30)
        try:
            return jitted(*args, **kwargs)
        finally:
            jax.config.update("jax_enable_compilation_cache", old)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", old_min)

    call._jitted = jitted
    return call


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
