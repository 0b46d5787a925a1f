"""Trustworthy device timing over unreliable async runtimes.

The axon TPU tunnel (the remote-chip backend this image uses) does NOT
honor ``jax.block_until_ready``: it returns as soon as the dispatch is
enqueued, long before the device finishes.  Any harness that times
``h(x).block_until_ready()`` therefore measures host dispatch cost, not
device execution — silently reporting physically impossible throughput
(an 8.4M-element ``lax.sort`` "measured" 0.28 ms where a value-forcing
fetch shows ~39 ms).  This module is the one timing path every bench in
the repo uses; its contract holds on ANY backend because it never trusts
readiness APIs:

  completion is forced by HOST-FETCHING a scalar that data-depends on
  the result (``float(np.asarray(jnp.sum(r)))``) — the value cannot
  exist before the computation does.

Costs that the fetch adds (one extra reduction dispatch + one tunnel
round trip, ~25 ms here) are cancelled structurally: ``chain_time`` jits
``fori_loop(n, body)`` for two chain lengths n1 < n2 and reports the
slope ``(T(n2) - T(n1)) / (n2 - n1)``, so every per-dispatch and
per-fetch constant drops out.  The reference's own protocol is the same
idea on CPU (warmup + averaged reps, mm/src/mkl_spgemm.cpp:72-81);
this is that protocol made honest for an asynchronous remote device.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import numpy as np


def fetch_sync(x) -> float:
    """Force completion of ``x`` by host-fetching a dependent scalar.

    Returns the fetched checksum (useful as a side validation).  Works on
    pytrees: sums every float/int leaf.
    """
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    tot = 0.0
    for l in leaves:
        s = jnp.sum(jnp.asarray(l, jnp.float32)) if l.dtype != bool \
            else jnp.sum(l)
        tot += float(np.asarray(s))
    return tot


def roundtrip_s(n: int = 5) -> float:
    """Median tunnel round-trip of a tiny dispatch+fetch (subtract from
    single-shot timings; chain_time cancels it structurally instead)."""
    import jax
    import jax.numpy as jnp

    z = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    float(np.asarray(f(z)[0]))                       # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(f(z)[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_fn(f: Callable, *args, reps: int = 10, inner: int = 1,
            warmup: bool = True) -> float:
    """Per-call seconds of ``f(*args)``: reps sequential dispatches, then
    one value-forcing fetch of the last result; subtracts the measured
    round trip.  The device executes dispatches in order, so the last
    result's value bounds all reps.  Use when f can't be loop-chained
    (e.g. host-side staging inside); prefer chain_time otherwise."""
    r = f(*args)
    if warmup:
        fetch_sync(r)
    rt = roundtrip_s()

    def run(n):
        t0 = time.perf_counter()
        rr = r
        for _ in range(n):
            rr = f(*args)
        fetch_sync(rr)
        return time.perf_counter() - t0

    el = run(reps)
    # adaptive: resolve the per-call cost well above tunnel jitter with
    # one corrective jump (no recompile: same callable, more reps)
    if el - rt < 0.05 and reps < 4096:
        per_est = max((el - rt) / reps, 2e-6)
        reps = min(4096, int(0.1 / per_est) + 1)
        el = run(reps)
    return max((el - rt) / (reps * inner), 1e-12)


def chain_time(body: Callable, x, lens: Sequence[int] = (2, 30),
               tries: int = 3, min_delta_s: float = 0.05,
               max_len: int = 8192) -> float:
    """Per-iteration seconds of ``body`` via two-point chained fori_loop.

    body: x -> x' (same shape/dtype, so it chains). Jits
    ``fori_loop(0, n, lambda i, v: body(v), x)`` at n = lens[0] and
    lens[1]; per-iter = slope between the two, min-of-``tries`` each.
    All constants (dispatch, fetch round trip, loop setup) cancel.

    Adaptive: for kernels so fast that the requested chain delta drowns
    in tunnel jitter (the round trip here is ~25-30 ms), n2 doubles
    until T(n2) - T(n1) >= min_delta_s (capped at max_len iterations),
    so the slope is always measured over a resolvable interval.
    """
    import jax

    def timed(n):
        h = jax.jit(lambda v, _n=n: jax.lax.fori_loop(
            0, _n, lambda i, u: body(u), v))
        fetch_sync(h(x))                             # compile + warm
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            fetch_sync(h(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    n1, n2 = lens
    t1 = timed(n1)
    t2 = timed(n2)
    if t2 - t1 < min_delta_s and n2 < max_len:
        # single corrective jump (each new length costs one compile):
        # estimate per-iter from the unresolved slope, floor it at 2 us
        per_est = max((t2 - t1) / (n2 - n1), 2e-6)
        n2 = min(max_len, n1 + int(min_delta_s / per_est) + 1)
        t2 = timed(n2)
    return max((t2 - t1) / (n2 - n1), 1e-12)
