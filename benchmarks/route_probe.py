#!/usr/bin/env python
"""Micro-probe: Benes route cost (host build + device apply) at the
stream sizes the ESC SpGEMM numeric phase would route (F ~ 8.4M sorted
stream, m2 ~ 13M padded stream), vs the lax.sort it would replace.

Correctness is asserted on-device against the numpy permutation.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def probe(m0: int, check: bool = True):
    import jax
    import jax.numpy as jnp
    from g4s_tpu.obs.devtime import time_fn
    from g4s_tpu.ops.route import apply_permute, build_permute_plan

    rng = np.random.default_rng(0)
    sigma = rng.permutation(m0)
    t0 = time.perf_counter()
    plan = build_permute_plan(sigma)
    build_s = time.perf_counter() - t0

    x = jnp.asarray(rng.standard_normal(plan.m).astype(np.float32))
    # plan must be a jit ARGUMENT: closing over it bakes the bit planes
    # into the HLO as constants (at q2=1024 that is 3x64 MB, which the
    # axon remote-compile tunnel rejects with HTTP 413)
    apj = jax.jit(apply_permute)
    ap = lambda z: apj(plan, z)
    y = ap(x)                                    # compile
    ok = None
    if check:
        xn = np.asarray(x)
        want = xn[np.concatenate(
            [sigma, np.arange(m0, plan.m)])]
        ok = bool(np.array_equal(np.asarray(y), want))
    per_route = time_fn(ap, x, reps=20)

    # the sort it would replace: one stable sort_key_val at this size
    keys = jnp.asarray(rng.integers(0, 1 << 30, plan.m, dtype=np.int32))
    srt = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)[1])
    srt(keys, x)
    per_sort = time_fn(srt, keys, x, reps=10)

    return {"m0": m0, "m": plan.m, "q2": plan.q2,
            "build_s": round(build_s, 2), "exact": ok,
            "route_ms": round(per_route * 1e3, 3),
            "sort_ms": round(per_sort * 1e3, 3),
            "route_gbs": round(plan.m * 4 * 2 / per_route / 1e9, 1)}


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [1 << 21, 8387869]
    for m0 in sizes:
        print(json.dumps(probe(m0)), flush=True)
