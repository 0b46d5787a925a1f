"""Dense matrix-vector benchmark driver (the reference's mv/ suite).

Protocol of mv/mv.c:29-97: read a Matrix-Market file to fix the problem
dimension, fill a dense dim x dim matrix with uniform random values
(mv.c:59-63 uses rand()), then time symv / trmv / packed-symmetric spmv /
gemv — here each is one MXU matmul variant (g4s_tpu.ops.blas2).

Usage: python -m g4s_tpu.drivers.mv_bench <matrix.mtx | dim> [reps]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from g4s_tpu.utils.platform import honor_env_platforms

from g4s_tpu.ops.blas2 import gemv, pack_symmetric, spmv_packed, symv, trmv
from g4s_tpu.sparse import read_mtx


def run(dim_or_path, reps: int = 10, dtype=jnp.float32, verbose=True):
    honor_env_platforms()
    try:
        dim = int(dim_or_path)
    except (TypeError, ValueError):
        dim = read_mtx(dim_or_path).shape[0]
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((dim, dim)), dtype)
    x = jnp.asarray(rng.random(dim), dtype)
    sym = np.triu(np.asarray(a)) + np.triu(np.asarray(a), 1).T
    ap = jnp.asarray(pack_symmetric(sym), dtype)

    # two-point chained fori_loop timing with value-forcing sync
    # (obs/devtime): block_until_ready is not honored by the axon tunnel,
    # so per-call time is the slope between two chain lengths, with
    # completion forced by a host fetch of a result-dependent scalar.
    from g4s_tpu.obs.devtime import chain_time

    results = {}
    for name, kernel, mat in [
        ("dsymv", symv, a),
        ("dtrmv", trmv, a),
        ("dspmv", spmv_packed, ap),
        ("dgemv", gemv, a),
    ]:
        def body(v, _k=kernel, _m=mat):
            return _k(_m, v) * (1.0 / jnp.maximum(1e-30,
                                                  jnp.max(jnp.abs(v))))
        ms = chain_time(body, x, lens=(2, 2 + reps)) * 1e3
        results[name] = ms
        if verbose:
            print(f"{name}: dim={dim} {ms:.4f} ms "
                  f"({2 * dim * dim / ms / 1e6:.1f} GFLOP/s)")
    return results


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "1024"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    run(arg, reps)


if __name__ == "__main__":
    main()
