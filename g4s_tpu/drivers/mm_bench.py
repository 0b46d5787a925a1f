"""SpGEMM benchmark driver (the reference's mm/ suite).

Protocol of mm/src/mkl_spgemm.cpp:5-86: load A (and B) from Matrix-Market,
crop on dimension mismatch (:47-57), count flops, run 1 warmup + N timed
iterations (:61-81) and print per-stage Timings + GFLOPS
(mm/src/Timings.cpp:33-64). Algorithms:

  plan    — two-phase host-symbolic / device-numeric (the hash-SpGEMM
            analog; symbolic amortizes across numeric reps)
  device  — expand/sort/merge fully on device (the outer-product analog)
  dense   — MXU dense matmul baseline (the MKL-comparator role)

Usage: python -m g4s_tpu.drivers.mm_bench A.mtx [B.mtx] [--reps N]
       python -m g4s_tpu.drivers.mm_bench --random N density [--reps N]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from g4s_tpu.obs.devtime import time_fn
from g4s_tpu.obs.timings import Timings
from g4s_tpu.ops.spgemm import (spgemm_device_merge, spgemm_flops,
                                spgemm_numeric, spgemm_plan)
from g4s_tpu.sparse import CSR, crop, csr_to_dense, read_mtx_csr


def load_pair(a_path, b_path=None):
    A = read_mtx_csr(a_path)
    B = read_mtx_csr(b_path) if b_path else A
    if A.shape[1] != B.shape[0]:   # crop like mkl_spgemm.cpp:47-57
        d = min(A.shape[1], B.shape[0])
        A = crop(A, A.shape[0], d)
        B = crop(B, d, B.shape[1])
    return A, B


def bench_pair(A: CSR, B: CSR, *, reps: int = 10, verbose=True):
    flops = spgemm_flops(A, B)
    out = {}

    # --- plan variant ---
    t = Timings("plan (two-phase)")
    with t.stage("symbolic"):
        plan = spgemm_plan(A, B)
    dplan = plan.to_device()
    a_d, b_d = jnp.asarray(A.data), jnp.asarray(B.data)
    num = jax.jit(spgemm_numeric)
    t.record("numeric", time_fn(num, a_d, b_d, dplan, reps=reps))
    out["plan"] = t.as_dict()
    out["plan"]["gflops_numeric"] = flops / t.stages["numeric"] / 1e9
    if verbose:
        print(t.report(flops=flops))
        print(f"  numeric-only GFLOPS {out['plan']['gflops_numeric']:.3f}")

    # --- device-merge variant ---
    t = Timings("device-merge (expand/sort/merge)")
    t.record("expand+merge",
             time_fn(lambda: spgemm_device_merge(A, B)[1], reps=reps))
    out["device"] = t.as_dict()
    if verbose:
        print(t.report(flops=flops))

    # --- dense baseline ---
    n_dense = max(A.shape[0], A.shape[1], B.shape[1])
    if n_dense <= 8192:
        Ad = jnp.asarray(csr_to_dense(A), jnp.float32)
        Bd = jnp.asarray(csr_to_dense(B), jnp.float32)
        mm = jax.jit(lambda x, y: x @ y)
        dt = time_fn(mm, Ad, Bd, reps=reps)
        out["dense"] = {"matmul": dt,
                        "gflops": 2 * Ad.shape[0] * Ad.shape[1] * Bd.shape[1] / dt / 1e9}
        if verbose:
            print(f"=== dense baseline === {dt*1e3:.3f} ms "
                  f"({out['dense']['gflops']:.1f} GFLOP/s f32)")
    out["flops"] = flops
    out["nnz_c"] = plan.nnz
    return out


def main():
    from g4s_tpu.utils.platform import honor_env_platforms
    honor_env_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("a", nargs="?")
    ap.add_argument("b", nargs="?")
    ap.add_argument("--random", nargs=2, type=float, metavar=("N", "DENSITY"))
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    if args.random:
        import scipy.sparse as sp
        n, dens = int(args.random[0]), args.random[1]
        A = CSR.from_scipy(sp.random(n, n, density=dens, random_state=0,
                                     format="csr"))
        B = A
    else:
        A, B = load_pair(args.a, args.b)
    print(f"A: {A.shape} nnz={A.nnz}; B: {B.shape} nnz={B.nnz}")
    bench_pair(A, B, reps=args.reps)


if __name__ == "__main__":
    main()
