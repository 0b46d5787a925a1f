"""Regression driver for every SpGEMM execution strategy (reg_ binaries).

The reference's mm/README.md:10 describes `reg_`-prefixed regression
binaries per algorithm (hash/heap/outer/MKL) that never shipped; this
driver provides them for the rebuild: run all four strategy analogs on
the same inputs, verify each against an exact oracle, print PASS/FAIL
per strategy (tests/test1.sh's diff-based pass/fail protocol), and exit
nonzero on any mismatch.

  plan    — two-phase symbolic/numeric       (hash-SpGEMM analog)
  csc     — column-wise via transposes       (heap-SpGEMM analog)
  device  — on-device expand/sort/merge      (outer-SpGEMM analog)
  dense   — MXU dense matmul                 (MKL-comparator analog)

Usage: python -m g4s_tpu.drivers.reg_mm A.mtx [B.mtx]
       python -m g4s_tpu.drivers.reg_mm --random N DENSITY [--seed S]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from g4s_tpu.utils.platform import honor_env_platforms


def run(A, B, *, tol=1e-10, verbose=True) -> dict:
    import jax.numpy as jnp

    from g4s_tpu.ops.spgemm import (spgemm, spgemm_device_merge,
                                    spgemm_via_csc)
    from g4s_tpu.sparse import csr_to_dense
    from g4s_tpu.sparse.compare import csr_allclose

    oracle = np.asarray(csr_to_dense(A)) @ np.asarray(csr_to_dense(B))
    results = {}

    def check(name, c_csr=None, c_dense=None):
        if c_dense is None:
            c_dense = np.asarray(csr_to_dense(c_csr))
        err = np.abs(c_dense - oracle).max()
        scale = max(np.abs(oracle).max(), 1.0)
        ok = err <= tol * scale
        results[name] = (bool(ok), float(err))
        if verbose:
            print(f"  {name:8s} {'PASS' if ok else 'FAIL'}"
                  f"  max err {err:.3e}")
        return ok

    check("plan", spgemm(A, B))
    check("csc", spgemm_via_csc(A, B))
    # block tier joins the regression sweep whenever the inputs carry a
    # usable block cover (FE-matrix shape; ops/spgemm_block.py)
    from g4s_tpu.ops.spgemm_block import (block_c_to_scipy, block_cover,
                                          spgemm_block)
    for bs in (3, 2):
        if min(block_cover(A, bs), block_cover(B, bs)) >= 0.5:
            bp, cd = spgemm_block(A, B, bs)
            check(f"block{bs}", c_dense=block_c_to_scipy(bp, cd)
                  .toarray().astype(np.float64))
            break
    # device merge returns sorted (row*n+col) keys + merged values
    keys, vals, nnz = spgemm_device_merge(A, B)
    keys, vals = np.asarray(keys), np.asarray(vals)
    nnz = int(nnz)
    dm = np.zeros(A.shape[0] * B.shape[1])
    dm[keys[:nnz]] = vals[:nnz]
    check("device", c_dense=dm.reshape(A.shape[0], B.shape[1]))
    check("dense", c_dense=np.asarray(
        jnp.asarray(csr_to_dense(A)) @ jnp.asarray(csr_to_dense(B))))
    return results


def main(argv=None) -> int:
    honor_env_platforms()
    import jax
    jax.config.update("jax_enable_x64", True)   # f64 regression oracle
    ap = argparse.ArgumentParser()
    ap.add_argument("a", nargs="?")
    ap.add_argument("b", nargs="?")
    ap.add_argument("--random", nargs=2, type=float,
                    metavar=("N", "DENSITY"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tol", type=float, default=1e-10)
    args = ap.parse_args(argv)

    from g4s_tpu.drivers.mm_bench import load_pair
    if args.random:
        n, dens = int(args.random[0]), args.random[1]
        rng = np.random.default_rng(args.seed)
        from g4s_tpu.sparse import dense_to_csr
        M = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
        A = B = dense_to_csr(M)
    else:
        if not args.a:
            ap.error("need A.mtx or --random")
        A, B = load_pair(args.a, args.b)

    print(f"reg_mm: A {A.shape} nnz {len(np.asarray(A.data))}, "
          f"B {B.shape} nnz {len(np.asarray(B.data))}")
    results = run(A, B, tol=args.tol)
    ok = all(v[0] for v in results.values())
    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
