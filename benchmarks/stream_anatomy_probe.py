"""Stream-SpMV (expand/route/reduce) measured anatomy — the RMAT case.

docs/SPMV_ANATOMY.md prices the WSELL kernel to its formulation ceiling
with measured ablations; this probe does the same for the streaming
variant (ops/stream_spmv.py), whose recorded 25-31 GB/s sits ~2.2x under
its own ~63 GB/s stage-count bound (819 GB/s / ~13 butterfly stages).
Stages timed separately on the scale-17 RMAT the bench runs
(VERDICT r4 weak #5):

    xperm    x -> class-compact order (small route, n-sized)
    expand   per-class broadcast-multiply into the padded stream
    route    the m-sized Clos/Benes permutation (the declared bound)
    reduce   per-slice (w, rows) column sums
    yperm    row un-sort (n-sized route) + hub dense matmuls

plus the two economics rows that price the residual: the ladder padding
ratio m/nnz (padding rides every stage) and the hub matmul cost.

Run on the chip: python benchmarks/stream_anatomy_probe.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.obs.devtime import fetch_sync
from g4s_tpu.ops.route import apply_permute
from g4s_tpu.ops.stream_spmv import _expand, build_stream_plan, \
    spmv_stream


def _rmat_matrix(scale, edge_factor, rng):
    import scipy.sparse as sp
    n = 1 << scale
    m = n * edge_factor
    rows = np.zeros(m, np.int64)
    cols = np.zeros(m, np.int64)
    a, b, c = 0.57, 0.19, 0.19
    for bit in range(scale):
        r = rng.random(m)
        right = (r > a + b) & (r <= a + b + c) | (r > a + b + c)
        down = (r > a) & (r <= a + b) | (r > a + b + c)
        rows |= right.astype(np.int64) << bit
        cols |= down.astype(np.int64) << bit
    mat = sp.coo_matrix((np.ones(m, np.float32), (rows, cols)),
                        shape=(n, n)).tocsr()
    mat.sum_duplicates()
    return mat


def timed(f, *args, reps=20):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    return o, (time.perf_counter() - t0) / reps


def dev_chain(f, x, n=100):
    """Per-call device time of y = f(x) with the ~1.2 ms tunnel
    dispatch amortized away: n data-dependent iterations inside ONE
    jitted fori_loop (the input is rescaled by a loop-carried scalar so
    XLA cannot hoist the body)."""
    @jax.jit
    def run(x):
        def body(_, t):
            y = f(x * (1.0 + t * 1e-38))
            return t + y.ravel()[0] * 1e-38
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jax.block_until_ready(run(x))           # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / n


def main():
    A = _rmat_matrix(17, 16, np.random.default_rng(7))
    n, nnz = A.shape[0], A.nnz
    print(f"rmat n={n} nnz={nnz}", flush=True)
    t0 = time.perf_counter()
    plan = build_stream_plan(A)
    print(f"plan build {time.perf_counter()-t0:.1f}s  "
          f"m={plan.m} pad_ratio={plan.m/max(nnz,1):.3f} "
          f"classes={len(plan.col_classes)} slices={len(plan.slices)}",
          flush=True)
    bytes_ref = nnz * 12 + n * 8

    x = jnp.ones((n,), jnp.float32)
    # dispatch overhead: the axon tunnel serializes execute RPCs at
    # ~1-1.3 ms/call; measure it with a null program and subtract
    _, per_null = timed(jax.jit(lambda u: u * 1.000001), x)
    print(f"null-dispatch overhead: {per_null*1e6:.0f} us/call",
          flush=True)
    y_full, per_full_raw = timed(jax.jit(
        lambda u: spmv_stream(plan, u)), x)
    per_full = max(per_full_raw - per_null, 1e-9)
    print(f"full spmv: {per_full*1e6:.0f} us = "
          f"{bytes_ref/per_full/1e9:.1f} GB/s "
          f"(raw {per_full_raw*1e6:.0f} us)", flush=True)

    # ---- staged (dispatch-corrected; inputs realistic) ----
    xpad = jnp.zeros((plan.nc_pad,), jnp.float32).at[:n].set(1.0)
    xc, per_xperm = timed(jax.jit(
        lambda u: apply_permute(plan.xplan, u)), xpad)
    prod, per_expand = timed(jax.jit(
        lambda u: _expand(plan, u, jnp)), xc)
    t, per_route = timed(jax.jit(
        lambda u: apply_permute(plan.route2, u)), prod)

    def reduce_(tt):
        parts = []
        for nr, w, o in plan.slices:
            parts.append(tt[o: o + nr * w].reshape(w, nr).sum(axis=0))
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    y_sorted, per_reduce = timed(jax.jit(reduce_), t)

    def tail(ys, u):
        ypad = jnp.zeros((plan.nr_pad,), ys.dtype).at[:n].set(ys[:n])
        y = apply_permute(plan.rowplan, ypad)[:n]
        if plan.hub_cols is not None:
            y = y + plan.hub_dense_c.astype(y.dtype) \
                @ jnp.take(u, plan.hub_cols, axis=0)
        if plan.hub_rows is not None:
            y = y.at[plan.hub_rows].add(
                plan.hub_dense_r.astype(y.dtype) @ u)
        return y
    _, per_tail = timed(jax.jit(tail), y_sorted, x)
    per_xperm = max(per_xperm - per_null, 1e-9)
    per_expand = max(per_expand - per_null, 1e-9)
    per_route = max(per_route - per_null, 1e-9)
    per_reduce = max(per_reduce - per_null, 1e-9)
    per_tail = max(per_tail - per_null, 1e-9)

    tot = per_xperm + per_expand + per_route + per_reduce + per_tail
    print(f"stage breakdown (sum {tot*1e6:.0f} us, fused "
          f"{per_full*1e6:.0f} us):", flush=True)
    for nm, p in [("xperm", per_xperm), ("expand", per_expand),
                  ("route", per_route), ("reduce", per_reduce),
                  ("tail(yperm+hubs)", per_tail)]:
        print(f"  {nm:18s} {p*1e6:7.0f} us  {100*p/tot:5.1f}%  "
              f"equiv {bytes_ref/p/1e9:6.1f} GB/s", flush=True)
    # stage-count bound context (~13 butterfly stages per the permute
    # design note in docs/SPMV_ANATOMY.md)
    mb = plan.m * 4 / 1e6
    eff = mb * 13 / 1e3 / per_route  # GB/s the route moves incl. stages
    print(f"route slot bytes m*4={mb:.1f} MB; at ~13 stages the route "
          f"sustains {eff:.0f} GB/s of raw stage traffic "
          f"(bound ~819/13 = 63 GB/s equiv)", flush=True)


if __name__ == "__main__":
    main()
