"""Solver-mode compile-time-specialized WSELL-K SpMV probe.

SPMV_ANATOMY's measured bound says window operands delivered at
compile-time addresses reach ~571 GB/s (vs the production kernel's 234),
and labels that "infeasible (addresses are data)". In SOLVER MODE — the
regime the headline already assumes (one matrix, permutation hoisted,
thousands of matvecs) — the addresses are trace-time constants: one
kernel is compiled PER MATRIX, with every pack's window starts baked as
Python ints. This probe measures that kernel honestly on the headline
stencil: compile wall, correctness vs the production kernel, chained
GB/s. Three levers over the production kernel:

  * static `pl.ds(w0, 128)` slices (no SMEM scalar read per window);
  * slice+broadcast CSE: within a tile, packs share x-blocks heavily
    (RCM locality), so the dict-cached broadcast is built once per
    DISTINCT window, not once per (pack, window);
  * exact per-pack K (dead window slots cost nothing; the production
    kernel unrolls the tile-group max).

One pallas_call per tile (each tile's constants differ). Run on the
chip:  python benchmarks/static_spmv_probe.py [ppt]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl

from g4s_tpu.engine import build_graph
from g4s_tpu.obs.devtime import chain_time
from g4s_tpu.ops.pallas_spmv import _chain_pad, _segment_matrix, \
    spmv_wsell_chain
from g4s_tpu.sparse import CSR


def _static_kernel(pb, width, starts_np, kc_np):
    rpr = 128 // width

    def kernel(lanes_ref, vals_ref, x_ref, seg_ref, y_ref):
        lanes = lanes_ref[0].reshape(pb * 8, 128).astype(jnp.int32)
        vals = vals_ref[0].reshape(pb * 8, 128)
        hi = jax.lax.shift_right_logical(lanes, jnp.int32(7))
        lo = jnp.bitwise_and(lanes, jnp.int32(127))
        cache = {}
        rows = []
        for qq in range(pb):
            hi_q = hi[qq * 8:(qq + 1) * 8]
            lo_q = lo[qq * 8:(qq + 1) * 8]
            vq = vals[qq * 8:(qq + 1) * 8]
            xsel = None
            for k in range(int(kc_np[qq])):
                w0 = int(starts_np[qq, k]) * 128
                op = cache.get(w0)
                if op is None:
                    win = x_ref[0, pl.ds(w0, 128)]
                    op = jnp.broadcast_to(win[None, :], (8, 128))
                    cache[w0] = op
                g = jnp.take_along_axis(op, lo_q, axis=1)
                xsel = g if xsel is None else jnp.where(hi_q == k, g, xsel)
            rows.append(vq * xsel)
        prod = jnp.concatenate(rows, axis=0)
        y = jax.lax.dot_general(
            prod, seg_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=prod.dtype)
        y_ref[0] = y.reshape(pb, 8, rpr)

    return kernel


def build_static_chain(packed, starts_h, kc_h):
    """Per-matrix specialized chain: one pallas_call per tile, window
    starts baked as constants. Returns f(x_pad) -> y_pad."""
    pb = packed.ppt
    rpr = 128 // packed.width
    n_pad = _chain_pad(packed)
    n_tiles = packed.lanes.shape[0]
    seg_np = _segment_matrix(packed.width)

    def run(x_pad):
        seg = jnp.asarray(seg_np, x_pad.dtype)
        pieces = []
        for t in range(n_tiles):
            spec = [
                pl.BlockSpec((1, pb, 8, 128),
                             lambda i, t=t: (t, 0, 0, 0)),
                pl.BlockSpec((1, pb, 8, 128),
                             lambda i, t=t: (t, 0, 0, 0)),
                pl.BlockSpec((1, n_pad), lambda i: (0, 0)),
                pl.BlockSpec((128, rpr), lambda i: (0, 0)),
            ]
            pieces.append(pl.pallas_call(
                _static_kernel(pb, packed.width,
                               starts_h[t * pb:(t + 1) * pb],
                               kc_h[t * pb:(t + 1) * pb]),
                grid=(1,),
                in_specs=spec,
                out_specs=pl.BlockSpec((1, pb, 8, rpr),
                                       lambda i: (0, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, pb, 8, rpr),
                                               x_pad.dtype),
            )(packed.lanes, packed.vals, x_pad[None, :], seg)
                .reshape(-1))
        y = jnp.concatenate(pieces)
        if n_pad > packed.rows_padded:
            y = jnp.concatenate(
                [y, jnp.zeros((n_pad - packed.rows_padded,), y.dtype)])
        return y

    return run


def main():
    rng = np.random.default_rng(0)
    nx = 101
    n3 = nx ** 3
    t_ = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (nx, nx))
    e_ = sp.eye(nx)
    g3m = (sp.kron(sp.kron(e_, e_), t_) + sp.kron(sp.kron(e_, t_), e_)
           + sp.kron(t_, sp.kron(e_, e_))).tocsr().astype(np.float32)
    pp = rng.permutation(n3)
    g3m = g3m[pp][:, pp].tocsr()
    print("building graph...", flush=True)
    g3 = build_graph(CSR.from_scipy(g3m))
    assert g3.variant == "wsell", g3.variant
    packed = g3.wsell
    n_packs = packed.lanes.shape[0] * packed.ppt
    K = packed.k
    starts_h = np.asarray(packed.starts).reshape(n_packs, K)
    # live slots: starts are sorted-distinct, pads repeat the first
    kc_h = 1 + (np.diff(starts_h, axis=1) > 0).sum(axis=1)
    print(f"packs={n_packs} K={K} kc mean {kc_h.mean():.2f} "
          f"tiles={packed.lanes.shape[0]} ppt={packed.ppt}", flush=True)

    xp = jnp.zeros((_chain_pad(packed),), jnp.float32).at[:n3].set(1.0)
    y_ref = spmv_wsell_chain(packed, xp)
    jax.block_until_ready(y_ref)

    run = build_static_chain(packed, starts_h, kc_h)
    t0 = time.perf_counter()
    fast = jax.jit(run)
    y_st = fast(xp)
    jax.block_until_ready(y_st)
    compile_s = time.perf_counter() - t0
    err = float(jnp.max(jnp.abs(y_st - y_ref)))
    ok = err < 1e-5 * float(jnp.max(jnp.abs(y_ref)) + 1)
    print(f"compile+first {compile_s:.1f}s  maxerr {err:.2e} ok={ok}",
          flush=True)

    stencil_bytes = g3m.nnz * 6 + n3 * 8
    per_ref = chain_time(lambda u: spmv_wsell_chain(packed, u * 0.999),
                         xp, lens=(2, 100))
    per_st = chain_time(lambda u: fast(u * 0.999), xp, lens=(2, 100))
    print(f"production: {per_ref*1e6:.0f} us = "
          f"{stencil_bytes/per_ref/1e9:.0f} GB/s", flush=True)
    print(f"static:     {per_st*1e6:.0f} us = "
          f"{stencil_bytes/per_st/1e9:.0f} GB/s  "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
