"""Static-address WSELL-K, take 2: ONE kernel, manual DMA pipeline.

Probe 1 (static_spmv_probe.py) measured the per-tile-call formulation at
163 GB/s vs the production kernel's 201: with one pallas_call per tile,
each call re-fetches the 4 MB x operand into VMEM (63 x 4 MB ~ 260 MB of
extra traffic) and pays 63 launches — the specialization win drowns.

This version compiles the WHOLE matrix into ONE kernel: x enters VMEM
once, the 63 tiles' lanes/vals stay in HBM (memory_space=ANY) and are
double-buffered into VMEM scratch by explicit `make_async_copy` DMAs,
while every window start in all ~48k unrolled pack-window steps is a
trace-time constant (dict-CSE'd per tile). This is the real test of the
anatomy's 571 GB/s static-address bound in solver mode; if Mosaic
chokes on the program size, that result closes the table instead.

Run: python benchmarks/static_spmv_probe2.py [n_tiles_cap]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os

import jax
import jax.numpy as jnp
import numpy as np

CSE_CACHE = os.environ.get("PROBE_NO_CSE", "") == ""
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from g4s_tpu.engine import build_graph
from g4s_tpu.obs.devtime import chain_time
from g4s_tpu.ops.pallas_spmv import _chain_pad, _segment_matrix, \
    spmv_wsell_chain
from g4s_tpu.sparse import CSR


def build_static_one_kernel(packed, starts_h, kc_h, n_tiles):
    pb = packed.ppt
    width = packed.width
    rpr = 128 // width
    n_pad = _chain_pad(packed)
    seg_np = _segment_matrix(width)

    def kernel(lanes_hbm, vals_hbm, x_ref, seg_ref, y_ref,
               lanes_sc, vals_sc, sem):
        def issue(t, buf):
            pltpu.make_async_copy(lanes_hbm.at[t], lanes_sc.at[buf],
                                  sem.at[buf, 0]).start()
            pltpu.make_async_copy(vals_hbm.at[t], vals_sc.at[buf],
                                  sem.at[buf, 1]).start()

        def wait(t, buf):
            pltpu.make_async_copy(lanes_hbm.at[t], lanes_sc.at[buf],
                                  sem.at[buf, 0]).wait()
            pltpu.make_async_copy(vals_hbm.at[t], vals_sc.at[buf],
                                  sem.at[buf, 1]).wait()

        issue(0, 0)
        for t in range(n_tiles):
            buf = t % 2
            wait(t, buf)
            if t + 1 < n_tiles:
                issue(t + 1, (t + 1) % 2)
            lanes = lanes_sc[buf].reshape(pb * 8, 128).astype(jnp.int32)
            vals = vals_sc[buf].reshape(pb * 8, 128)
            hi = jax.lax.shift_right_logical(lanes, jnp.int32(7))
            lo = jnp.bitwise_and(lanes, jnp.int32(127))
            cache = {}
            rows = []
            for qq in range(pb):
                hi_q = hi[qq * 8:(qq + 1) * 8]
                lo_q = lo[qq * 8:(qq + 1) * 8]
                vq = vals[qq * 8:(qq + 1) * 8]
                p = t * pb + qq
                xsel = None
                for k in range(int(kc_h[p])):
                    w0 = int(starts_h[p, k]) * 128
                    op = cache.get(w0) if CSE_CACHE else None
                    if op is None:
                        win = x_ref[0, pl.ds(w0, 128)]
                        op = jnp.broadcast_to(win[None, :], (8, 128))
                        if CSE_CACHE:
                            cache[w0] = op
                    g = jnp.take_along_axis(op, lo_q, axis=1)
                    xsel = g if xsel is None else \
                        jnp.where(hi_q == k, g, xsel)
                rows.append(vq * xsel)
            prod = jnp.concatenate(rows, axis=0)
            y = jax.lax.dot_general(
                prod, seg_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=prod.dtype)
            y_ref[t] = y.reshape(pb, 8, rpr)

    def run(x_pad):
        seg = jnp.asarray(seg_np, x_pad.dtype)
        y = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, n_pad), lambda: (0, 0)),
                pl.BlockSpec((128, rpr), lambda: (0, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, pb, 8, rpr),
                                           x_pad.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, pb, 8, 128), jnp.int16),
                pltpu.VMEM((2, pb, 8, 128), x_pad.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )(packed.lanes[:n_tiles], packed.vals[:n_tiles],
          x_pad[None, :], seg)
        return y.reshape(-1)

    return run


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else None
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
    packed = g3.wsell
    n_tiles = packed.lanes.shape[0] if cap is None \
        else min(cap, packed.lanes.shape[0])
    n_packs = packed.lanes.shape[0] * packed.ppt
    starts_h = np.asarray(packed.starts).reshape(n_packs, packed.k)
    kc_h = 1 + (np.diff(starts_h, axis=1) > 0).sum(axis=1)
    print(f"tiles={n_tiles}/{packed.lanes.shape[0]} ppt={packed.ppt} "
          f"kc mean {kc_h.mean():.2f}", flush=True)

    xp = jnp.zeros((_chain_pad(packed),), jnp.float32).at[:n3].set(1.0)
    y_ref = spmv_wsell_chain(packed, xp)
    jax.block_until_ready(y_ref)

    run = build_static_one_kernel(packed, starts_h, kc_h, n_tiles)
    t0 = time.perf_counter()
    fast = jax.jit(run)
    y_st = fast(xp)
    jax.block_until_ready(y_st)
    compile_s = time.perf_counter() - t0
    nr = n_tiles * packed.ppt * packed.rows_per_pack
    err = float(jnp.max(jnp.abs(y_st[:nr] - y_ref[:nr])))
    print(f"compile+first {compile_s:.1f}s  maxerr {err:.2e}", flush=True)

    frac = n_tiles / packed.lanes.shape[0]
    stencil_bytes = (g3m.nnz * 6 + n3 * 8) * frac
    if frac < 1.0:
        # capped run cannot chain (y shorter than x): dispatch-loop timing
        for _ in range(3):
            jax.block_until_ready(fast(xp))
        t0 = time.perf_counter()
        for _ in range(50):
            y = fast(xp)
        jax.block_until_ready(y)
        per_st = (time.perf_counter() - t0) / 50
    else:
        def chained(u):
            y = fast(u * 0.999)
            return y if y.shape == u.shape else jnp.concatenate(
                [y, jnp.zeros((u.shape[0] - y.shape[0],), y.dtype)])
        per_st = chain_time(chained, xp, lens=(2, 100))
    print(f"one-kernel static ({n_tiles} tiles): {per_st*1e6:.0f} us = "
          f"{stencil_bytes/per_st/1e9:.0f} GB/s (compile {compile_s:.0f}s)",
          flush=True)
    per_ref = chain_time(lambda u: spmv_wsell_chain(packed, u * 0.999),
                         xp, lens=(2, 100))
    print(f"production (all tiles): {per_ref*1e6:.0f} us = "
          f"{(g3m.nnz*6+n3*8)/per_ref/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
