#!/usr/bin/env python
"""Headline benchmark: CitcomS Cookbook2 seconds per timestep on TPU.

Runs the reference's north-star benchmark config (33x33x9 regional thermal
convection with a 100-unit top-velocity BC, Ra=1e5 — exactly
citcoms/examples/Cookbook2/cookbook2) through the full per-step pipeline
(SUPG energy advection + Uzawa/CG Stokes with element-by-element engine
matvecs) and reports wall seconds per timestep.

vs_baseline: the reference prints wall time per step when run as
`CitcomSRegional cookbook2` on one MPI rank (citcoms/bin/Citcom.c:276).
That binary cannot be built in this image (no MPI toolchain), so the
baseline is an estimate: the per-step work is dominated by
(uzawa ~10 outer) x (~300 inner CG) element matvecs of 8192 x 24x24 blocks
plus assembly ~= 30 GFLOP/step; at the ~3 GFLOP/s an optimized single
CPU core sustains on this access pattern that is ~10 s/step; a 16-core MPI
run ~1 s/step. We use REF_SECONDS = 1.0 (the parallel-CPU reference).
vs_baseline = REF_SECONDS / measured  (>1 means faster than reference).

Usage: python bench.py [--steps N] [--dtype f32|f64] [--what cookbook2|spmv]
"""

import argparse
import json
import sys
import time

REF_SECONDS = 1.0  # estimated reference MPI-CPU wall per Cookbook2 step


def bench_cookbook2(steps: int, dtype_str: str):
    import jax
    import jax.numpy as jnp

    if dtype_str == "f64":
        jax.config.update("jax_enable_x64", True)
    from g4s_tpu.models.citcoms import CitcomModel, config_from_table, \
        parse_flat_config

    cfg_text = """
    maxstep=10 rayleigh=100000
    nodex=33 nodey=33 nodez=9
    theta_max=1.5708 theta_min=0.7854 fi_max=0.7854 fi_min=0.0
    radius_inner=0.55 radius_outer=1.0
    topvbc=1 topvbxval=100 topvbyval=0
    num_perturbations=1 perturbl=1 perturblayer=5 perturbm=1 perturbmag=0.0
    num_mat=4
    """
    cfg = config_from_table(parse_flat_config(cfg_text))
    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32
    model = CitcomModel(cfg, dtype=dtype)
    s = model.init_state()
    s, _ = model.initial_solve(s)
    # warmup/compile
    s, d = model.step(s)
    jax.block_until_ready(s.T)
    t0 = time.time()
    for _ in range(steps):
        s, d = model.step(s)
    jax.block_until_ready(s.T)
    per_step = (time.time() - t0) / steps
    return per_step


def bench_spmv(dtype_str: str):
    """SpMV effective bandwidth: Pallas BWELL kernel on a banded matrix.

    Timing protocol for the tunneled TPU: per-call dispatch costs ~28 ms
    and repeated identical calls can be served from a relay cache, so the
    measurement chains nrep dependent SpMVs inside ONE jit with UNIQUE
    inputs per timed call and differences two chain lengths to cancel the
    fixed overhead.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    from g4s_tpu.engine import build_graph, mxv
    from g4s_tpu.sparse import CSR

    n, diags = 1 << 20, 16
    offs = np.r_[0, np.arange(1, diags // 2), -np.arange(1, diags // 2 + 1)]
    m = sp.diags([np.ones(n)] * len(offs), offs, shape=(n, n),
                 format="csr").astype(np.float32)
    g = build_graph(CSR.from_scipy(m))   # dispatcher picks DIA (banded)
    assert g.variant == "dia", g.variant

    def chain(nrep):
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, nrep, lambda i, u: mxv(g, u * 0.999), x))

    times = {}
    for nrep in (2, 100):
        h = chain(nrep)
        h(jnp.ones((n,), jnp.float32)).block_until_ready()
        ts = []
        for k in range(3):
            x = jnp.full((n,), 1.0 + 0.001 * k + 0.01 * nrep, jnp.float32)
            t0 = time.time()
            h(x).block_until_ready()
            ts.append(time.time() - t0)
        times[nrep] = min(ts)
    per = (times[100] - times[2]) / 98
    bytes_moved = g.dia.vals.size * 4 + n * 8
    return bytes_moved / per / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dtype", default="f32", choices=["f32", "f64"])
    ap.add_argument("--what", default="cookbook2",
                    choices=["cookbook2", "spmv"])
    args = ap.parse_args()

    if args.what == "spmv":
        gbs = bench_spmv(args.dtype)
        roofline_target = 0.7 * 819.0  # 70% of v5e HBM roofline
        print(json.dumps({"metric": "spmv_bandwidth", "value": round(gbs, 2),
                          "unit": "GB/s",
                          "vs_baseline": round(gbs / roofline_target, 3)}))
        return
    per_step = bench_cookbook2(args.steps, args.dtype)
    print(json.dumps({
        "metric": "citcoms_cookbook2_per_step",
        "value": round(per_step, 4),
        "unit": "s/step",
        "vs_baseline": round(REF_SECONDS / per_step, 3)}))


if __name__ == "__main__":
    main()
