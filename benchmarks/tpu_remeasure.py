#!/usr/bin/env python
"""Round-3 TPU re-measurement: ESC SpGEMM stages + df64-IR Cookbook2.

Run on the real chip (default platform) after changes to the SpGEMM
engine or the df64 tier; prints one JSON block per section. bench.py
remains the canonical recorder — this script is the fast, targeted
probe used while iterating (its numbers should agree with bench.py's).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def spgemm_probe(n=1 << 15, avg_deg=16, reps=10):
    import numpy as np
    import scipy.sparse as sp
    from g4s_tpu.ops.spgemm_esc import (esc_numeric, esc_numeric_staged,
                                        esc_plan)
    from g4s_tpu.sparse.containers import CSR

    rng = np.random.RandomState(42)
    A_s = sp.random(n, n, density=avg_deg / n, random_state=rng,
                    format="csr", dtype=np.float32)
    A = CSR.from_scipy(A_s)
    t0 = time.perf_counter()
    plan = esc_plan(A, A)
    plan_s = time.perf_counter() - t0
    import jax.numpy as jnp
    from g4s_tpu.obs.devtime import time_fn
    dplan = plan.to_device()
    a_d = jnp.asarray(np.asarray(A.data))   # device-resident
    per = time_fn(esc_numeric, a_d, a_d, dplan, reps=reps)
    _, stages = esc_numeric_staged(a_d, a_d, dplan)
    out = {"what": "esc_spgemm", "n": n, "flops": plan.flops,
           "plan_s": round(plan_s, 2), "numeric_ms": round(per * 1e3, 2),
           "gflops": round(2 * plan.flops / per / 1e9, 2),
           "stages_ms": stages}
    from g4s_tpu.ops.spgemm_esc import esc_numeric_routed, esc_route_plan
    t0 = time.perf_counter()
    rp = esc_route_plan(A, A, plan=plan)
    out["route_build_s"] = round(time.perf_counter() - t0, 1)
    per_r = time_fn(esc_numeric_routed, a_d, a_d, rp, reps=reps)
    out["routed_ms"] = round(per_r * 1e3, 2)
    out["routed_gflops"] = round(2 * plan.flops / per_r / 1e9, 2)
    return out


def df64_probe(steps=3):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from g4s_tpu.models.citcoms import (CitcomModel, config_from_table,
                                        parse_flat_config)
    from g4s_tpu.models.citcoms.df64_step import DF64Model

    with open("/root/reference/citcoms/examples/Cookbook2/cookbook2") as f:
        cfg = config_from_table(parse_flat_config(f.read()))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = CitcomModel(cfg, dtype=jnp.float64)
        s = model.init_state()
    out = {}
    for mode in ("mg", "ir", "df"):
        dfm = DF64Model(model, inner=mode)
        si, _ = dfm.initial_solve(s)
        si, d = dfm.step(si)                    # compile
        t0 = time.time()
        inner = 0
        for _ in range(steps):
            si, d = dfm.step(si)
            inner += d["inner"]
        out[mode] = {"per_step_s": round((time.time() - t0) / steps, 3),
                     "inner_per_step": inner // steps}
    return {"what": "df64_cookbook2", **out}


def wsell_ab_probe():
    """Time the WSELL kernel on the shuffled 3D stencil (the spmv
    headline case) and the hub-split stream on RMAT. (A 'wide'
    single-gather kernel variant was tried and removed: Mosaic's gather
    lowering only accepts same-shape 128-lane crossbars, see the note
    in _wsell_kernel.)"""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from g4s_tpu.ops import pallas_spmv as ps
    from g4s_tpu.sparse.containers import CSR
    from bench import _rmat_matrix

    nx = 101                                   # bench's headline matrix
    t_ = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (nx, nx))
    e_ = sp.eye(nx)
    a = (sp.kron(sp.kron(e_, e_), t_) + sp.kron(sp.kron(e_, t_), e_)
         + sp.kron(t_, sp.kron(e_, e_))).tocsr().astype(np.float32)
    rng = np.random.default_rng(0)
    perm = rng.permutation(a.shape[0])
    shuf = a[perm][:, perm].tocsr()
    from g4s_tpu.engine.dispatch import build_graph
    g = build_graph(CSR.from_scipy(shuf))          # RCM + WSELL pack
    out = {"what": "wsell_ab"}
    from g4s_tpu.obs.devtime import chain_time
    if g.wsell is not None:
        x = jnp.ones((g.wsell.n_cols,), jnp.float32)
        nbytes = shuf.nnz * 8 + shuf.shape[0] * 8
        per = chain_time(lambda v: ps.spmv_wsell(g.wsell, v * 0.999), x,
                         lens=(2, 100))
        out["select"] = {"ms": round(per * 1e3, 3),
                         "gbs": round(nbytes / per / 1e9, 1)}
    else:
        out["note"] = f"dispatcher chose {g.variant}, not wsell"
    # hub-split stream on RMAT
    rmat = _rmat_matrix(17, 16, np.random.default_rng(7))
    t0 = time.time()
    g5 = build_graph(CSR.from_scipy(rmat), reorder=False)
    build_s = time.time() - t0
    if g5.variant == "stream":
        from g4s_tpu.ops.stream_spmv import spmv_stream
        x = jnp.ones((rmat.shape[1],), jnp.float32)
        per = chain_time(lambda v: spmv_stream(g5.stream, v * 0.999), x,
                         lens=(2, 30))
        # same byte accounting as bench.measure()'s stream branch so the
        # probe's gbs agrees with RESULTS.json
        nbytes = rmat.nnz * 12 + rmat.shape[0] * 8
        sp_ = g5.stream
        out["rmat_stream"] = {
            "ms": round(per * 1e3, 2),
            "gbs": round(nbytes / per / 1e9, 1),
            "plan_build_s": round(build_s, 1),
            "hub_cols": 0 if sp_.hub_cols is None else
            int(sp_.hub_cols.shape[0]),
            "hub_rows": 0 if sp_.hub_rows is None else
            int(sp_.hub_rows.shape[0]),
            "stream_m": sp_.m}
    return out


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("spgemm", "all"):
        print(json.dumps(spgemm_probe()), flush=True)
    if what in ("wsell", "all"):
        # before df64: df64_probe enables x64 process-globally, which
        # would poison the f32 Pallas kernels traced here
        print(json.dumps(wsell_ab_probe()), flush=True)
    if what in ("df64", "all"):
        print(json.dumps(df64_probe()), flush=True)
