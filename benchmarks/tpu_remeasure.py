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
    return {"what": "esc_spgemm", "n": n, "flops": plan.flops,
            "plan_s": round(plan_s, 2), "numeric_ms": round(per * 1e3, 2),
            "gflops": round(2 * plan.flops / per / 1e9, 2),
            "stages_ms": stages}


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


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("spgemm", "all"):
        print(json.dumps(spgemm_probe()), flush=True)
    if what in ("df64", "all"):
        print(json.dumps(df64_probe()), flush=True)
