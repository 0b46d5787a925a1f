#!/usr/bin/env python
"""The 1e-10-tier evidence artifact (VERDICT r3 weak #4 / next #4).

Puts the achievable f64-agreement floor of the TPU df64 tier ON RECORD,
instead of asserting it in prose:

  part A  path-faithful run: DF64Model(inner='df') follows the blessed
          f64 solver's iteration path at the reference tolerance
          (accuracy=1e-4, General_matrix_functions.c:307 role); per-step
          |delta|/|ref| vs benchmarks/cookbook2_blessed_f64.json isolates
          pure double-word-f32 vs f64 arithmetic differences.
  part B  tightened pair: the SAME comparison with the Uzawa stopping
          tolerance tightened to accuracy=1e-6 on BOTH sides (fresh CPU
          f64 reference trajectory computed here, not the blessed file),
          showing how the agreement moves as the tolerance leaves the
          1e-4 floor.
  part C  the conditioning argument: power-iteration estimates of
          lambda_max and lambda_min of the diagonally-preconditioned
          velocity stiffness operator, giving kappa and the attainable
          df64 forward-error scale kappa * 2^-49 to compare against the
          observed floors.

Writes benchmarks/DF64_TRAJ.json. Run on the TPU host:
  python benchmarks/df64_traj_artifact.py [--steps 10]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from g4s_tpu.utils.platform import honor_env_platforms

COOKBOOK2 = "/root/reference/citcoms/examples/Cookbook2/cookbook2"


def run_df64(model, steps, blessed):
    """DF64Model(inner='df') trajectory + per-step rel errs vs blessed."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from g4s_tpu.models.citcoms.df64_step import DF64Model
    from g4s_tpu.models.citcoms.observables import (rms_velocity,
                                                    surface_heat_flux)
    from g4s_tpu.ops import df64 as _df
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        s0 = model.init_state()
    dfm = DF64Model(model, inner="df")
    s, _ = dfm.initial_solve(s0)
    pairs = dfm.to_pairs(s)
    errs = {"vrms": [], "nu_top": [], "dt": []}
    traj = {"vrms": [], "nu_top": [], "dt": []}
    for k in range(steps):
        pairs, diag = dfm.step_pairs(pairs)
        dd = dfm.pairs_diag(diag)
        with jax.default_device(cpu):
            V64 = jnp.asarray(_df.to_f64(pairs[2]))
            T64 = jnp.asarray(_df.to_f64(pairs[0]))
            vr = float(rms_velocity(model, V64))
            nu = float(surface_heat_flux(model, T64, top=True)[1])
        traj["vrms"].append(vr)
        traj["nu_top"].append(nu)
        traj["dt"].append(float(dd["dt"]))
        if blessed is not None and k < len(blessed["vrms"]):
            errs["vrms"].append(abs(vr - blessed["vrms"][k])
                                / abs(blessed["vrms"][k]))
            errs["nu_top"].append(abs(nu - blessed["nu_top"][k])
                                  / abs(blessed["nu_top"][k]))
            errs["dt"].append(abs(float(dd["dt"]) - blessed["dt"][k])
                              / abs(blessed["dt"][k]))
    return traj, errs


def run_f64_cpu(cfg, steps):
    """Fresh CPU f64 reference trajectory at cfg's tolerances."""
    import jax
    import jax.numpy as jnp
    from g4s_tpu.models.citcoms import CitcomModel
    from g4s_tpu.models.citcoms.observables import (rms_velocity,
                                                    surface_heat_flux)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = CitcomModel(cfg, dtype=jnp.float64)
        s = model.init_state()
        s, _ = model.initial_solve(s)
        traj = {"vrms": [], "nu_top": [], "dt": []}
        for _ in range(steps):
            s, d = model.step(s)
            traj["vrms"].append(float(rms_velocity(model, s.V)))
            traj["nu_top"].append(float(
                surface_heat_flux(model, s.T, top=True)[1]))
            traj["dt"].append(float(d.dt))
        return model, traj


def estimate_kappa(model):
    """kappa(diag-preconditioned K) by power iteration on CPU f64.

    lambda_max: plain power iteration on B = D^-1/2 K D^-1/2.
    lambda_min: power iteration on (lambda_max I - B) — exact at the
    spectrum edges for symmetric B, no inner solves needed."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        s = model.init_state()
        ops = model._build_ops(s.T)
        from g4s_tpu.models.citcoms import assembly as asm
        mask = np.asarray(model.vbc_mask)
        free = ~mask.reshape(-1)
        d = np.asarray(ops.BI).reshape(-1)       # 1/diag(K)
        dsq = np.sqrt(np.where(free, d, 1.0))

        def B(v):
            u = jnp.asarray((v * dsq).reshape(-1, 3))
            Ku = np.asarray(asm.assemble_del2_u(ops, u, strip=True)) \
                .reshape(-1)
            return np.where(free, Ku * dsq, 0.0)

        rng = np.random.RandomState(0)
        v = rng.randn(free.size) * free
        lam_max = 0.0
        for _ in range(60):
            w = B(v)
            lam_max = float(np.vdot(v, w) / np.vdot(v, v))
            v = w / np.linalg.norm(w)
        u = rng.randn(free.size) * free
        lam_min = lam_max
        for _ in range(400):
            w = lam_max * u - B(u)
            mu = float(np.vdot(u, w) / np.vdot(u, u))
            u = w / np.linalg.norm(w)
        lam_min = lam_max - mu
        return lam_max, lam_min


def main():
    honor_env_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--parts", default="ABC",
                    help="subset of parts to run; others keep the "
                         "values already in DF64_TRAJ.json")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from g4s_tpu.models.citcoms import (CitcomModel, config_from_table,
                                        parse_flat_config)
    with open(COOKBOOK2) as f:
        cfg = config_from_table(parse_flat_config(f.read()))
    here = os.path.dirname(os.path.abspath(__file__))
    blessed = json.load(open(os.path.join(
        here, "cookbook2_blessed_f64.json")))["trajectory"]
    # blessed entry index k is the state after step k+1; this script's
    # run (initial_solve, then step loop) records the same alignment
    bl = {k: v for k, v in blessed.items() if k != "step"}

    here2 = os.path.join(here, "DF64_TRAJ.json")
    out = {"config": COOKBOOK2, "steps": args.steps}
    if os.path.exists(here2):
        out.update(json.load(open(here2)))
        out["steps"] = args.steps

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = CitcomModel(cfg, dtype=jnp.float64)

    if "A" in args.parts:
        t0 = time.time()
        traj_a, errs_a = run_df64(model, args.steps, bl)
        out["partA_path_faithful_default_tol"] = {
            "accuracy": cfg.accuracy,
            "per_step_rel_err": {k: [float(f"{x:.3e}") for x in v]
                                 for k, v in errs_a.items()},
            "max_rel_err": {k: float(np.max(v)) for k, v in errs_a.items()
                            if v},
            "wall_s": round(time.time() - t0, 1)}
        print("partA",
              out["partA_path_faithful_default_tol"]["max_rel_err"],
              flush=True)

    if "B" in args.parts:
        # tightened tolerance on BOTH sides
        cfg_t = dataclasses.replace(cfg, accuracy=1e-6)
        t0 = time.time()
        with jax.default_device(cpu):
            model_t, ref_t = run_f64_cpu(cfg_t, args.steps)
        traj_b, _ = run_df64(model_t, args.steps, None)
        errs_b = {k: [abs(a - b) / abs(b)
                      for a, b in zip(traj_b[k], ref_t[k])]
                  for k in ("vrms", "nu_top", "dt")}
        out["partB_tightened_1e-6_both_sides"] = {
            "accuracy": 1e-6,
            "per_step_rel_err": {k: [float(f"{x:.3e}") for x in v]
                                 for k, v in errs_b.items()},
            "max_rel_err": {k: float(np.max(v))
                            for k, v in errs_b.items()},
            "wall_s": round(time.time() - t0, 1)}
        print("partB",
              out["partB_tightened_1e-6_both_sides"]["max_rel_err"],
              flush=True)

    if "C" in args.parts:
        lam_max, lam_min = estimate_kappa(model)
        kappa = lam_max / max(lam_min, 1e-300)
        out["partC_conditioning"] = {
            "lambda_max": lam_max, "lambda_min": lam_min,
            "kappa_diag_precond": kappa,
            "df64_floor_kappa_2pow-49": kappa * 2.0 ** -49,
            "note": "attainable relative forward error of an iterative "
                    "solve in double-word f32 scales as kappa * u_dw "
                    "with u_dw ~ 2^-49; compare against the measured "
                    "floors above"}
        print("partC kappa", f"{kappa:.3e}",
              "floor", f"{kappa * 2.0 ** -49:.3e}", flush=True)

    with open(os.path.join(here, "DF64_TRAJ.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote DF64_TRAJ.json")


if __name__ == "__main__":
    main()
