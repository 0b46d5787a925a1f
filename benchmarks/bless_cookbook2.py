#!/usr/bin/env python
"""Produce the blessed Cookbook2 trajectory artifact.

Runs the reference configuration (citcoms/examples/Cookbook2/cookbook2,
read verbatim) for its full 10 steps in f64 and records the per-step
diagnostics the reference prints to its log (vrms, surface/bottom Nusselt
via surface_heat_flux, incompressibility, dt). The resulting JSON is the
cross-round regression anchor: future rounds diff their trajectories
against this file at the 1e-10 (f64) tier.

Usage: JAX_PLATFORMS=cpu python benchmarks/bless_cookbook2.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from g4s_tpu.utils.platform import honor_env_platforms


def main():
    honor_env_platforms()
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from g4s_tpu.models.citcoms import (CitcomModel, config_from_table,
                                        parse_flat_config)
    from g4s_tpu.models.citcoms.observables import (rms_velocity,
                                                    surface_heat_flux)

    with open("/root/reference/citcoms/examples/Cookbook2/cookbook2") as f:
        cfg = config_from_table(parse_flat_config(f.read()))
    model = CitcomModel(cfg, dtype=jnp.float64)
    s = model.init_state()
    s, _ = model.initial_solve(s)
    traj = {"step": [], "dt": [], "vrms": [], "nu_top": [], "nu_bot": [],
            "incompressibility": [], "T_mean": []}
    for k in range(cfg.maxstep):
        s, d = model.step(s)
        traj["step"].append(k + 1)
        traj["dt"].append(float(d.dt))
        traj["vrms"].append(float(rms_velocity(model, s.V)))
        traj["nu_top"].append(float(
            surface_heat_flux(model, s.T, top=True)[1]))
        traj["nu_bot"].append(float(
            surface_heat_flux(model, s.T, top=False)[1]))
        traj["incompressibility"].append(float(d.incompressibility))
        traj["T_mean"].append(float(jnp.mean(s.T)))
        print(f"step {k+1}: dt={traj['dt'][-1]:.6e} "
              f"vrms={traj['vrms'][-1]:.8f} nu_top={traj['nu_top'][-1]:.8f}")
    out = {
        "config": "/root/reference/citcoms/examples/Cookbook2/cookbook2",
        "dtype": "f64",
        "platform": "cpu",
        "trajectory": traj,
    }
    path = os.path.join(os.path.dirname(__file__),
                        "cookbook2_blessed_f64.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# blessed trajectory -> {path}")


if __name__ == "__main__":
    main()
