#!/usr/bin/env python
"""Execute the full DeePMD CLI chain on the reference water data and
record the artifact (VERDICT round-2 item #6b).

Chain = the reference's documented workflow
(deepmd/examples/water/se_e2_a/input.json + examples/water/lmp/in.lammps):

  dp train input.json --steps N     (lcurve.out, disp every 100)
  dp freeze  -> frozen_model.npz
  dp compress -> compressed_model.pkl
  compressed-vs-uncompressed e/f equivalence on real validation frames
  water MD (NVT, water.lmp) with temperature/step log

Everything goes through the REAL CLI (g4s_tpu.drivers.dp) via
subprocess, exactly as a user would run it; the recorded evidence is:
  - lcurve head/tail: rmse_f must clearly decrease on the real data
  - compress equivalence: max |dE|/atom and |dF| between frozen and
    tabulated models
  - MD: 330 K NVT stays bounded, wall/step recorded

Writes benchmarks/DP_CHAIN.json. Run: python benchmarks/dp_chain.py
[--steps 2000] [--md-steps 200]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATER = "/root/reference/deepmd/examples/water"


def run_cli(workdir, *args):
    cmd = [sys.executable, "-m", "g4s_tpu.drivers.dp", *args]
    env = dict(os.environ, PYTHONPATH=REPO + ":"
               + os.environ.get("PYTHONPATH", ""))
    t0 = time.time()
    r = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                       text=True, timeout=3600)
    wall = time.time() - t0
    if r.returncode != 0:
        raise RuntimeError(f"dp {' '.join(args)} failed:\n{r.stderr[-2000:]}")
    return r.stdout, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--md-steps", type=int, default=1000)
    ap.add_argument("--workdir", default="/tmp/g4s_dp_chain")
    ap.add_argument("--reuse", action="store_true",
                    help="skip train/freeze if the workdir already has them")
    args = ap.parse_args()
    wd = args.workdir
    os.makedirs(wd, exist_ok=True)

    # training input: the reference file with its data paths resolved
    with open(os.path.join(WATER, "se_e2_a", "input.json")) as f:
        jdata = json.load(f)
    jdata["training"]["training_data"]["systems"] = [
        os.path.join(WATER, "data", d) for d in ("data_0", "data_1",
                                                 "data_2")]
    jdata["training"]["numb_steps"] = args.steps
    inp = os.path.join(wd, "input.json")
    with open(inp, "w") as f:
        json.dump(jdata, f, indent=1)

    rec = {"steps": args.steps, "data": "reference water npy systems"}

    reuse = args.reuse and os.path.exists(os.path.join(wd, "frozen_model.npz"))
    if not reuse:
        out, wall = run_cli(wd, "train", inp, "--checkpoint",
                            "model.ckpt.npz")
        rec["train_wall_s"] = round(wall, 1)
    else:
        rec["train_wall_s"] = "reused"
    with open(os.path.join(wd, "lcurve.out")) as f:
        lines = [ln.split() for ln in f if not ln.startswith("#") and
                 ln.strip()]
    # columns: step rmse_val.. take (step, rmse_e, rmse_f, lr) per driver
    lcurve = [[float(x) for x in ln] for ln in lines]
    rec["lcurve_head"] = lcurve[:3]
    rec["lcurve_tail"] = lcurve[-3:]
    rmse_f_first = lcurve[0][2]
    rmse_f_last = lcurve[-1][2]
    rec["rmse_f_first"] = rmse_f_first
    rec["rmse_f_last"] = rmse_f_last
    rec["rmse_f_decreased"] = bool(rmse_f_last < 0.7 * rmse_f_first)

    if not reuse:
        out, wall = run_cli(wd, "freeze", "-c", "model.ckpt.npz",
                            "-o", "frozen_model.npz")
        rec["freeze_wall_s"] = round(wall, 1)
    out, wall = run_cli(wd, "compress", "-i", "frozen_model.npz",
                        "-o", "compressed_model.pkl",
                        "-s", os.path.join(WATER, "data", "data_0"))
    rec["compress_wall_s"] = round(wall, 1)

    # compressed-vs-uncompressed equivalence on real validation frames
    sys.path.insert(0, REPO)
    import numpy as np
    import jax.numpy as jnp
    from g4s_tpu.models.deepmd.freeze import load_frozen
    from g4s_tpu.models.deepmd.data import load_system
    from g4s_tpu.models.deepmd.model import energy_force_virial
    from g4s_tpu.models.deepmd.compress import (load_compressed,
                                                energy_force_compressed)
    params, spec = load_frozen(os.path.join(wd, "frozen_model.npz"))
    cm = load_compressed(os.path.join(wd, "compressed_model.pkl"))
    val = load_system(os.path.join(WATER, "data", "data_3"))
    des, dfs = [], []
    for i in range(3):
        c = jnp.asarray(val.coord[i])
        b = jnp.asarray(val.box[i])
        t = jnp.asarray(val.types)
        e0, f0, _ = energy_force_virial(params, spec, c, b, t)
        e1, f1 = energy_force_compressed(cm, c, b, t)
        des.append(abs(float(e0) - float(e1)) / val.natoms)
        dfs.append(float(np.abs(np.asarray(f0) - np.asarray(f1)).max()))
    rec["compress_dE_per_atom_max"] = max(des)
    rec["compress_dF_max"] = max(dfs)

    out, wall = run_cli(wd, "md", "-m", "frozen_model.npz",
                        "--steps", str(args.md_steps))
    rec["md_steps"] = args.md_steps
    rec["md_wall_s"] = round(wall, 1)
    rec["md_ms_per_step"] = round(wall / args.md_steps * 1e3, 1)
    rec["md_tail"] = out.strip().splitlines()[-2:]

    # energy-conservation validation (VERDICT r3 weak #8): a 1000-step
    # NVE run of the same system; E = pe + KE(T) must hold to MD
    # integrator accuracy. KB/ndof from the 192-atom water.lmp box.
    import time as _time
    from g4s_tpu.models.deepmd.md import KB_EV, water_md
    n_nve = min(args.md_steps, 1000)
    _, log_nve = water_md(params, spec, n_steps=n_nve, verbose=False,
                          ensemble="nve")
    natoms = 192
    es = [pe + 1.5 * natoms * KB_EV * T for (_s, T, pe) in log_nve]
    rec["nve_steps"] = n_nve
    rec["nve_drift_eV_per_atom"] = round(
        (max(es) - min(es)) / natoms, 8)
    # secular drift (linear fit slope) separated from bounded
    # fluctuation: symplectic Verlet has zero secular drift in exact
    # arithmetic, so the slope isolates the f32-force-rounding random
    # walk from the dt^2 fluctuation band
    steps_ax = np.arange(len(es), dtype=np.float64)
    slope = float(np.polyfit(steps_ax, np.asarray(es), 1)[0])
    rec["nve_secular_eV_per_atom_per_ps"] = round(
        slope / natoms / 5e-4, 8)           # dt = 0.5 fs
    # acceptance: well-trained f64 DeePMD water commonly sustains
    # <1e-3 eV/atom/ps; this artifact runs f32 forces on a
    # 2000-step-trained model, so the bound is set at the f32 scale:
    # total range < 5e-2 eV/atom over the 0.5 ps run AND |secular| <
    # 10x the range/ps (no runaway). Violations fail the chain.
    rec["nve_criterion"] = ("range < 5e-2 eV/atom over 1000x0.5fs "
                            "(f32 forces; f64 literature bound is "
                            "~1e-3 eV/atom/ps)")
    assert rec["nve_drift_eV_per_atom"] < 5e-2, rec
    assert abs(rec["nve_secular_eV_per_atom_per_ps"]) < 0.5, rec

    # measured CPU baseline for the MD step (every other benchmark has
    # one; the reference's OptMatmul inference path is CPU-only).
    # Timed inline with an explicit warm step so the jit compile stays
    # out of the measurement (differencing two separate water_md calls
    # mis-measured: each call builds fresh closures and recompiles).
    import jax as _jax
    import jax.numpy as _jnp
    import numpy as _np
    from g4s_tpu.models.deepmd.md import (NVTIntegrator, init_velocities,
                                          read_lammps_data)
    from g4s_tpu.models.deepmd.model import energy_force_virial
    cpu = _jax.devices("cpu")[0]
    with _jax.default_device(cpu):
        coord, types_np, box_np = read_lammps_data(
            "/root/reference/deepmd/examples/water/lmp/water.lmp")
        types_c = _jnp.asarray(types_np)
        box_c = _jnp.asarray(box_np, _jnp.float64)
        masses = _np.where(types_np == 0, 16.0, 2.0)

        def force_fn(xx):
            _, ff, _ = energy_force_virial(params, spec, xx, box_c,
                                           types_c)
            return ff

        integ = NVTIntegrator(_jax.jit(force_fn), masses, box_np)
        rng = _np.random.default_rng(1)
        v0 = init_velocities(rng, masses, 330.0)
        st = _jnp.asarray(coord, _jnp.float64)
        state, _ = integ.run(st, _jnp.asarray(v0, _jnp.float64), 3,
                             verbose=False)           # compile + warm
        t0 = _time.time()
        state, _ = integ.run(state.x, state.v, 25, verbose=False)
        _jax.block_until_ready(state.x)
        cpu_ms = (_time.time() - t0) / 25 * 1e3
    rec["md_cpu_ms_per_step"] = round(cpu_ms, 1)
    # the TPU side: use the steady-state tail print (the CLI wall
    # includes process startup + compile)
    import re as _re
    tail_ms = None
    for ln in rec["md_tail"]:
        mm = _re.search(r"\(([\d.]+) ms/step\)", ln)
        if mm:
            tail_ms = float(mm.group(1))
    rec["md_tpu_ms_per_step_amortized"] = tail_ms
    rec["md_vs_cpu"] = round(cpu_ms / (tail_ms or rec["md_ms_per_step"]),
                             2)

    outp = os.path.join(REPO, "benchmarks", "DP_CHAIN.json")
    with open(outp, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "dp_chain", "rmse_f_first": rmse_f_first,
                      "rmse_f_last": rmse_f_last,
                      "compress_dF_max": rec["compress_dF_max"],
                      "md_ms_per_step": rec["md_ms_per_step"]}))


if __name__ == "__main__":
    main()
