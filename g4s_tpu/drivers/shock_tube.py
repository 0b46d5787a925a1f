"""NonIdealShockTube benchmark CLI.

The reference's benchmark step `python NonIdealShockTube.py`
(cantera/interfaces/cython/cantera/examples/reactors/NonIdealShockTube.py):
single 1000 K / 40 atm ignition for the Redlich-Kwong and ideal phases
with per-case wall time, then optionally the 22-temperature NTC sweep.

Usage: python -m g4s_tpu.drivers.shock_tube [--mech FILE] [--sweep]
           [--temps T1,T2,...] [--rtol R]
"""

from __future__ import annotations

import argparse
import time


def main():
    from g4s_tpu.utils.platform import honor_env_platforms
    honor_env_platforms()
    import jax
    jax.config.update("jax_enable_x64", True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--mech",
                    default="/root/reference/cantera/data/nDodecane_Reitz.yaml")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--temps", default=None,
                    help="comma-separated sweep temperatures")
    ap.add_argument("--rtol", type=float, default=1e-8)
    args = ap.parse_args()

    from g4s_tpu.models.cantera import ShockTubeBenchmark, NTC_TEMPERATURES

    t0 = time.time()
    bench = ShockTubeBenchmark(args.mech)
    print(f"# mechanism loaded ({time.time() - t0:.1f} s): "
          f"{bench.mech_rk.nspec} species, {bench.mech_rk.nrxn} reactions")

    out = bench.run_single(1000.0, rtol=args.rtol, atol=1e-14)
    print(f"Real-gas ignition delay:  {out['tau_RG']*1e6:9.1f} us "
          f"({out['wall_RG']:.1f} s wall)")
    print(f"Ideal-gas ignition delay: {out['tau_IG']*1e6:9.1f} us "
          f"({out['wall_IG']:.1f} s wall)")

    if args.sweep or args.temps:
        temps = ([float(t) for t in args.temps.split(",")] if args.temps
                 else list(NTC_TEMPERATURES))
        t0 = time.time()
        res = bench.run_ntc_sweep(temps, rtol=args.rtol, atol=1e-14)
        print("#   T[K]   tau_RG[us]   tau_IG[us]")
        for T, rg, ig in zip(res["T"], res["tau_RG"], res["tau_IG"]):
            print(f"  {T:7.1f} {rg*1e6:11.1f} {ig*1e6:11.1f}")
        print(f"# sweep total {time.time() - t0:.1f} s "
              f"({len(temps)} temperatures x 2 phases)")


if __name__ == "__main__":
    main()
