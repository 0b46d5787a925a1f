"""NonIdealShockTube benchmark driver.

Re-implements the reference benchmark script
(cantera/interfaces/cython/cantera/examples/reactors/NonIdealShockTube.py):
stoichiometric n-dodecane/air at 40 atm in a constant-UV reactor, ignition
delay = time of peak OH (the script uses peak OH mass fraction, :40-42 —
at constant volume that is the peak OH concentration), run once at 1000 K
for the Redlich-Kwong and ideal phases (:77-148) and swept over the NTC
temperature range (:198-266).
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.mech import Mechanism, load_mechanism
from g4s_tpu.models.cantera.reactor import IdealGasConstVolumeReactor

NTC_TEMPERATURES = np.array(
    [1250, 1225, 1200, 1150, 1100, 1075, 1050, 1025, 1012.5, 1000, 987.5,
     975, 962.5, 950, 937.5, 925, 912.5, 900, 875, 850, 825, 800])


def stoich_mixture(mech: Mechanism, fuel: str = "c12h26", phi: float = 1.0,
                   o2_name: str = "o2", n2_name: str = "n2",
                   n2_per_o2: float = 3.76) -> np.ndarray:
    """Mole fractions for phi-equivalence fuel/air
    (set_equivalence_ratio semantics)."""
    X = np.zeros(mech.nspec)
    i_f = mech.species_index(fuel)
    # O2 demand from composition: C -> CO2, H -> H2O/2... standard:
    # nO2 = nC + nH/4 - nO/2 per fuel molecule
    # recover composition from molecular formula via element weights is
    # lossy; parse name-free via thermo? Use stored composition instead:
    comp = mech.compositions[i_f]
    n_o2 = comp.get("C", 0.0) + comp.get("H", 0.0) / 4.0 - comp.get("O", 0.0) / 2.0
    X[i_f] = phi
    X[mech.species_index(o2_name)] = n_o2
    X[mech.species_index(n2_name)] = n_o2 * n2_per_o2
    return X / X.sum()


def ignition_delay(reactor: IdealGasConstVolumeReactor, T0: float, P0: float,
                   X0: np.ndarray, *, t_end: float = 0.005,
                   rtol=1e-9, atol=1e-15):
    """One ignition-delay case: integrate, return (tau, result)."""
    y0 = reactor.initial_state(T0, P0, X0)
    res = reactor.advance(y0, t_end, rtol=rtol, atol=atol,
                          record_species="oh")
    oh = res.record[:, 1]
    tau = res.record_t[jnp.argmax(oh)]
    return float(tau), res


class ShockTubeBenchmark:
    """The full NonIdealShockTube protocol over a mechanism file."""

    def __init__(self, mech_path, *, rk_phase: str = "nDodecane_RK",
                 ig_phase: str = "nDodecane_IG", fuel: str = "c12h26"):
        self.mech_rk = load_mechanism(mech_path, rk_phase)
        self.mech_ig = load_mechanism(mech_path, ig_phase)
        self.fuel = fuel
        self.r_rk = IdealGasConstVolumeReactor(self.mech_rk, real_gas=True)
        self.r_ig = IdealGasConstVolumeReactor(self.mech_ig, real_gas=False)

    def run_single(self, T0: float = 1000.0, P0: float = 40 * 101325.0,
                   **kw):
        X_rk = stoich_mixture(self.mech_rk, self.fuel)
        X_ig = stoich_mixture(self.mech_ig, self.fuel)
        t0 = time.time()
        tau_rg, _ = ignition_delay(self.r_rk, T0, P0, X_rk, **kw)
        t_rg = time.time() - t0
        t0 = time.time()
        tau_ig, _ = ignition_delay(self.r_ig, T0, P0, X_ig, **kw)
        t_ig = time.time() - t0
        return {"tau_RG": tau_rg, "tau_IG": tau_ig,
                "wall_RG": t_rg, "wall_IG": t_ig}

    def run_ntc_sweep(self, temperatures: Sequence[float] = NTC_TEMPERATURES,
                      P0: float = 40 * 101325.0, **kw):
        X_rk = stoich_mixture(self.mech_rk, self.fuel)
        X_ig = stoich_mixture(self.mech_ig, self.fuel)
        out = {"T": list(temperatures), "tau_RG": [], "tau_IG": []}
        for T0 in temperatures:
            out["tau_RG"].append(ignition_delay(self.r_rk, T0, P0, X_rk, **kw)[0])
            out["tau_IG"].append(ignition_delay(self.r_ig, T0, P0, X_ig, **kw)[0])
        return out

    def run_ntc_sweep_batched(self,
                              temperatures: Sequence[float] = NTC_TEMPERATURES,
                              P0: float = 40 * 101325.0, *,
                              t_end: float = 0.005,
                              rtol=1e-9, atol=1e-15):
        """All NTC cases of one phase integrated together with jax.vmap.

        The reference distributes the 22 temperature cases over MPI ranks
        (NonIdealShockTube.py:229-231 rank-gates `if counter % nprocs ==
        rank`); the TPU-native equivalent is batching the independent ODEs
        into one lockstep BDF integration — one compiled program, every
        case a batch lane.
        """
        out = {"T": [float(t) for t in temperatures]}
        for name, mech, reactor in (("RG", self.mech_rk, self.r_rk),
                                    ("IG", self.mech_ig, self.r_ig)):
            X = stoich_mixture(mech, self.fuel)
            k_oh = mech.species_index("oh")
            y0 = jnp.stack([reactor.initial_state(float(T0), P0, X)
                            for T0 in temperatures])
            from g4s_tpu.ops.odeint import bdf_solve
            solve = jax.jit(jax.vmap(lambda y: bdf_solve(
                reactor.rhs, y, 0.0, t_end, rtol=rtol, atol=atol,
                record_fn=lambda yy: jnp.stack([yy[0], yy[1 + k_oh]]),
                record_size=20000, max_steps=200000)))
            res = solve(y0)
            oh = np.asarray(res.record[:, :, 1])
            ts = np.asarray(res.record_t)
            out[f"tau_{name}"] = [float(ts[i, np.argmax(oh[i])])
                                  for i in range(len(temperatures))]
        return out

    def run_ntc_sweep_sharded(self, mesh,
                              temperatures: Sequence[float] = NTC_TEMPERATURES,
                              P0: float = 40 * 101325.0, *,
                              t_end: float = 0.005,
                              rtol=1e-9, atol=1e-15, record_size=20000):
        """The NTC sweep sharded over a device mesh — the TPU-native
        analog of the reference's mpi4py rank-striding of cases
        (NonIdealShockTube.py:229-231: `if counter % nprocs == rank`).

        `mesh` is a 1-axis jax.sharding.Mesh ("case"); the 22-case batch
        axis is padded to a multiple of the axis size and partitioned, so
        every device integrates its own case block in the same compiled
        lockstep BDF program. Results are identical to the single-device
        batched sweep (pure SPMD, no cross-case coupling).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from g4s_tpu.ops.odeint import bdf_solve
        n_dev = mesh.devices.size
        temps = [float(t) for t in temperatures]
        n_pad = (-len(temps)) % n_dev
        temps_pad = temps + [temps[-1]] * n_pad
        out = {"T": temps}
        for name, mech, reactor in (("RG", self.mech_rk, self.r_rk),
                                    ("IG", self.mech_ig, self.r_ig)):
            X = stoich_mixture(mech, self.fuel)
            k_oh = mech.species_index("oh")
            y0 = jnp.stack([reactor.initial_state(float(T0), P0, X)
                            for T0 in temps_pad])
            sh = NamedSharding(mesh, P("case"))
            y0 = jax.device_put(y0, sh)
            solve = jax.jit(jax.vmap(lambda y: bdf_solve(
                reactor.rhs, y, 0.0, t_end, rtol=rtol, atol=atol,
                record_fn=lambda yy: jnp.stack([yy[0], yy[1 + k_oh]]),
                record_size=record_size, max_steps=200000)),
                in_shardings=(sh,))
            res = solve(y0)
            oh = np.asarray(res.record[:, :, 1])
            ts = np.asarray(res.record_t)
            out[f"tau_{name}"] = [float(ts[i, np.argmax(oh[i])])
                                  for i in range(len(temps))]
        return out
