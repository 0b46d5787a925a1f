"""Zero-D reactors and the reactor network driver.

Reference: cantera/src/zeroD — Reactor::eval (Reactor.cpp:203: mass/energy/
species ODE RHS calling getNetProductionRates at :222) integrated by
ReactorNet/CVodesIntegrator (ReactorNet.cpp:210 step -> CVode). Here the
reactor is a constant-volume adiabatic vessel (what `ct.Reactor` +
`ReactorNet.step()` does in the NonIdealShockTube driver) whose RHS is pure
jnp and whose integrator is the JAX BDF (g4s_tpu.ops.odeint).

State vector: y = [T, c_1 .. c_K] with c in mol/m^3 (constant volume, so
concentrations are the natural species variables). The energy equation is
derived by autodiff of the volumetric internal energy U(T, c):
  dU/dt = 0  =>  dT/dt = -(dU/dc . cdot) / (dU/dT)
which handles ideal and Redlich-Kwong phases identically — the real-gas
departure (RedlichKwongMFTP) simply changes U.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.kinetics import (build_kinetics,
                                             net_production_rates)
from g4s_tpu.models.cantera.mech import Mechanism, R_GAS
from g4s_tpu.models.cantera.thermo import (GasState, pr_molar_volume,
                                           rk_departures, rk_molar_volume,
                                           u0_RT)
from g4s_tpu.ops.odeint import bdf_solve


class IdealGasConstVolumeReactor:
    """Constant-volume adiabatic reactor; works for RK phases too
    (real_gas=True) via the departure-function energy."""

    def __init__(self, mech: Mechanism, *, real_gas: bool = False):
        self.mech = mech
        self.kin = build_kinetics(mech)
        self.gas = GasState(mech, real_gas=real_gas)
        self.real_gas = self.gas.real_gas
        self._advance_cache = {}

    # -- state setup ------------------------------------------------------
    def initial_state(self, T, P, X):
        """y0 from temperature, pressure, mole fractions (TPX).

        For the RK phase the molar volume solves the cubic EoS — the
        real-gas density difference that drives the benchmark's RK vs
        ideal ignition-delay gap.
        """
        X = np.asarray(X, np.float64)
        X = X / X.sum()
        if self.real_gas:
            solve_v = pr_molar_volume if self.gas._is_pr else rk_molar_volume
            v = float(solve_v(self.mech, jnp.asarray(float(T)),
                              jnp.asarray(float(P)), jnp.asarray(X)))
        else:
            v = R_GAS * float(T) / float(P)
        conc = X / v
        return jnp.concatenate([jnp.asarray([float(T)]), jnp.asarray(conc)])

    # -- energy -----------------------------------------------------------
    def _U_vol(self, T, conc):
        """Internal energy per unit volume (J/m^3)."""
        u_ig = u0_RT(self.mech, T) * R_GAS * T
        U = jnp.sum(conc * u_ig)
        if self.real_gas:
            ntot = jnp.sum(conc)
            x = conc / ntot
            u_dep, _ = self.gas._eos_departures(T, 1.0 / ntot, x)
            U = U + ntot * u_dep
        return U

    # -- RHS --------------------------------------------------------------
    def rhs(self, t, y):
        T = y[0]
        conc = jnp.maximum(y[1:], 0.0)
        cdot = net_production_rates(self.kin, self.mech, T, conc)
        dU_dT = jax.grad(self._U_vol, argnums=0)(T, conc)
        dU_dc = jax.grad(self._U_vol, argnums=1)(T, conc)
        dT = -jnp.dot(dU_dc, cdot) / dU_dT
        return jnp.concatenate([dT[None], cdot])

    # -- integration ------------------------------------------------------
    def advance(self, y0, t_end, *, rtol=1e-9, atol=1e-15, record_species=None,
                record_size=20000, max_steps=200000):
        """Integrate to t_end; optionally record (T, c_species) history at
        every accepted internal step (the ReactorNet.step() protocol)."""
        key = (rtol, atol, record_species, record_size, max_steps)
        fn = self._advance_cache.get(key)
        if fn is None:
            rec = None
            if record_species is not None:
                k = self.mech.species_index(record_species)
                rec = lambda y: jnp.stack([y[0], y[1 + k]])
            # jit the whole solve: the eager while_loop dispatch path is
            # ~2.5x slower (measured on the 103-species dodecane case)
            fn = jax.jit(lambda y, te: bdf_solve(
                self.rhs, y, 0.0, te, rtol=rtol, atol=atol,
                max_steps=max_steps, record_fn=rec,
                record_size=record_size))
            self._advance_cache[key] = fn
        return fn(y0, jnp.asarray(t_end, jnp.result_type(y0)))

    # -- observables ------------------------------------------------------
    def pressure(self, y):
        return self.gas.pressure(y[0], jnp.maximum(y[1:], 0.0))

    def temperature(self, y):
        return y[0]

    def mass_fractions(self, y):
        conc = jnp.maximum(y[1:], 0.0)
        rho = jnp.sum(conc * self.gas.W)
        return conc * self.gas.W / rho


class IdealGasConstPressureReactor(IdealGasConstVolumeReactor):
    """Constant-pressure adiabatic reactor (zeroD
    IdealGasConstPressureReactor): state y = [T, x_k (mole fractions)]
    at fixed P; the energy equation closes on enthalpy,
        sum_k n_k cp_k dT/dt = - sum_k h_k dn_k/dt   (per mole basis)
    and concentrations follow from the ideal-gas state c = x P/(R T).
    Ideal gas only (the RK/PR benchmark path is constant-volume).
    """

    def __init__(self, mech: Mechanism, *, pressure: float = 101325.0):
        super().__init__(mech, real_gas=False)
        self.P = pressure

    def initial_state(self, T, P, X):
        self.P = float(P)
        X = np.asarray(X, np.float64)
        X = X / X.sum()
        return jnp.concatenate([jnp.asarray([float(T)]), jnp.asarray(X)])

    def _conc(self, T, x):
        return x * (self.P / (R_GAS * T))

    def rhs(self, t, y):
        from g4s_tpu.models.cantera.thermo import cp0_R, h0_RT
        T = y[0]
        x = jnp.maximum(y[1:], 0.0)
        x = x / jnp.sum(x)
        conc = self._conc(T, x)
        wdot = net_production_rates(self.kin, self.mech, T, conc)
        ctot = jnp.sum(conc)
        # per mole of mixture: dx/dt from dn/dt at constant P
        xdot_raw = wdot / ctot
        xdot = xdot_raw - x * jnp.sum(xdot_raw)
        h = h0_RT(self.mech, T) * R_GAS * T
        cp = jnp.sum(x * cp0_R(self.mech, T)) * R_GAS
        dT = -jnp.dot(h, wdot) / (ctot * cp)
        return jnp.concatenate([dT[None], xdot])

    def pressure(self, y):
        return jnp.asarray(self.P)

    def temperature(self, y):
        return y[0]

    def mole_fractions(self, y):
        x = jnp.maximum(y[1:], 0.0)
        return x / jnp.sum(x)
