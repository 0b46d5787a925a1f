"""One-dimensional premixed flame (the reference's oneD capability).

Reference: cantera/src/oneD (Sim1D + StFlow: 1-D reacting-flow domains
solved by damped Newton with pseudo-transient continuation). Here the
burner-stabilized premixed flame is discretized method-of-lines on a fixed
grid — upwind convection at a prescribed mass flux, mixture-averaged
diffusion, full chemistry — and marched to steady state with the same JAX
BDF integrator the reactors use (pseudo-transient continuation, which is
also StFlow's fallback strategy).

State per grid point: [T, Y_1..Y_K]; constant pressure.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.kinetics import (build_kinetics,
                                             net_production_rates)
from g4s_tpu.models.cantera.mech import Mechanism, R_GAS
from g4s_tpu.models.cantera.thermo import cp0_R, h0_RT
from g4s_tpu.models.cantera.transport import (TransportData,
                                              mixture_diffusion_coeffs,
                                              thermal_conductivity)
from g4s_tpu.ops.odeint import bdf_solve


class FlameSetup(NamedTuple):
    mech: Mechanism
    tr: TransportData
    z: jnp.ndarray          # (n,) grid coordinates [m]
    mdot: float             # mass flux [kg/m^2/s]
    pressure: float         # Pa
    T_burner: float
    Y_burner: jnp.ndarray   # (nspec,) inlet mass fractions


class BurnerFlame:
    def __init__(self, mech: Mechanism, tr: TransportData, *, n_points=64,
                 width=0.02, mdot=0.04, pressure=101325.0, T_burner=300.0):
        self.mech = mech
        self.tr = tr
        self.kin = build_kinetics(mech)
        self.n = n_points
        self.z = jnp.asarray(np.linspace(0.0, width, n_points))
        self.mdot = mdot
        self.P = pressure
        self.T_burner = T_burner
        self.W = jnp.asarray(mech.mol_weights)

    def initial_profile(self, Y_in: np.ndarray, *, T_hot=2200.0,
                        ignition_pos=0.3):
        """Inlet composition everywhere + a hot downstream ramp to light
        the flame (Sim1D's initial guess role)."""
        n = self.n
        zf = np.linspace(0, 1, n)
        T = self.T_burner + (T_hot - self.T_burner) * np.clip(
            (zf - ignition_pos) / 0.15, 0.0, 1.0)
        Y = np.tile(Y_in, (n, 1))
        self.Y_in = jnp.asarray(Y_in)
        return jnp.concatenate([T[:, None], Y], axis=1).reshape(-1)

    def _props(self, T, Y):
        """rho, cp_mass, lambda, D_mix at all points (vectorized)."""
        x = (Y / self.W[None, :])
        x = x / x.sum(axis=1, keepdims=True)
        Wmix = 1.0 / jnp.sum(Y / self.W[None, :], axis=1)
        rho = self.P * Wmix / (R_GAS * T)
        cp_r = jax.vmap(lambda t: cp0_R(self.mech, t))(T)     # (n, K)
        cp_mass = jnp.sum(Y * cp_r * R_GAS / self.W[None, :], axis=1)
        lam = jax.vmap(lambda t, xx, c: thermal_conductivity(
            self.mech, self.tr, t, xx, c))(T, x, cp_r)
        D = jax.vmap(lambda t, xx: mixture_diffusion_coeffs(
            self.mech, self.tr, t, self.P, xx))(T, x)
        return rho, cp_mass, lam, D, x

    def rhs(self, t, state):
        """Pseudo-transient residual: dT/dt, dY/dt at interior points."""
        n, K = self.n, self.mech.nspec
        s = state.reshape(n, K + 1)
        T = jnp.clip(s[:, 0], 200.0, 4000.0)
        Y_raw = jnp.clip(s[:, 1:], 0.0, 1.0)
        Y = Y_raw / jnp.maximum(jnp.sum(Y_raw, axis=1, keepdims=True), 1e-12)
        rho, cp, lam, D, x = self._props(T, Y)
        z = self.z
        dz = z[1] - z[0]

        conc = rho[:, None] * Y / self.W[None, :]
        wdot = jax.vmap(lambda tt, cc: net_production_rates(
            self.kin, self.mech, tt, cc))(T, conc)            # mol/m^3/s

        u = self.mdot / rho                                   # velocity

        def ddz_upwind(f):
            # first-order upwind for positive u
            return jnp.concatenate([(f[1:2] - f[0:1]),
                                    f[1:] - f[:-1]]) / dz

        def d2dz2(f, coeff):
            # d/dz (coeff df/dz) with one-sided ends
            fm = jnp.pad(f, ((1, 1),) + ((0, 0),) * (f.ndim - 1), mode="edge")
            cm = jnp.pad(coeff, ((1, 1),) + ((0, 0),) * (coeff.ndim - 1),
                         mode="edge")
            c_half_p = 0.5 * (cm[2:] + cm[1:-1])
            c_half_m = 0.5 * (cm[1:-1] + cm[:-2])
            return (c_half_p * (fm[2:] - fm[1:-1])
                    - c_half_m * (fm[1:-1] - fm[:-2])) / dz ** 2

        # species: rho dY/dt = -mdot dY/dz + d/dz(rho D dY/dz) + wdot W
        diff_Y = d2dz2(Y, rho[:, None] * D)
        dY = (-self.mdot * ddz_upwind(Y) + diff_Y
              + wdot * self.W[None, :]) / rho[:, None]

        # energy: rho cp dT/dt = -mdot cp dT/dz + d/dz(lam dT/dz)
        #         - sum h_k wdot_k
        h_mol = jax.vmap(lambda tt: h0_RT(self.mech, tt))(T) * R_GAS * T[:, None]
        q_chem = -jnp.sum(h_mol * wdot, axis=1)
        dT = (-self.mdot * cp * ddz_upwind(T[:, None])[:, 0]
              + d2dz2(T[:, None], lam[:, None])[:, 0] + q_chem) / (rho * cp)

        # keep the raw state on the sum(Y)=1 manifold (the rhs is
        # scale-invariant in Y, so without this the raw state can drift)
        dY = dY + 1e2 * (Y - Y_raw)

        # boundary conditions: burner inlet fixed (T, Y); outlet zero-grad
        dT = dT.at[0].set((self.T_burner - T[0]) * 1e3)
        dY = dY.at[0].set((self.Y_in - s[0, 1:]) * 1e3)
        out = jnp.concatenate([dT[:, None], dY], axis=1)
        return out.reshape(-1)

    def solve(self, state0, *, t_end=0.5, rtol=1e-6, atol=1e-9,
              max_steps=20000):
        """Pseudo-transient march; returns (result, residual_reduction):
        the steady-state convergence measure Sim1D reports."""
        res = bdf_solve(self.rhs, state0, 0.0, t_end, rtol=rtol, atol=atol,
                        max_steps=max_steps)
        r0 = float(jnp.max(jnp.abs(self.rhs(0.0, state0))))
        r1 = float(jnp.max(jnp.abs(self.rhs(0.0, res.y))))
        return res, r1 / max(r0, 1e-300)

    def unpack(self, state):
        s = np.asarray(state).reshape(self.n, self.mech.nspec + 1)
        return s[:, 0], s[:, 1:]
