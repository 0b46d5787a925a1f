"""Vectorized state container (the reference's SolutionArray,
interfaces/cython/cantera/composite.py).

SolutionArray holds N thermodynamic states and evaluates properties for
all of them at once. The reference loops per state through the C++
objects; here every property is one vmapped jnp evaluation — the natural
TPU batch execution (states along the leading axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.kinetics import (build_kinetics,
                                             net_production_rates)
from g4s_tpu.models.cantera.mech import Mechanism, R_GAS
from g4s_tpu.models.cantera.thermo import cp0_R, h0_RT, s0_R


class SolutionArray:
    """states: TPX arrays — T (n,), P (n,), X (n, nspec)."""

    def __init__(self, mech: Mechanism, n: int | None = None, *,
                 T=None, P=None, X=None):
        self.mech = mech
        self.kin = build_kinetics(mech)
        self.W = jnp.asarray(mech.mol_weights)
        if T is not None:
            T = jnp.atleast_1d(jnp.asarray(T, jnp.float64))
            n = T.shape[0]
        n = n or 1
        self.T = T if T is not None else jnp.full((n,), 300.0)
        P = jnp.atleast_1d(jnp.asarray(
            P if P is not None else 101325.0, jnp.float64))
        self.P = jnp.broadcast_to(P, (n,))
        if X is None:
            X = jnp.zeros((n, mech.nspec)).at[:, 0].set(1.0)
        else:
            X = jnp.atleast_2d(jnp.asarray(X, jnp.float64))
            X = jnp.broadcast_to(X, (n, mech.nspec))
        self.X = X / jnp.sum(X, axis=1, keepdims=True)

    def __len__(self):
        return self.T.shape[0]

    # -- thermodynamic properties (all (n,) or (n, nspec)) ---------------
    @property
    def mean_molecular_weight(self):
        return jnp.sum(self.X * self.W, axis=1)

    @property
    def density(self):
        """Mass density, ideal gas (kg/m^3)."""
        return self.P * self.mean_molecular_weight / (R_GAS * self.T)

    @property
    def concentrations(self):
        """(n, nspec) mol/m^3."""
        ctot = self.P / (R_GAS * self.T)
        return self.X * ctot[:, None]

    @property
    def cp_mole(self):
        return jax.vmap(lambda T, x: jnp.sum(x * cp0_R(self.mech, T))
                        * R_GAS)(self.T, self.X)

    @property
    def enthalpy_mole(self):
        return jax.vmap(lambda T, x: jnp.sum(x * h0_RT(self.mech, T))
                        * R_GAS * T)(self.T, self.X)

    @property
    def entropy_mole(self):
        """Ideal mixture molar entropy incl. mixing + pressure terms."""
        def one(T, P, x):
            s0 = s0_R(self.mech, T) * R_GAS
            xs = jnp.maximum(x, 1e-300)
            return jnp.sum(x * (s0 - R_GAS * jnp.log(xs)
                                - R_GAS * jnp.log(P / 101325.0)))
        return jax.vmap(one)(self.T, self.P, self.X)

    @property
    def net_production_rates(self):
        return jax.vmap(lambda T, c: net_production_rates(
            self.kin, self.mech, T, c))(self.T, self.concentrations)

    # -- bulk operations --------------------------------------------------
    def equilibrate(self, mode: str = "TP"):
        """Equilibrate every state at constant T, P (ChemEquil role)."""
        if mode != "TP":
            raise NotImplementedError("only TP equilibration")
        from g4s_tpu.models.cantera.equilibrium import equilibrate_tp
        X = np.stack([np.asarray(equilibrate_tp(
            self.mech, float(self.T[i]), float(self.P[i]),
            np.asarray(self.X[i]))) for i in range(len(self))])
        self.X = jnp.asarray(X)
        return self

    def __getattr__(self, name):
        # species mole-fraction accessor: sol("H2O") style instead; keep
        # attribute errors informative
        raise AttributeError(name)

    def __call__(self, species: str):
        """Mole fractions of one species across all states."""
        return self.X[:, self.mech.species_index(species)]
