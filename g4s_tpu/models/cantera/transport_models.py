"""Specialty transport models: UnityLewis, DustyGas, IonGas.

Reference capability: cantera/src/transport/{UnityLewisTransport.h,
DustyGasTransport.cpp, IonGasTransport.cpp} — the remaining transport
surface beyond mixture-averaged (transport.py) and full multicomponent
(multi_transport.py).

  UnityLewis   D_km = lambda / (rho cp) for every species
               (UnityLewisTransport.h: unity Lewis number closure).
  DustyGas     porous-medium transport: H-matrix from porosity/
               tortuosity-scaled binary diffusion + Knudsen terms,
               inverted for the multicomponent D; molar fluxes add the
               Darcy pressure-driven term (DustyGasTransport.cpp:82-175).
  IonGas       ion-neutral collisions through the Stockmayer-(n,6,4)
               polarization model (Han et al. 2015), the O2/O2-
               resonant-charge-transfer table, electron defaults, and
               neutral-only mixture rules (IonGasTransport.cpp).

Oracles: the reference python suite's DustyGas porosity/tortuosity
scalings + flux signs (test_transport.py:326-366) and the IonGas
blessed regression values on ch4_ion.yaml (test_transport.py:212-238).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.mech import Mechanism, R_GAS
from g4s_tpu.models.cantera.transport import (AVOGADRO, KB, TransportData,
                                              binary_diffusion,
                                              mixture_viscosity,
                                              species_viscosities,
                                              thermal_conductivity)

E_CHARGE = 1.602176634e-19
EPS0 = 8.8541878128e-12


# ---------------------------------------------------------------------------
# UnityLewis
# ---------------------------------------------------------------------------

def unity_lewis_diffusion(mech: Mechanism, tr: TransportData, T, P, x,
                          cp_R):
    """All-species D_km = lambda/(rho cp) (UnityLewisTransport.h:
    getMixDiffCoeffs): Lewis number Le = 1 closure."""
    lam = thermal_conductivity(mech, tr, T, x, cp_R)
    W = jnp.asarray(mech.mol_weights)
    Wmix = jnp.sum(x * W)
    rho = P * Wmix / (R_GAS * T)
    cp_mass = jnp.sum(x * cp_R) * R_GAS / Wmix
    return jnp.full(mech.nspec, lam / (rho * cp_mass))


# ---------------------------------------------------------------------------
# DustyGas
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DustyGas:
    """Porous-medium multicomponent transport
    (DustyGasTransport.cpp)."""

    mech: Mechanism
    tr: TransportData
    porosity: float = 0.5
    tortuosity: float = 1.0
    pore_radius: float = 1e-7       # m
    particle_diameter: float = 1e-6  # m
    permeability: Optional[float] = None

    def knudsen_diff(self, T):
        """D_k = 2/3 (r phi/tau) sqrt(8RT/(pi W))
        (updateKnudsenDiffCoeffs:82-93)."""
        Kg = self.pore_radius * self.porosity / self.tortuosity
        W = jnp.asarray(self.mech.mol_weights)
        return (2.0 / 3.0) * Kg * jnp.sqrt(8.0 * R_GAS * T / (np.pi * W))

    def multi_diff_coeffs(self, T, P, x):
        """H^-1 with H from porosity-scaled binary + Knudsen terms
        (eval_H_matrix:95-114)."""
        n = self.mech.nspec
        d = binary_diffusion(self.mech, self.tr, T, P) \
            * (self.porosity / self.tortuosity)
        dk = self.knudsen_diff(T)
        x = jnp.maximum(x, 0.0)
        H = -x[:, None] / d
        off = jnp.sum(jnp.where(jnp.eye(n, dtype=bool), 0.0,
                                x[None, :] / d), axis=1)
        H = H.at[jnp.arange(n), jnp.arange(n)].set(1.0 / dk + off)
        return jnp.linalg.inv(H)

    def molar_fluxes(self, T1, T2, rho1, rho2, Y1, Y2, delta):
        """Fluxes across a slab of thickness delta
        (getMolarFluxes:116-175): multicomponent diffusion of the
        concentration gradient + Darcy pressure-driven flow."""
        W = jnp.asarray(self.mech.mol_weights)
        c1 = rho1 * jnp.asarray(Y1) / W
        c2 = rho2 * jnp.asarray(Y2) / W
        cbar = 0.5 * (c1 + c2)
        gradc = (c2 - c1) / delta
        p1 = jnp.sum(c1) * R_GAS * T1
        p2 = jnp.sum(c2) * R_GAS * T2
        pbar = 0.5 * (p1 + p2)
        gradp = (p2 - p1) / delta
        tbar = 0.5 * (T1 + T2)
        xbar = cbar / jnp.sum(cbar)
        Dm = self.multi_diff_coeffs(tbar, pbar, xbar)
        fluxes = Dm @ gradc
        if self.permeability is None:
            p_, d_, t_ = self.porosity, self.particle_diameter, \
                self.tortuosity
            b = p_ ** 3 * d_ * d_ / (72.0 * t_ * (1.0 - p_) ** 2)
        else:
            b = self.permeability
        mu = mixture_viscosity(self.mech, self.tr, tbar, xbar)
        dk = self.knudsen_diff(tbar)
        fluxes = fluxes + Dm @ (cbar / dk * (b * gradp / mu))
        return -fluxes

    def thermal_conductivity(self, T, x, cp_R):
        """Delegated to the gas-phase model
        (DustyGasTransport inherits the gas lambda)."""
        return thermal_conductivity(self.mech, self.tr, T, x, cp_R)


# ---------------------------------------------------------------------------
# IonGas
# ---------------------------------------------------------------------------

# O2/O2- resonant-charge-transfer collision integral [A^2] vs T,
# Prager (2005) table (IonGasTransport.cpp:62-71), degree-5 polyfit
_O2_TEMPS = np.array([300.0, 400.0, 500.0, 600.0, 800.0, 1000.0,
                      1200.0, 1500.0, 2000.0, 2500.0, 3000.0, 4000.0])
_O2_OM11 = np.array([120.0, 107.0, 98.1, 92.1, 83.0, 77.0,
                     72.6, 67.9, 62.7, 59.3, 56.7, 53.8])


def _omega11_n64(tstar, gamma):
    """Piecewise fit of the (n,6,4) reduced collision integral
    (IonGasTransport::omega11_n64:319-350)."""
    lt = np.log(tstar)
    if tstar < 0.01:
        raise ValueError(f"tstar {tstar} < 0.01")
    if tstar <= 0.04:
        return (2.97 - 12.0 * gamma - 0.887 * lt + 3.86 * gamma * gamma
                - 6.45 * gamma * lt - 0.275 * lt * lt
                + 1.20 * gamma * gamma * lt - 1.24 * gamma * lt * lt
                - 0.164 * lt ** 3)
    if tstar <= 1000:
        return (1.22 - 0.0343 * gamma
                + (-0.769 + 0.232 * gamma) * lt
                + (0.306 - 0.165 * gamma) * lt * lt
                + (-0.0465 + 0.0388 * gamma) * lt ** 3
                + (0.000614 - 0.00285 * gamma) * lt ** 4
                + 0.000238 * lt ** 5)
    raise ValueError(f"tstar {tstar} > 1000")


class IonGasTransport:
    """Ion/electron-aware gas transport (IonGasTransport.cpp).

    Neutral pairs keep the Chapman-Enskog LJ model; ion-neutral pairs
    use the Stockmayer-(n,6,4) polarization model with Han et al.'s
    K2=1.44 refit; O2/O2- uses the experimental table (resonant charge
    transfer); the electron gets the 0.4 m^2/V/s mobility default.
    Mixture rules sum over NEUTRAL species only."""

    def __init__(self, mech: Mechanism, tr: TransportData, charges=None):
        self.mech = mech
        self.tr = tr
        n = mech.nspec
        if charges is None:
            charges = np.array([-c.get("E", 0.0)
                                for c in mech.compositions])
        self.charge = np.asarray(charges, np.float64)
        self.k_e = None
        for k in range(n):
            if self.charge[k] == -1 and mech.mol_weights[k] < 1e-5:
                self.k_e = k
        self.ions = [k for k in range(n)
                     if self.charge[k] != 0 and k != self.k_e]
        self.neutrals = [k for k in range(n) if self.charge[k] == 0]
        self._setup_n64()
        self._om11_o2_poly = np.polyfit(_O2_TEMPS, _O2_OM11, 5)
        try:
            self.k_o2 = mech.species_names.index("O2")
            self.k_o2m = mech.species_names.index("O2-")
        except ValueError:
            self.k_o2 = self.k_o2m = None

    def _setup_n64(self):
        """diam/epsilon/gamma for ion-neutral pairs
        (setupN64:252-317). alpha in the yaml is in Angstrom^3; SI m^3
        = 1e-30 * A^3."""
        n = self.mech.nspec
        alpha = np.asarray(self.tr.polarizability) * 1e-30
        self.diam = np.zeros((n, n))
        self.epsn = np.zeros((n, n))
        self.gamma = np.zeros((n, n))
        disp = np.zeros(n)
        quad = np.zeros(n)
        for i in self.ions:
            for j in self.neutrals:
                if alpha[i] == 0.0 or alpha[j] == 0.0:
                    continue
                r_alpha = alpha[i] / alpha[j]
                aAi, aAj = alpha[i] * 1e30, alpha[j] * 1e30
                z2 = self.charge[i] ** 2
                xi = aAi / (z2 * (1.0 + (2 * r_alpha) ** (2.0 / 3.0))
                            * np.sqrt(aAj))
                K1, kappa = 1.767, 0.095
                dij = K1 * (alpha[i] ** (1 / 3) + alpha[j] ** (1 / 3)) \
                    / (aAi * aAj * (1.0 + 1.0 / xi)) ** kappa
                self.diam[i, j] = dij
                eps = (1.44 * E_CHARGE ** 2 * z2 * alpha[j] * (1.0 + xi)
                       / (8 * np.pi * EPS0 * dij ** 4))
                self.epsn[i, j] = eps
                if disp[j] == 0.0:
                    disp[j] = np.exp(1.8846 * np.log(aAj) - 0.4737) * 1e-50
                if quad[j] == 0.0:
                    quad[j] = 2.0 * disp[j]
                if disp[i] == 0.0:
                    if self.charge[i] > 0:
                        disp[i] = np.exp(1.8853 * np.log(aAi)
                                         + 0.2682) * 1e-50
                    else:
                        disp[i] = np.exp(3.2246 * np.log(aAi)
                                         - 3.2397) * 1e-50
                C6 = 2.0 * disp[i] * disp[j] / (disp[i] / r_alpha
                                                + disp[j] * r_alpha)
                self.gamma[i, j] = (2.0 / z2 * C6 + quad[j]) \
                    / (alpha[j] * dij * dij)
                self.diam[j, i] = dij
                self.epsn[j, i] = eps
                self.gamma[j, i] = self.gamma[i, j]

    def binary_diff(self, T, P):
        """(n, n) binary diffusion at (T, P): LJ for neutral pairs,
        (n,6,4) for ion-neutral, O2/O2- table
        (fitDiffCoeffs:160-246, evaluated directly — no polyfit)."""
        n = self.mech.nspec
        D = np.array(binary_diffusion(self.mech, self.tr, T, P))
        m = np.asarray(self.mech.mol_weights) / AVOGADRO
        for i in self.ions:
            for j in self.neutrals:
                if self.diam[i, j] == 0.0:
                    continue
                tstar = KB * T / self.epsn[i, j]
                om11 = _omega11_n64(tstar, self.gamma[i, j]) \
                    * np.pi * self.diam[i, j] ** 2
                if self.k_o2 is not None and \
                        {i, j} == {self.k_o2, self.k_o2m}:
                    om11 = np.polyval(self._om11_o2_poly, T) / 1e20
                mu = m[i] * m[j] / (m[i] + m[j])
                d = (3.0 / 16.0 * np.sqrt(2.0 * np.pi / mu)
                     * (KB * T) ** 1.5 / om11) / P
                D[i, j] = D[j, i] = d
        return D

    def mix_diff_coeffs(self, T, P, x):
        """getMixDiffCoeffs:352-386: ions/neutrals sum over neutral
        partners only; electron D = 0.4 kT/e."""
        x = np.maximum(np.asarray(x, np.float64), 0.0)
        x = x / x.sum()
        D = self.binary_diff(T, P)
        W = np.asarray(self.mech.mol_weights)
        mmw = float(x @ W)
        out = np.zeros(self.mech.nspec)
        for k in range(self.mech.nspec):
            if k == self.k_e:
                out[k] = 0.4 * KB * T / E_CHARGE
                continue
            s = sum(x[j] / D[j, k] for j in self.neutrals if j != k)
            out[k] = D[k, k] if s <= 0.0 \
                else (mmw - x[k] * W[k]) / (mmw * s)
        return out

    def mobilities(self, T, P, x):
        """getMobilities:388-412: mobility of ion k from the
        neutral-partner harmonic sum of e D_kj / kT."""
        x = np.maximum(np.asarray(x, np.float64), 0.0)
        x = x / x.sum()
        D = self.binary_diff(T, P)
        kbt = KB * T
        out = np.zeros(self.mech.nspec)
        if self.k_e is not None:
            out[self.k_e] = 0.4
        for k in self.ions:
            s = sum(x[j] / (D[k, j] * E_CHARGE / kbt)
                    for j in self.neutrals)
            out[k] = 1.0 / s
        return out

    def viscosity(self, T, x):
        """Wilke over neutral species only (viscosity:102-124)."""
        x = np.maximum(np.asarray(x, np.float64), 0.0)
        x = x / x.sum()
        mu = np.asarray(species_viscosities(self.mech, self.tr, T))
        W = np.asarray(self.mech.mol_weights)
        phi = (1.0 + np.sqrt(mu[:, None] / mu[None, :])
               * (W[None, :] / W[:, None]) ** 0.25) ** 2 \
            / np.sqrt(8.0 * (1.0 + W[:, None] / W[None, :]))
        denom = phi @ x
        return float(sum(x[k] * mu[k] / denom[k] for k in self.neutrals))

    def electrical_conductivity(self, T, P, x):
        """electricalConductivity:143-158."""
        x = np.maximum(np.asarray(x, np.float64), 0.0)
        x = x / x.sum()
        mobi = self.mobilities(T, P, x)
        kbt = KB * T
        s = sum(x[k] * P / kbt * abs(self.charge[k]) * E_CHARGE * mobi[k]
                for k in self.ions)
        if self.k_e is not None:
            s += x[self.k_e] * P / kbt * E_CHARGE * mobi[self.k_e]
        return s
