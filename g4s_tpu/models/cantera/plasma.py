"""PlasmaPhase: an ideal gas whose electrons have their own temperature.

Reference: cantera/src/thermo/PlasmaPhase.cpp and
kinetics/TwoTempPlasmaRate.h. The phase carries an electron energy
distribution f(eps) over an energy-level grid [eV]:

  isotropic    f = c1/em^1.5 exp(-c2 (eps/em)^x) with the
               generalized-Maxwellian shape factor x
               (x = 1 Maxwellian, x = 2 Druyvesteyn),
               c1 = x G(5/(2x))^1.5 / G(3/(2x))^2.5,
               c2 = (G(5/(2x))/G(3/(2x)))^x
               This is the Hagelaar-Pitchford form, self-consistent with
               the normalization and mean-energy quadratures below. The
               reference's PlasmaPhase.cpp:64-78 evaluates the gammas at
               3x/2, 5x/2 and keeps a sqrt(eps) factor, which breaks both
               identities for x != 1 (an upstream 2.6 bug, corrected in
               later Cantera); we implement the consistent model.
  discretized  user-supplied (levels, f) pairs, optionally normalized
               to 2/3 int f d(eps^3/2) = 1

The electron temperature follows the mean energy
  em = 2/5 int f d(eps^5/2),   Te = (2/3) em e / kB,
and the electron species' reference thermo is evaluated at Te while all
heavy species use T (PlasmaPhase::updateThermo). The two-temperature
rate k = A exp(b ln Te - Ea_g/T + Ea_e (Te-T)/(Te T)) couples both
temperatures (TwoTempPlasmaRate.h:97-103).

All distribution functionals are jnp quadratures over the transformed
variables (trapezoid on eps^{3/2} / eps^{5/2}), so the whole
Te <- distribution pipeline is differentiable.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.condensed import SpeciesStd, load_species_std
from g4s_tpu.models.cantera.mech import _yaml_load

R = 8314.462618153324
BOLTZMANN = 1.380649e-23
E_CHARGE = 1.602176634e-19


def _quad_d(f, g):
    """int f dg by trapezoid on the (monotone) transformed variable g."""
    return jnp.sum(0.5 * (f[1:] + f[:-1]) * (g[1:] - g[:-1]))


def normalize_dist(levels, dist):
    """Scale so 2/3 int f d(eps^3/2) = 1 (normalizeElectronEnergyDistribution)."""
    norm = 2.0 / 3.0 * _quad_d(dist, levels ** 1.5)
    return dist / norm


def mean_electron_energy(levels, dist):
    """em [eV] = 2/5 int f d(eps^5/2) (updateElectronTemperatureFromEnergyDist)."""
    return 2.0 / 5.0 * _quad_d(dist, levels ** 2.5)


def electron_temp_from_energy(em_eV):
    return 2.0 / 3.0 * em_eV * E_CHARGE / BOLTZMANN


def isotropic_dist(levels, em_eV, x: float):
    """The generalized-Maxwellian EEDF at mean energy em [eV].

    Satisfies 2/3 int f d(eps^3/2) = 1 and 2/5 int f d(eps^5/2) = em
    exactly (in the continuum limit) for every shape factor x."""
    g1 = jnp.exp(jax.scipy.special.gammaln(1.5 / x))
    g2 = jnp.exp(jax.scipy.special.gammaln(2.5 / x))
    c1 = x * g2 ** 1.5 / g1 ** 2.5
    c2 = (g2 / g1) ** x
    return c1 / em_eV ** 1.5 * jnp.exp(-c2 * (levels / em_eV) ** x)


def two_temp_plasma_rate(A, b, Ea_gas_K, Ea_electron_K, T, Te):
    """k = A exp(b ln Te - Ea_g/T + Ea_e (Te - T)/(Te T))
    (TwoTempPlasmaRate::evalFromStruct; activation energies in K)."""
    return A * jnp.exp(b * jnp.log(Te) - Ea_gas_K / T
                       + Ea_electron_K * (Te - T) / (Te * T))


class PlasmaPhase(NamedTuple):
    species: Tuple[SpeciesStd, ...]
    electron_index: int
    dist_type: str
    levels: jnp.ndarray            # eV
    dist: jnp.ndarray
    shape_factor: float
    Te: float

    @property
    def names(self):
        return tuple(s.name for s in self.species)

    def mean_energy(self):
        return float(mean_electron_energy(self.levels, self.dist))

    # ---- thermo: heavy species at T, the electron species at Te ----

    def h0_RT(self, T):
        out = []
        for i, s in enumerate(self.species):
            Ts = self.Te if i == self.electron_index else T
            out.append(s.h0(Ts) / (R * Ts))
        return jnp.stack(out)

    def s0_R(self, T):
        out = []
        for i, s in enumerate(self.species):
            Ts = self.Te if i == self.electron_index else T
            out.append(s.s0(Ts) / R)
        return jnp.stack(out)

    def cp0_R(self, T):
        out = []
        for i, s in enumerate(self.species):
            Ts = self.Te if i == self.electron_index else T
            out.append(s.cp0(Ts) / R)
        return jnp.stack(out)

    def enthalpy_mole(self, T, X):
        """sum X_k h_k with the electron enthalpy at Te * (RT_e)."""
        h = []
        for i, s in enumerate(self.species):
            Ts = self.Te if i == self.electron_index else T
            h.append(s.h0(Ts))
        return jnp.dot(jnp.asarray(X), jnp.stack(h))


def _resolve_plasma_species(doc, phase, base_dir):
    """Species lists may point into other files: 'nasa_gas.yaml/species'."""
    entries = []
    for item in phase["species"]:
        (sec, names), = item.items() if isinstance(item, dict) \
            else (("species", [item]),)
        if "/" in sec:
            fname, section = sec.rsplit("/", 1)
            for cand in (os.path.join(base_dir, fname),
                         os.path.join(base_dir, os.pardir, os.pardir,
                                      "data", fname)):
                if os.path.exists(cand):
                    sub = _yaml_load(cand)
                    break
            else:
                raise FileNotFoundError(fname)
            table = {s["name"]: s for s in sub[section]}
        else:
            table = {s["name"]: s for s in doc[sec]}
        entries.extend(table[n] for n in
                       (names if names != "all" else table))
    return entries


def load_plasma(path: str, name: str) -> PlasmaPhase:
    doc = _yaml_load(path)
    phase = next(p for p in doc["phases"] if p["name"] == name)
    assert phase["thermo"] == "plasma"
    entries = _resolve_plasma_species(doc, phase, os.path.dirname(path))
    species = tuple(load_species_std(s) for s in entries)
    e_idx = next(i for i, s in enumerate(entries)
                 if s.get("composition") == {"E": 1})

    eedf = phase["electron-energy-distribution"]
    levels = jnp.asarray([float(v) for v in eedf["energy-levels"]],
                         jnp.float64)
    if eedf["type"] == "isotropic":
        x = float(eedf["shape-factor"])
        # "1.0 eV" or a bare number -> eV (the distribution's native unit)
        mee = eedf["mean-electron-energy"]
        if isinstance(mee, str):
            val, unit = mee.split()
            assert unit == "eV"
            em = float(val)
        else:
            em = float(mee)
        dist = isotropic_dist(levels, em, x)
        Te = float(electron_temp_from_energy(em))
        return PlasmaPhase(species, e_idx, "isotropic", levels, dist, x, Te)
    if eedf["type"] == "discretized":
        dist = jnp.asarray([float(v) for v in eedf["distribution"]],
                           jnp.float64)
        if eedf.get("normalize", True):
            dist = normalize_dist(levels, dist)
        em = mean_electron_energy(levels, dist)
        Te = float(electron_temp_from_energy(em))
        return PlasmaPhase(species, e_idx, "discretized", levels, dist,
                           float("nan"), Te)
    raise NotImplementedError(eedf["type"])
