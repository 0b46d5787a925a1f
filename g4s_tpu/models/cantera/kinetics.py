"""Gas-phase kinetics: rates of progress and net production rates.

Reference semantics (cantera/src/kinetics/GasKinetics.cpp:227 updateROP +
Kinetics.cpp:484 getNetProductionRates):
  kf = A T^b exp(-Ea/RT)                       (Arrhenius)
  three-body: rate *= M = sum_k eff_k c_k
  falloff:    Pr = k0 M / kinf; kf = kinf Pr/(1+Pr) * F  (Lindemann/Troe)
  kr = kf / Kc for reversible reactions, Kc from NASA equilibrium
  rop = kf prod c^nu_r - kr prod c^nu_p
  wdot = (nu_p - nu_r)^T rop                   (the StoichManager mxv)

TPU-first: every reaction class is evaluated for ALL reactions with masks
(no per-type scatter/gather), concentration products go through one MXU
matmul in log space, and the stoichiometric contraction is a dense matmul —
the engine's chosen execution strategy at this operator size.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from g4s_tpu.models.cantera.mech import Mechanism, P_REF, R_GAS
from g4s_tpu.models.cantera.thermo import h0_RT, s0_R

_LOG_FLOOR = 1e-300


class KineticsArrays(NamedTuple):
    """Device-resident mechanism arrays (built once)."""
    nu_reac: jnp.ndarray
    nu_prod: jnp.ndarray
    nu_net: jnp.ndarray
    dnu: jnp.ndarray
    arr_A: jnp.ndarray
    arr_b: jnp.ndarray
    arr_Ea: jnp.ndarray
    reversible: jnp.ndarray
    is_three_body: jnp.ndarray
    is_falloff: jnp.ndarray
    efficiencies: jnp.ndarray
    low_A: jnp.ndarray
    low_b: jnp.ndarray
    low_Ea: jnp.ndarray
    troe: jnp.ndarray
    has_troe: jnp.ndarray


def build_kinetics(mech: Mechanism, dtype=jnp.float64) -> KineticsArrays:
    to = lambda x: jnp.asarray(x, dtype)
    nu_net = mech.nu_prod - mech.nu_reac
    return KineticsArrays(
        to(mech.nu_reac), to(mech.nu_prod), to(nu_net),
        to(nu_net.sum(axis=1)),
        to(mech.arr_A), to(mech.arr_b), to(mech.arr_Ea),
        jnp.asarray(mech.reversible), jnp.asarray(mech.is_three_body),
        jnp.asarray(mech.is_falloff), to(mech.efficiencies),
        to(mech.low_A), to(mech.low_b), to(mech.low_Ea),
        to(mech.troe), jnp.asarray(mech.has_troe))


def _arrhenius(A, b, Ea, T, logT):
    return A * jnp.exp(b * logT - Ea / (R_GAS * T))


def forward_rate_constants(kin: KineticsArrays, mech: Mechanism, T, conc):
    """kf for every reaction, including third-body / falloff factors that
    multiply into the effective forward rate."""
    logT = jnp.log(T)
    kf = _arrhenius(kin.arr_A, kin.arr_b, kin.arr_Ea, T, logT)

    M = kin.efficiencies @ conc                      # (nrxn,)

    # pure three-body: multiply by M
    kf = jnp.where(kin.is_three_body, kf * M, kf)

    # falloff: blend low/high-pressure limits
    k0 = _arrhenius(kin.low_A, kin.low_b, kin.low_Ea, T, logT)
    pr = k0 * M / jnp.maximum(kf, 1e-300)
    pr = jnp.maximum(pr, 1e-300)
    # Troe broadening
    a, t3, t1, t2 = kin.troe[:, 0], kin.troe[:, 1], kin.troe[:, 2], kin.troe[:, 3]
    fcent = ((1.0 - a) * jnp.exp(-T / jnp.maximum(t3, 1e-30))
             + a * jnp.exp(-T / jnp.maximum(t1, 1e-30))
             + jnp.where(t2 > 0.0, jnp.exp(-t2 / T), 0.0))
    fcent = jnp.clip(fcent, 1e-300, 1.0)
    log_fc = jnp.log10(fcent)
    c_t = -0.4 - 0.67 * log_fc
    n_t = 0.75 - 1.27 * log_fc
    lpr = jnp.log10(pr)
    f1 = (lpr + c_t) / (n_t - 0.14 * (lpr + c_t))
    log_F = log_fc / (1.0 + f1 * f1)
    F = jnp.where(kin.has_troe, jnp.power(10.0, log_F), 1.0)
    kf_falloff = kf * (pr / (1.0 + pr)) * F
    return jnp.where(kin.is_falloff, kf_falloff, kf)


def equilibrium_constants(kin: KineticsArrays, mech: Mechanism, T):
    """Kc in concentration units (mol/m^3)^dnu."""
    g_RT = h0_RT(mech, T) - s0_R(mech, T)            # mu0/(RT) per species
    dG_RT = kin.nu_net @ g_RT
    return jnp.exp(-dG_RT) * jnp.power(P_REF / (R_GAS * T), kin.dnu)


def rates_of_progress(kin: KineticsArrays, mech: Mechanism, T, conc):
    """(rop_f, rop_r) for all reactions; conc (nspec,) mol/m^3 >= 0."""
    logc = jnp.log(jnp.maximum(conc, _LOG_FLOOR))
    kf = forward_rate_constants(kin, mech, T, conc)
    rop_f = kf * jnp.exp(kin.nu_reac @ logc)
    Kc = equilibrium_constants(kin, mech, T)
    kr = jnp.where(kin.reversible, kf / jnp.maximum(Kc, 1e-300), 0.0)
    rop_r = kr * jnp.exp(kin.nu_prod @ logc)
    return rop_f, rop_r


def net_production_rates(kin: KineticsArrays, mech: Mechanism, T, conc):
    """wdot (nspec,) mol/m^3/s — getNetProductionRates."""
    rop_f, rop_r = rates_of_progress(kin, mech, T, conc)
    return (rop_f - rop_r) @ kin.nu_net
