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
    """Device-resident mechanism arrays (built once).

    The three stoichiometric operators are staged through the graph
    engine (engine.build_graph) so the StoichManager contraction
    (StoichManager.h:63-121) executes whatever layout the dispatcher
    chose — dense/MXU at benchmark mechanism sizes.
    """
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
    is_plog: jnp.ndarray
    plog_logP: jnp.ndarray
    plog_arr: jnp.ndarray
    is_cheb: jnp.ndarray
    cheb_coeffs: jnp.ndarray
    cheb_Tlim: jnp.ndarray
    cheb_Plim: jnp.ndarray
    g_reac: object = None       # engine Graph of nu_reac
    g_prod: object = None       # engine Graph of nu_prod
    g_net: object = None        # engine Graph of nu_net


def build_kinetics(mech: Mechanism, dtype=jnp.float64) -> KineticsArrays:
    to = lambda x: jnp.asarray(x, dtype)
    nu_net = mech.nu_prod - mech.nu_reac
    from g4s_tpu.engine import build_graph
    from g4s_tpu.sparse.convert import dense_to_csr
    mk = lambda m: build_graph(dense_to_csr(m), dtype=dtype)
    return KineticsArrays(
        to(mech.nu_reac), to(mech.nu_prod), to(nu_net),
        to(nu_net.sum(axis=1)),
        to(mech.arr_A), to(mech.arr_b), to(mech.arr_Ea),
        jnp.asarray(mech.reversible), jnp.asarray(mech.is_three_body),
        jnp.asarray(mech.is_falloff), to(mech.efficiencies),
        to(mech.low_A), to(mech.low_b), to(mech.low_Ea),
        to(mech.troe), jnp.asarray(mech.has_troe),
        jnp.asarray(mech.is_plog), to(mech.plog_logP), to(mech.plog_arr),
        jnp.asarray(mech.is_cheb), to(mech.cheb_coeffs),
        to(mech.cheb_Tlim), to(mech.cheb_Plim),
        mk(mech.nu_reac), mk(mech.nu_prod), mk(nu_net))


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
    kf = jnp.where(kin.is_falloff, kf_falloff, kf)

    # pressure-dependent classes (gated at trace time; the benchmark
    # mechanisms carry none, so they cost nothing there). Pressure from the
    # ideal-gas state the kinetics sees (GasKinetics::update_rates_C).
    import numpy as _np
    if _np.any(_np.asarray(mech.is_plog)):
        P = jnp.sum(conc) * R_GAS * T
        lnP = jnp.log(jnp.maximum(P, 1e-300))
        # PlogRate.cpp: ln k linear in ln P between bracketing pressures;
        # clamped to the boundary rates outside the table
        lk = (jnp.log(kin.plog_arr[:, :, 0])
              + kin.plog_arr[:, :, 1] * logT
              - kin.plog_arr[:, :, 2] / (R_GAS * T))
        maxp = kin.plog_logP.shape[1]
        cnt = jnp.sum(kin.plog_logP <= lnP, axis=1)
        ilo = jnp.clip(cnt - 1, 0, max(maxp - 2, 0))[:, None]
        lp0 = jnp.take_along_axis(kin.plog_logP, ilo, 1)[:, 0]
        lp1 = jnp.take_along_axis(kin.plog_logP,
                                  jnp.minimum(ilo + 1, maxp - 1), 1)[:, 0]
        lk0 = jnp.take_along_axis(lk, ilo, 1)[:, 0]
        lk1 = jnp.take_along_axis(lk,
                                  jnp.minimum(ilo + 1, maxp - 1), 1)[:, 0]
        w = jnp.clip(jnp.where(jnp.isfinite(lp1 - lp0) & (lp1 > lp0),
                               (lnP - lp0) / jnp.where(lp1 > lp0,
                                                       lp1 - lp0, 1.0),
                               0.0), 0.0, 1.0)
        kf = jnp.where(kin.is_plog, jnp.exp(lk0 + w * (lk1 - lk0)), kf)
    if _np.any(_np.asarray(mech.is_cheb)):
        P = jnp.sum(conc) * R_GAS * T
        # ChebyshevRate.cpp: log10 k = sum a_ij Ti(Tred) Tj(Pred)
        Tmin, Tmax = kin.cheb_Tlim[:, 0], kin.cheb_Tlim[:, 1]
        Pmin, Pmax = kin.cheb_Plim[:, 0], kin.cheb_Plim[:, 1]
        tr = ((2.0 / T - 1.0 / Tmin - 1.0 / Tmax)
              / (1.0 / Tmax - 1.0 / Tmin))
        pr_ = ((2.0 * jnp.log10(P) - jnp.log10(Pmin) - jnp.log10(Pmax))
               / (jnp.log10(Pmax) - jnp.log10(Pmin)))
        nT, nP = kin.cheb_coeffs.shape[1], kin.cheb_coeffs.shape[2]

        def _cheb_basis(x, nfun):
            basis = [jnp.ones_like(x), x]
            for _ in range(2, nfun):
                basis.append(2.0 * x * basis[-1] - basis[-2])
            return jnp.stack(basis[:nfun], axis=-1)   # (nrxn, nfun)

        bt = _cheb_basis(tr, nT)
        bp = _cheb_basis(pr_, nP)
        log10k = jnp.einsum("rij,ri,rj->r", kin.cheb_coeffs, bt, bp)
        kf = jnp.where(kin.is_cheb, jnp.power(10.0, log10k), kf)
    return kf


def equilibrium_constants(kin: KineticsArrays, mech: Mechanism, T):
    """Kc in concentration units (mol/m^3)^dnu."""
    from g4s_tpu.engine import mxv
    g_RT = h0_RT(mech, T) - s0_R(mech, T)            # mu0/(RT) per species
    dG_RT = mxv(kin.g_net, g_RT)                     # engine mxv
    return jnp.exp(-dG_RT) * jnp.power(P_REF / (R_GAS * T), kin.dnu)


def rates_of_progress(kin: KineticsArrays, mech: Mechanism, T, conc):
    """(rop_f, rop_r) for all reactions; conc (nspec,) mol/m^3 >= 0."""
    from g4s_tpu.engine import mxv
    logc = jnp.log(jnp.maximum(conc, _LOG_FLOOR))
    kf = forward_rate_constants(kin, mech, T, conc)
    # concentration products via the engine's layout choice (mxv in log
    # space) — the StoichManager multiply() role
    rop_f = kf * jnp.exp(mxv(kin.g_reac, logc))
    Kc = equilibrium_constants(kin, mech, T)
    kr = jnp.where(kin.reversible, kf / jnp.maximum(Kc, 1e-300), 0.0)
    rop_r = kr * jnp.exp(mxv(kin.g_prod, logc))
    return rop_f, rop_r


def net_production_rates(kin: KineticsArrays, mech: Mechanism, T, conc):
    """wdot (nspec,) mol/m^3/s — getNetProductionRates.

    The increment/decrementSpecies contraction (Kinetics.cpp:489-492) as
    the engine's vxm: wdot_k = sum_r rop_r nu_net[r, k]."""
    from g4s_tpu.engine import vxm
    rop_f, rop_r = rates_of_progress(kin, mech, T, conc)
    return vxm(kin.g_net, rop_f - rop_r)
