"""HKFT standard states and variable Debye parameters for aqueous ions.

Reference: cantera/src/thermo/PDSS_HKFT.cpp (revised Helgeson-Kirkham-
Flowers equation of state for aqueous species) and WaterProps.cpp
(Bradley-Pitzer relative permittivity, variable A_Debye).

The reference hand-derives ~800 lines of temperature/pressure
derivatives (molarVolume, enthalpy_mole, cp_mole, the ifunc=1..3
branches of every helper). Here the standard chemical potential
mu0(T, P) is ONE differentiable jnp closed form —

  mu0 = mu0_tr_pr - s0 (T-Tr) - c1 (T ln(T/Tr) - T + Tr)
        + a1 (p-pr) + a2 ln((PSI+p)/(PSI+pr))
        - c2 [ (1/(T-TH) - 1/(Tr-TH)) (TH-T)/TH
               - T/TH^2 ln(Tr (T-TH) / (T (Tr-TH))) ]
        + (a3 (p-pr) + a4 ln((PSI+p)/(PSI+pr))) / (T-TH)
        - omega_j(T,P) (Z+1) + omega_tr_pr (Z_ref+1)
        + omega_tr_pr Y_ref (T-Tr)                 [PDSS_HKFT::deltaG]

with TH = 228 K, PSI = 2600 bar, Z = -1/eps(T,P), the charge-dependent
omega_j through the Shock g-function (solvent-density dependent), and
eps the Bradley-Pitzer fit — so V = dmu0/dP, S = -dmu0/dT, H = mu0 + TS
all come from jax.grad, including through the IAPWS-95 density solve
(water.py Newton iterations are differentiable).

The formation-energy bookkeeping (convertDGFormation) uses the standard
element entropies at 298.15 K (JANAF / Robie & Hemingway values, as in
data/element-standard-entropies.yaml).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera import water
from g4s_tpu.models.cantera.condensed import _UNIT_SCALE, _mw, parse_qty

R = 8314.462618153324
CAL = 4184.0                  # J/kmol per cal/gmol
T_R = 298.15
P_R_BAR = 1.0                 # reference pressure, bar (PDSS_HKFT.cpp:48)
THETA = 228.0
PSI_BAR = 2600.0
NU = 166027.0                 # cal gmol^-1 Angstrom (Born radius constant)
AVOGADRO = 6.02214076e26
E_CHARGE = 1.602176634e-19
EPS0 = 8.854187812773345e-12  # 1/(c^2 mu_0), ct_defs.h:134

# standard entropies of the elements at 298.15 K, J/kmol/K
# (JANAF 4th ed. / Robie & Hemingway; the reference ships the same
# values in data/element-standard-entropies.yaml)
ENTROPY298 = {
    "H": 65340.0, "LI": 29085.0, "C": 5740.0, "N": 95804.5, "O": 102573.5,
    "F": 101394.5, "NA": 51455.0, "MG": 32671.0, "AL": 28275.0,
    "SI": 18820.0, "S": 32056.0, "CL": 111535.0, "K": 64670.0,
    "CA": 41588.0, "FE": 27321.0, "BR": 76103.0, "E": 0.0,
}


def rel_epsilon(T, P):
    """Bradley-Pitzer relative permittivity of water
    (WaterProps.cpp:relEpsilon, the ifunc=0 branch; derivatives by
    autodiff instead of the hand-coded ifunc=1..3)."""
    U1, U2, U3 = 3.4279e2, -5.0866e-3, 9.4690e-7
    U4, U5, U6 = -2.0525, 3.1159e3, -1.8289e2
    U7, U8, U9 = -8.0325e3, 4.2142e6, 2.1417
    eps1000 = U1 * jnp.exp(U2 * T + U3 * T * T)
    C = U4 + U5 / (U6 + T)
    B = U7 + U8 / T + U9 * T
    pbar = P * 1e-5
    return eps1000 + C * jnp.log((B + pbar) / (B + 1000.0))


def a_debye(T, P):
    """A_Debye(T, P) on the molality scale, kg^1/2 gmol^-1/2
    (WaterProps.cpp:ADebye ifunc=0; dA/dT, dA/dP via jax.grad)."""
    psat = water.psat(T) if hasattr(water, "psat") else 0.0
    P_eff = jnp.maximum(P, psat)
    eps = EPS0 * rel_epsilon(T, P_eff)
    dw = water.density(T, P_eff)            # kg/m^3
    tmp = jnp.sqrt(2.0 * AVOGADRO * dw / 1000.0)
    tmp2 = E_CHARGE * E_CHARGE * AVOGADRO / (eps * R * T)
    return tmp * tmp2 * jnp.sqrt(tmp2) / (8.0 * jnp.pi)


def _ag(T):
    return -2.037662 + 5.747000e-3 * T + -6.557892e-6 * T * T


def _bg(T):
    return 6.107361 + -1.074377e-2 * T + 1.268348e-5 * T * T


def _f_func(T, P):
    """PDSS_HKFT::f — the high-T correction; exactly 0 below 155 C."""
    TC = jnp.minimum(T - 273.15, 355.0)
    pbar = P / 1e5
    # clamp before the fractional power: a negative base in the untaken
    # branch would poison the gradient through jnp.where
    T1 = jnp.maximum((TC - 155.0) / 300.0, 0.0)
    pd = 1000.0 - pbar
    fac2 = -0.1504956e-9 * pd ** 3 + 0.5107997e-13 * pd ** 4
    val = T1 ** 4.8 + 3.666666e1 * T1 ** 16.0 * fac2
    return jnp.where((TC < 155.0) | (pbar > 1000.0), 0.0, val)


def g_star(T, P):
    """Shock et al. solvent g-function (PDSS_HKFT::gstar = g - f)."""
    dens = water.density(T, P) * 1e-3       # g/cm^3
    gval = _ag(T) * (1.0 - dens) ** _bg(T)
    gval = jnp.where(dens >= 1.0, 0.0, gval)
    return gval - _f_func(T, P)


class HKFTSpecies(NamedTuple):
    name: str
    charge: float
    mw: float                    # kg/kmol
    mu0_tr_pr: float             # J/kmol at (Tr, Pr)
    s0: float                    # cal/gmol/K
    a1: float                    # cal/gmol/bar
    a2: float                    # cal/gmol
    a3: float                    # cal K/gmol/bar
    a4: float                    # cal K/gmol
    c1: float                    # cal/gmol/K
    c2: float                    # cal K/gmol
    omega: float                 # cal/gmol


def load_hkft_species(sp: dict) -> HKFTSpecies:
    """Build from a YAML species entry with equation-of-state: HKFT.

    h0/g0/s0 follow the reference's completion rules
    (PDSS_HKFT::initThermo): with h0+s0, mu0 = h0 - Tr*s0; with g0+s0,
    mu0 = g0 + sum_el n_el*(-Tr*S298_el) - z*(-Tr*S298_H)."""
    eos = sp["equation-of-state"]
    assert eos["model"] == "HKFT"
    comp = sp.get("composition", {})
    charge = float(comp.get("E", 0)) * -1.0
    mw = _mw(comp)
    a = eos.get("a", [0, 0, 0, 0])
    c = eos.get("c", [0, 0])

    def qv(v, unit_cal):
        """eos value -> the internal cal-based working units. Strings
        carry their own units; bare numbers are already in cal units
        (the file's units block declares cal/mol/bar, which equal the
        working units)."""
        if isinstance(v, str):
            return parse_qty(v) / parse_qty("1 " + unit_cal)
        return float(v)
    a1 = qv(a[0], "cal/gmol/bar")
    a2 = qv(a[1], "cal/gmol")
    a3 = qv(a[2], "cal*K/gmol/bar")
    a4 = qv(a[3], "cal*K/gmol")
    c1 = qv(c[0], "cal/gmol/K")
    c2 = qv(c[1], "cal*K/gmol")
    omega = qv(eos.get("omega", 0.0), "cal/gmol")
    s0 = qv(eos.get("s0", 0.0), "cal/gmol/K")
    h0 = eos.get("h0")
    g0 = eos.get("g0")
    # PDSS_HKFT::initThermo ends with an unconditional
    # convertDGFormation(), so g0 wins whenever it is present; h0 only
    # seeds mu0 when g0 is absent.
    if g0 is not None:
        g0 = qv(g0, "cal/gmol")
        total = sum(n * (-T_R * ENTROPY298[el.upper()])
                    for el, n in comp.items() if n > 0)
        total -= charge * (-T_R * ENTROPY298["H"])
        mu0 = g0 * CAL + total
    else:
        h0 = qv(h0, "cal/gmol")
        mu0 = h0 * CAL - T_R * s0 * CAL
    return HKFTSpecies(sp["name"], charge, mw, mu0, s0, a1, a2, a3, a4,
                       c1, c2, omega)


def _z_y_ref():
    """Z and Y = dZ/dT at (Tr, 1 atm) — PDSS_HKFT::initThermo."""
    T = jnp.asarray(T_R, jnp.float64)
    P = jnp.asarray(101325.0, jnp.float64)
    Z = -1.0 / rel_epsilon(T, P)
    Y = jax.grad(lambda t: -1.0 / rel_epsilon(t, P))(T)
    return float(Z), float(Y)


_ZY_CACHE = None


def mu0(sp: HKFTSpecies, T, P):
    """Standard chemical potential J/kmol at (T, P) — PDSS_HKFT::deltaG
    + m_Mu0_tr_pr, fully differentiable in (T, P)."""
    global _ZY_CACHE
    if _ZY_CACHE is None:
        _ZY_CACHE = _z_y_ref()
    Z_ref, Y_ref = _ZY_CACHE
    T = jnp.asarray(T, jnp.float64)
    P = jnp.asarray(P, jnp.float64)
    pbar = P * 1e-5
    sterm = -sp.s0 * (T - T_R)
    c1term = -sp.c1 * (T * jnp.log(T / T_R) - (T - T_R))
    a1term = sp.a1 * (pbar - P_R_BAR)
    a2term = sp.a2 * jnp.log((PSI_BAR + pbar) / (PSI_BAR + P_R_BAR))
    c2term = -sp.c2 * ((1.0 / (T - THETA) - 1.0 / (T_R - THETA))
                       * (THETA - T) / THETA
                       - T / (THETA * THETA)
                       * jnp.log((T_R * (T - THETA))
                                 / (T * (T_R - THETA))))
    a3term = sp.a3 / (T - THETA) * (pbar - P_R_BAR)
    a4term = sp.a4 / (T - THETA) * jnp.log(
        (PSI_BAR + pbar) / (PSI_BAR + P_R_BAR))
    if sp.charge == 0.0:
        omega_j = sp.omega
    else:
        r_ref = sp.charge ** 2 / (sp.omega / NU + sp.charge / 3.082)
        gval = g_star(T, P)
        r_e = r_ref + jnp.abs(sp.charge) * gval
        omega_j = NU * (sp.charge ** 2 / r_e
                        - sp.charge / (3.082 + gval))
    Z = -1.0 / rel_epsilon(T, P)
    wterm = -omega_j * (Z + 1.0)
    wrterm = sp.omega * (Z_ref + 1.0)
    yterm = sp.omega * Y_ref * (T - T_R)
    dg_cal = (sterm + c1term + a1term + a2term + c2term + a3term + a4term
              + wterm + wrterm + yterm)
    return sp.mu0_tr_pr + dg_cal * CAL


def _omega_j(sp: HKFTSpecies, T, P):
    if sp.charge == 0.0:
        return jnp.asarray(sp.omega)
    r_ref = sp.charge ** 2 / (sp.omega / NU + sp.charge / 3.082)
    gval = g_star(T, P)
    r_e = r_ref + jnp.abs(sp.charge) * gval
    return NU * (sp.charge ** 2 / r_e - sp.charge / (3.082 + gval))


def standard_state(sp: HKFTSpecies, T, P):
    """(mu0, V0, S0, H0) at (T, P) via autodiff of mu0.

    H0 additionally carries the reference's `otrterm`
    (PDSS_HKFT::deltaH: -T domega/dT|ref (Z_ref+1)) — a term its
    hand-derived enthalpy includes but its deltaG does not generate
    under the Gibbs-Helmholtz relation (deltaG holds omega_ref
    constant). Reproduced so the blessed partial-molar enthalpies
    match at their 2 J/kmol tolerance."""
    global _ZY_CACHE
    if _ZY_CACHE is None:
        _ZY_CACHE = _z_y_ref()
    Z_ref, _ = _ZY_CACHE
    T = jnp.asarray(T, jnp.float64)
    P = jnp.asarray(P, jnp.float64)
    g = mu0(sp, T, P)
    V = jax.grad(lambda p: mu0(sp, T, p))(P)
    S = -jax.grad(lambda t: mu0(sp, t, P))(T)
    H = g + T * S
    if sp.charge != 0.0:
        domega_ref = jax.grad(
            lambda t: _omega_j(sp, t, jnp.asarray(101325.0, jnp.float64))
        )(jnp.asarray(T_R, jnp.float64))
        H = H - T * domega_ref * (Z_ref + 1.0) * CAL
    return g, V, S, H
