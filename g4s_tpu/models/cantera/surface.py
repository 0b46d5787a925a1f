"""Surface phases + interface kinetics (heterogeneous catalysis).

Reference: cantera/src/thermo/SurfPhase.cpp (ideal 2-D adsorbate solution:
coverages theta on a fixed site density, standard state = full occupancy)
and cantera/src/kinetics/InterfaceKinetics.cpp (reactions coupling a gas
phase to surface species; sticking-coefficient rates, coverage-dependent
activation, explicit reaction orders). The benchmark mechanisms are the
bundled Deutschmann Pt mechanisms (data/ptcombust.yaml,
methane_pox_on_pt.yaml).

TPU-first: the whole interface ROP is one masked all-reaction evaluation
(like the gas kinetics), and coverage relaxation runs through the same
JAX BDF integrator the reactors use. Gas species resolve against an
existing gas `Mechanism` (the cross-file `gri30.yaml/species` reference
in the phase definition), surface species index separately.

Units: YAML files in (cm, mol) convert to SI exactly as
InterfaceKinetics::convert does — gas concentrations mol/m^3, surface
concentrations mol/m^2, rates mol/m^2/s.
"""

from __future__ import annotations

import re
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.mech import (Mechanism, P_REF, R_GAS, _yaml_load)
from g4s_tpu.models.cantera.thermo import h0_RT as gas_h0_RT
from g4s_tpu.models.cantera.thermo import s0_R as gas_s0_R

_CAL2J = 4.184
_COEF_SPECIES = re.compile(r"^(\d+\.?\d*)\s+(.+)$")


class SurfacePhase(NamedTuple):
    """Ideal surface solution (SurfPhase)."""
    name: str
    species_names: tuple
    site_density: float          # Gamma, mol/m^2 (SI)
    sizes: np.ndarray            # sites per adsorbate (n,)
    nasa_low: np.ndarray         # (n, 7)
    nasa_high: np.ndarray
    t_mid: np.ndarray

    @property
    def nspec(self) -> int:
        return len(self.species_names)

    def species_index(self, name: str) -> int:
        return self.species_names.index(name)

    def h0_RT(self, T):
        lo, hi = jnp.asarray(self.nasa_low), jnp.asarray(self.nasa_high)
        c = jnp.where((T < jnp.asarray(self.t_mid))[:, None], lo, hi)
        return (c[:, 0] + c[:, 1] * T / 2 + c[:, 2] * T ** 2 / 3
                + c[:, 3] * T ** 3 / 4 + c[:, 4] * T ** 4 / 5 + c[:, 5] / T)

    def s0_R(self, T):
        lo, hi = jnp.asarray(self.nasa_low), jnp.asarray(self.nasa_high)
        c = jnp.where((T < jnp.asarray(self.t_mid))[:, None], lo, hi)
        return (c[:, 0] * jnp.log(T) + c[:, 1] * T + c[:, 2] * T ** 2 / 2
                + c[:, 3] * T ** 3 / 3 + c[:, 4] * T ** 4 / 4 + c[:, 6])

    def concentrations(self, theta):
        """c_k = theta_k * Gamma / size_k (SurfPhase::getConcentrations)."""
        return theta * self.site_density / jnp.asarray(self.sizes)


class InterfaceKinetics(NamedTuple):
    """Device arrays for all interface reactions (built once)."""
    surf: SurfacePhase
    nrxn: int
    nu_reac_g: jnp.ndarray       # (nrxn, ngas)
    nu_prod_g: jnp.ndarray
    nu_reac_s: jnp.ndarray       # (nrxn, nsurf)
    nu_prod_s: jnp.ndarray
    ord_g: jnp.ndarray           # reaction orders (defaults = nu_reac)
    ord_s: jnp.ndarray
    arr: jnp.ndarray             # (nrxn, 3) A (SI), b, Ea (J/mol)
    is_sticking: jnp.ndarray     # bool
    stick_W: jnp.ndarray         # molecular weight of the sticking gas sp.
    stick_m: jnp.ndarray         # total surface-site reaction order
    cov_a: jnp.ndarray           # (nrxn, nsurf) 10^(a theta) modifier
    cov_m: jnp.ndarray           # theta^m modifier
    cov_E: jnp.ndarray           # exp(-E theta / RT) modifier (J/mol)
    reversible: jnp.ndarray


def _parse_side_two(side: str, gas_idx: Dict[str, int], ngas: int,
                    surf_idx: Dict[str, int], nsurf: int):
    nu_g = np.zeros(ngas)
    nu_s = np.zeros(nsurf)
    for term in side.strip().split(" + "):
        term = term.strip()
        if not term:
            continue
        m = _COEF_SPECIES.match(term)
        coef, name = (float(m.group(1)), m.group(2).strip()) if m \
            else (1.0, term)
        if name in surf_idx:
            nu_s[surf_idx[name]] += coef
        elif name in gas_idx:
            nu_g[gas_idx[name]] += coef
        else:
            raise KeyError(f"unknown species {name!r} in {side!r}")
    return nu_g, nu_s


def load_interface(path, gas: Mechanism, *, phase_name: Optional[str] = None
                   ) -> InterfaceKinetics:
    """Build the interface from a YAML file's ideal-surface phase.

    `gas` supplies the adjacent gas phase (the cross-file species
    reference in e.g. ptcombust.yaml's gas phase resolves to gri30)."""
    doc = _yaml_load(path)
    phase = None
    for p in doc.get("phases", []):
        th = str(p.get("thermo", "")).lower()
        if th == "ideal-surface" and (phase_name is None
                                      or p.get("name") == phase_name):
            phase = p
            break
    if phase is None:
        raise KeyError(f"no ideal-surface phase in {path}")

    units = doc.get("units", {})
    length_u = units.get("length", "m")
    qty_u = units.get("quantity", "mol")
    ea_u = units.get("activation-energy", "J/mol")
    ea_factor = {"cal/mol": _CAL2J, "kcal/mol": _CAL2J * 1e3, "J/mol": 1.0,
                 "kJ/mol": 1e3, "K": R_GAS}[ea_u]
    len_factor = {"cm": 1e-2, "m": 1.0}[length_u]
    qty_factor = {"mol": 1.0, "kmol": 1e3}[qty_u]
    # site density in file units (qty/length^2) -> mol/m^2
    gamma = float(phase["site-density"]) * qty_factor / len_factor ** 2
    # concentration units for rate conversion
    cg_unit = qty_factor / len_factor ** 3       # gas conc unit in mol/m^3
    cs_unit = qty_factor / len_factor ** 2       # surf conc unit in mol/m^2

    names = list(phase["species"])
    by_name = {s["name"]: s for s in doc.get("species", [])}
    n = len(names)
    nasa_low = np.zeros((n, 7))
    nasa_high = np.zeros((n, 7))
    t_mid = np.full(n, 1000.0)
    sizes = np.ones(n)
    for i, nm in enumerate(names):
        sp = by_name[nm]
        sizes[i] = float(sp.get("sites", 1.0))
        th = sp["thermo"]
        tr = th["temperature-ranges"]
        data = th["data"]
        if len(data) == 1:
            nasa_low[i] = nasa_high[i] = data[0]
            t_mid[i] = tr[-1]
        else:
            nasa_low[i], nasa_high[i] = data[0], data[1]
            t_mid[i] = tr[1]
    surf = SurfacePhase(phase.get("name", "surface"), tuple(names), gamma,
                        sizes, nasa_low, nasa_high, t_mid)

    gas_idx = {s: i for i, s in enumerate(gas.species_names)}
    surf_idx = {s: i for i, s in enumerate(names)}
    rxns = doc.get("reactions", [])
    nr = len(rxns)
    ngas = gas.nspec
    nu_rg = np.zeros((nr, ngas))
    nu_pg = np.zeros((nr, ngas))
    nu_rs = np.zeros((nr, n))
    nu_ps = np.zeros((nr, n))
    ordg = np.zeros((nr, ngas))
    ords = np.zeros((nr, n))
    arr = np.zeros((nr, 3))
    sticking = np.zeros(nr, bool)
    stick_W = np.ones(nr)
    stick_m = np.zeros(nr)
    cov_a = np.zeros((nr, n))
    cov_m = np.zeros((nr, n))
    cov_E = np.zeros((nr, n))
    reversible = np.zeros(nr, bool)

    for k, rx in enumerate(rxns):
        eq = rx["equation"]
        if "<=>" in eq:
            lhs, rhs = eq.split("<=>")
            reversible[k] = True
        elif "=>" in eq:
            lhs, rhs = eq.split("=>")
        else:
            lhs, rhs = eq.split("=")
            reversible[k] = True
        nu_rg[k], nu_rs[k] = _parse_side_two(lhs, gas_idx, ngas,
                                             surf_idx, n)
        nu_pg[k], nu_ps[k] = _parse_side_two(rhs, gas_idx, ngas,
                                             surf_idx, n)
        ordg[k], ords[k] = nu_rg[k].copy(), nu_rs[k].copy()
        for nm, o in (rx.get("orders") or {}).items():
            if nm in surf_idx:
                ords[k, surf_idx[nm]] = float(o)
            else:
                ordg[k, gas_idx[nm]] = float(o)
        for nm, cd in (rx.get("coverage-dependencies") or {}).items():
            j = surf_idx[nm]
            cov_a[k, j] = float(cd.get("a", 0.0))
            cov_m[k, j] = float(cd.get("m", 0.0))
            cov_E[k, j] = float(cd.get("E", 0.0)) * ea_factor
        if "sticking-coefficient" in rx:
            sticking[k] = True
            rc = rx["sticking-coefficient"]
            arr[k] = [float(rc["A"]), float(rc.get("b", 0.0)),
                      float(rc.get("Ea", 0.0)) * ea_factor]
            # the (single) gas reactant supplies the thermal flux term
            gi = int(np.argmax(nu_rg[k]))
            stick_W[k] = gas.mol_weights[gi]
            stick_m[k] = float((ords[k] * 1.0).sum())
        else:
            rc = rx["rate-constant"]
            # A in file units (length, qty): rate_SI = A_file *
            # cg_unit^(1-sum og) ... exact conversion:
            # A_SI = A_file * cs_unit * cg_unit^(-og) * cs_unit^(-os+... )
            og = float(ordg[k].sum())
            os_ = float(ords[k].sum())
            # rate in file units: mol/len^2/s; SI target mol/m^2/s
            A = float(rc["A"]) * cs_unit * cg_unit ** (-og) \
                * cs_unit ** (-os_)
            arr[k] = [A, float(rc.get("b", 0.0)),
                      float(rc.get("Ea", 0.0)) * ea_factor]

    to = jnp.asarray
    return InterfaceKinetics(
        surf, nr, to(nu_rg), to(nu_pg), to(nu_rs), to(nu_ps),
        to(ordg), to(ords), to(arr), to(sticking), to(stick_W),
        to(stick_m), to(cov_a), to(cov_m), to(cov_E), to(reversible))


_LOG_FLOOR = 1e-300


def forward_rate_constants_interface(ik: InterfaceKinetics, gas: Mechanism,
                                     T, theta):
    """kf for every interface reaction (InterfaceKinetics::updateROP):
    Arrhenius or sticking-coefficient form, times the coverage
    modifiers 10^(a theta) theta^m exp(-E theta/RT)."""
    logT = jnp.log(T)
    A, b, Ea = ik.arr[:, 0], ik.arr[:, 1], ik.arr[:, 2]
    k_arr = A * jnp.exp(b * logT - Ea / (R_GAS * T))
    # sticking: kf = gamma_stick / Gamma_tot^m * sqrt(RT / 2 pi W)
    gam_stick = jnp.clip(k_arr, 0.0, 1.0)
    flux = jnp.sqrt(R_GAS * T / (2.0 * jnp.pi * ik.stick_W))
    k_stick = gam_stick * flux / ik.surf.site_density ** ik.stick_m
    kf = jnp.where(ik.is_sticking, k_stick, k_arr)
    # coverage dependence
    lg10 = jnp.log(10.0)
    mod = jnp.exp(jnp.sum(ik.cov_a * theta[None, :] * lg10, axis=1)
                  - jnp.sum(ik.cov_E * theta[None, :], axis=1) / (R_GAS * T))
    theta_m = jnp.exp(jnp.sum(
        ik.cov_m * jnp.log(jnp.maximum(theta, _LOG_FLOOR))[None, :], axis=1))
    return kf * mod * theta_m


def rates_of_progress_interface(ik: InterfaceKinetics, gas: Mechanism,
                                T, conc_gas, theta):
    """(rop_f, rop_r) in mol/m^2/s."""
    kf = forward_rate_constants_interface(ik, gas, T, theta)
    cs = ik.surf.concentrations(jnp.maximum(theta, 0.0))
    logcg = jnp.log(jnp.maximum(conc_gas, _LOG_FLOOR))
    logcs = jnp.log(jnp.maximum(cs, _LOG_FLOOR))
    rop_f = kf * jnp.exp(ik.ord_g @ logcg + ik.ord_s @ logcs)
    # equilibrium: delta G0 over gas + surface; standard concentrations
    # P0/RT (gas) and Gamma/size (surface)
    g_g = gas_h0_RT(gas, T) - gas_s0_R(gas, T)
    g_s = ik.surf.h0_RT(T) - ik.surf.s0_R(T)
    dnu_g = ik.nu_prod_g - ik.nu_reac_g
    dnu_s = ik.nu_prod_s - ik.nu_reac_s
    dG_RT = dnu_g @ g_g + dnu_s @ g_s
    c0_g = P_REF / (R_GAS * T)
    c0_s = jnp.asarray(ik.surf.site_density / ik.surf.sizes)
    logKc = -dG_RT - jnp.sum(dnu_g, axis=1) * jnp.log(1.0 / c0_g) \
        - dnu_s @ jnp.log(1.0 / c0_s)
    # note: Kc = exp(-dG0/RT) * prod c0^dnu  ->  logKc = -dG0/RT + sum dnu log c0
    kr = jnp.where(ik.reversible, kf / jnp.exp(logKc), 0.0)
    rop_r = kr * jnp.exp(ik.nu_prod_g @ logcg + ik.nu_prod_s @ logcs)
    return rop_f, rop_r


def net_production_rates_interface(ik: InterfaceKinetics, gas: Mechanism,
                                   T, conc_gas, theta):
    """(sdot_gas mol/m^3-facing mol/m^2/s, dtheta_dt 1/s).

    Site conservation holds by construction: sum_k size_k * nu_net_s[k]
    is zero for every reaction in a valid mechanism, so
    sum(dtheta) = 0."""
    rop_f, rop_r = rates_of_progress_interface(ik, gas, T, conc_gas, theta)
    rop = rop_f - rop_r
    sdot_gas = rop @ (ik.nu_prod_g - ik.nu_reac_g)        # mol/m^2/s
    sdot_surf = rop @ (ik.nu_prod_s - ik.nu_reac_s)       # mol/m^2/s
    dtheta = sdot_surf * jnp.asarray(ik.surf.sizes) / ik.surf.site_density
    return sdot_gas, dtheta


def advance_coverages(ik: InterfaceKinetics, gas: Mechanism, T, conc_gas,
                      theta0, t_end, *, rtol=1e-7, atol=1e-12):
    """Integrate the coverage ODE at fixed gas state
    (InterfaceKinetics::advanceCoverages)."""
    from g4s_tpu.ops.odeint import bdf_solve

    def rhs(t, th):
        _, dth = net_production_rates_interface(ik, gas, T, conc_gas,
                                                jnp.clip(th, 0.0, 1.0))
        return dth

    res = bdf_solve(rhs, jnp.asarray(theta0), 0.0, t_end, rtol=rtol,
                    atol=atol, max_steps=100000)
    th = jnp.clip(res.y, 0.0, 1.0)
    return th / jnp.sum(th), res
