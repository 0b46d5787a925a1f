"""Gas thermodynamics: NASA7 ideal-gas properties + Redlich-Kwong real gas.

Reference capability: cantera/src/thermo — IdealGasPhase + the NASA7
species polynomials (NasaPoly2), and RedlichKwongMFTP (cubic EoS with
quadratic mixing rules; the G4S-modified hot loop GraphProcess1/2 at
RedlichKwongMFTP.cpp:917-1034 computes a_mix = sum_ij x_i x_j sqrt(a_i a_j);
updateMixingExpressions:985).

All functions are pure jnp over (T, concentrations) and differentiate,
which is what the implicit reactor integrator needs for its Jacobians.

Units: mol-SI (mol, m^3, J, K); R = 8.314462618.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from g4s_tpu.models.cantera.mech import Mechanism, R_GAS


def _nasa_select(mech: Mechanism, T):
    """Per-species NASA7 coefficients for temperature T (piecewise Tmid)."""
    lowT = T < jnp.asarray(mech.t_mid)
    return jnp.where(lowT[:, None], jnp.asarray(mech.nasa_low),
                     jnp.asarray(mech.nasa_high))


def _nasa9_select(mech: Mechanism, T):
    """Per-species 9-coefficient region for temperature T
    (Nasa9PolyMultiTempRegion.cpp: pick the region whose [Tlo, Thi)
    brackets T; clamped at the ends)."""
    bounds = jnp.asarray(mech.nasa9_T)          # (nspec, R+1)
    R = mech.nasa9_c.shape[1]
    idx = jnp.clip(jnp.sum(T >= bounds[:, 1:-1], axis=1), 0, R - 1)
    return jnp.take_along_axis(jnp.asarray(mech.nasa9_c),
                               idx[:, None, None], axis=1)[:, 0, :]


def _nasa9_cp(a, T):
    # cp0/R = a0 T^-2 + a1/T + a2 + a3 T + a4 T^2 + a5 T^3 + a6 T^4
    # (Nasa9Poly1.cpp:14-40)
    return (a[:, 0] / (T * T) + a[:, 1] / T + a[:, 2]
            + T * (a[:, 3] + T * (a[:, 4] + T * (a[:, 5] + T * a[:, 6]))))


def _nasa9_h(a, T):
    return (-a[:, 0] / (T * T) + a[:, 1] * jnp.log(T) / T + a[:, 2]
            + T * (a[:, 3] / 2 + T * (a[:, 4] / 3
                   + T * (a[:, 5] / 4 + T * a[:, 6] / 5)))
            + a[:, 7] / T)


def _nasa9_s(a, T):
    return (-a[:, 0] / (2 * T * T) - a[:, 1] / T
            + a[:, 2] * jnp.log(T)
            + T * (a[:, 3] + T * (a[:, 4] / 2
                   + T * (a[:, 5] / 3 + T * a[:, 6] / 4)))
            + a[:, 8])


def _shomate_select(mech: Mechanism, T):
    bounds = jnp.asarray(mech.shomate_T)
    R = mech.shomate_c.shape[1]
    idx = jnp.clip(jnp.sum(T >= bounds[:, 1:-1], axis=1), 0, R - 1)
    return jnp.take_along_axis(jnp.asarray(mech.shomate_c),
                               idx[:, None, None], axis=1)[:, 0, :]


def _shomate_cp(a, T):
    # NIST Shomate, t=T/1000, cp in J/mol/K (ShomatePoly2.h)
    t = T / 1000.0
    cp = (a[:, 0] + t * (a[:, 1] + t * (a[:, 2] + t * a[:, 3]))
          + a[:, 4] / (t * t))
    return cp / R_GAS


def _shomate_h(a, T):
    t = T / 1000.0
    h = (a[:, 0] * t + a[:, 1] * t * t / 2 + a[:, 2] * t ** 3 / 3
         + a[:, 3] * t ** 4 / 4 - a[:, 4] / t + a[:, 5]) * 1000.0
    return h / (R_GAS * T)


def _shomate_s(a, T):
    t = T / 1000.0
    s = (a[:, 0] * jnp.log(t) + a[:, 1] * t + a[:, 2] * t * t / 2
         + a[:, 3] * t ** 3 / 3 - a[:, 4] / (2 * t * t) + a[:, 6])
    return s / R_GAS


def _blend9(mech, v7, f9, fsh, T):
    if mech.is_nasa9 is not None:
        a9 = _nasa9_select(mech, T)
        v7 = jnp.where(jnp.asarray(mech.is_nasa9), f9(a9, T), v7)
    if mech.is_shomate is not None:
        ash = _shomate_select(mech, T)
        v7 = jnp.where(jnp.asarray(mech.is_shomate), fsh(ash, T), v7)
    return v7


def cp0_R(mech: Mechanism, T):
    a = _nasa_select(mech, T)
    v = a[:, 0] + T * (a[:, 1] + T * (a[:, 2] + T * (a[:, 3] + T * a[:, 4])))
    return _blend9(mech, v, _nasa9_cp, _shomate_cp, T)


def h0_RT(mech: Mechanism, T):
    a = _nasa_select(mech, T)
    v = (a[:, 0] + T * (a[:, 1] / 2 + T * (a[:, 2] / 3
         + T * (a[:, 3] / 4 + T * a[:, 4] / 5))) + a[:, 5] / T)
    return _blend9(mech, v, _nasa9_h, _shomate_h, T)


def s0_R(mech: Mechanism, T):
    a = _nasa_select(mech, T)
    v = (a[:, 0] * jnp.log(T) + T * (a[:, 1] + T * (a[:, 2] / 2
         + T * (a[:, 3] / 3 + T * a[:, 4] / 4))) + a[:, 6])
    return _blend9(mech, v, _nasa9_s, _shomate_s, T)


def u0_RT(mech: Mechanism, T):
    return h0_RT(mech, T) - 1.0


# ---------------- Redlich-Kwong real gas ----------------
#
# P = R T / (v - b) - a(T) / (sqrt(T) v (v + b))
# a_mix = sum_ij x_i x_j sqrt(a_i(T) a_j(T)),  b_mix = sum_i x_i b_i
# (RedlichKwongMFTP::updateMixingExpressions; the ij double sum is the
#  engine reduction GraphProcess1 parallelizes in the reference)


def rk_a_species(mech: Mechanism, T):
    a = jnp.asarray(mech.rk_a)
    return jnp.maximum(a[:, 0] + a[:, 1] * T, 0.0)


def rk_mix(mech: Mechanism, T, x):
    """a_mix(T), b_mix for mole fractions x. The quadratic mixing rule is
    evaluated as (sum_i x_i sqrt(a_i))^2 — exactly sum_ij x_i x_j
    sqrt(a_i a_j) for the geometric-mean combining rule the reference uses,
    with O(K) work instead of the O(K^2) vertex loop."""
    sa = jnp.sqrt(rk_a_species(mech, T))
    a_mix = jnp.square(jnp.sum(x * sa))
    b_mix = jnp.sum(x * jnp.asarray(mech.rk_b))
    return a_mix, b_mix


def rk_pressure(mech: Mechanism, T, molar_volume, x):
    a, b = rk_mix(mech, T, x)
    v = molar_volume
    return R_GAS * T / (v - b) - a / (jnp.sqrt(T) * v * (v + b))


def rk_molar_volume(mech: Mechanism, T, P, x, *, iters: int = 60):
    """Solve the cubic for the gas-phase molar volume (largest real root)
    by safeguarded Newton from the ideal-gas start."""
    a, b = rk_mix(mech, T, x)

    def f(v):
        return R_GAS * T / (v - b) - a / (jnp.sqrt(T) * v * (v + b)) - P

    v0 = R_GAS * T / P

    def body(i, v):
        fv = f(v)
        dfv = jax.grad(f)(v)
        step = fv / dfv
        v_new = v - step
        return jnp.where(v_new > b, v_new, 0.5 * (v + b))

    return jax.lax.fori_loop(0, iters, body, v0)


def rk_departures(mech: Mechanism, T, molar_volume, x):
    """(u - u_ig, cv - cv_ig) per mole of mixture for the RK EoS.

    For P = RT/(v-b) - a(T)/(sqrt(T) v (v+b)):
      u_dep = -(1/b) * (a/sqrt(T) - T d(a/sqrt(T))/dT) * ln((v+b)/v)
            = -(3 a0 / (2 sqrt(T)) + ... ) handled by autodiff below.
    We form alpha(T) = a(T)/sqrt(T) and use
      u_dep = (T alpha'(T) - alpha(T)) / b * ln(v/(v+b)) ... sign folded in,
      cv_dep = T alpha''(T) / b * ln(v/(v+b))
    with alpha' / alpha'' from jax.grad — no hand-derived formulas needed.
    """
    v = molar_volume

    def alpha(t):
        am, _ = rk_mix(mech, t, x)
        return am / jnp.sqrt(t)

    b = jnp.sum(x * jnp.asarray(mech.rk_b))
    dalpha = jax.grad(alpha)(T)
    d2alpha = jax.grad(jax.grad(alpha))(T)
    log_term = jnp.log(v / (v + b)) / b
    u_dep = (alpha(T) - T * dalpha) * log_term
    cv_dep = -T * d2alpha * log_term
    return u_dep, cv_dep


# ---------------- Peng-Robinson real gas ----------------
#
# P = R T / (v - b) - a alpha(T) / (v^2 + 2 b v - b^2)
# alpha_i = (1 + kappa_i (1 - sqrt(T/Tc_i)))^2
# (PengRobinson.cpp; same autodiff-departure pattern as RK above)

_SQRT2 = 1.4142135623730951


def pr_a_alpha_species(mech: Mechanism, T):
    Tr = T / jnp.asarray(mech.pr_Tc)
    alpha = jnp.square(1.0 + jnp.asarray(mech.pr_kappa)
                       * (1.0 - jnp.sqrt(Tr)))
    return jnp.asarray(mech.pr_a) * alpha


def pr_mix(mech: Mechanism, T, x):
    """Geometric-mean combining rule, O(K) form (cf. rk_mix)."""
    sa = jnp.sqrt(jnp.maximum(pr_a_alpha_species(mech, T), 0.0))
    a_mix = jnp.square(jnp.sum(x * sa))
    b_mix = jnp.sum(x * jnp.asarray(mech.pr_b))
    return a_mix, b_mix


def pr_pressure(mech: Mechanism, T, molar_volume, x):
    a, b = pr_mix(mech, T, x)
    v = molar_volume
    return R_GAS * T / (v - b) - a / (v * v + 2.0 * b * v - b * b)


def pr_molar_volume(mech: Mechanism, T, P, x, *, iters: int = 60):
    a, b = pr_mix(mech, T, x)

    def f(v):
        return (R_GAS * T / (v - b)
                - a / (v * v + 2.0 * b * v - b * b) - P)

    def body(i, v):
        v_new = v - f(v) / jax.grad(f)(v)
        return jnp.where(v_new > b, v_new, 0.5 * (v + b))

    return jax.lax.fori_loop(0, iters, body, R_GAS * T / P)


def pr_departures(mech: Mechanism, T, molar_volume, x):
    """(u_dep, cv_dep) per mole for PR:
      u_dep = (T a'(T) - a(T)) L,  cv_dep = T a''(T) L,
      L = ln((v+(1+s)b)/(v+(1-s)b)) / (2 s b),  s = sqrt(2)."""
    v = molar_volume

    def a_of_T(t):
        am, _ = pr_mix(mech, t, x)
        return am

    b = jnp.sum(x * jnp.asarray(mech.pr_b))
    da = jax.grad(a_of_T)(T)
    d2a = jax.grad(jax.grad(a_of_T))(T)
    L = jnp.log((v + (1.0 + _SQRT2) * b)
                / (v + (1.0 - _SQRT2) * b)) / (2.0 * _SQRT2 * b)
    return (T * da - a_of_T(T)) * L, T * d2a * L


class GasState:
    """Convenience wrapper: mixture properties from (T, concentrations).

    conc: (nspec,) mol/m^3. All methods are jit/differentiation safe.
    """

    def __init__(self, mech: Mechanism, real_gas: bool = False):
        self.mech = mech
        model = getattr(mech, "eos_model", "ideal")
        if model == "peng-robinson":
            self.real_gas = real_gas and bool((mech.pr_b != 0).any())
        else:
            self.real_gas = real_gas and bool((mech.rk_b != 0).any())
        self._is_pr = self.real_gas and model == "peng-robinson"
        self.W = jnp.asarray(mech.mol_weights)

    def _eos_pressure(self, T, v, x):
        return (pr_pressure if self._is_pr else rk_pressure)(
            self.mech, T, v, x)

    def _eos_departures(self, T, v, x):
        return (pr_departures if self._is_pr else rk_departures)(
            self.mech, T, v, x)

    def density(self, conc):
        return jnp.sum(conc * self.W)

    def mole_fractions(self, conc):
        return conc / jnp.sum(conc)

    def pressure(self, T, conc):
        ctot = jnp.sum(conc)
        if not self.real_gas:
            return ctot * R_GAS * T
        return self._eos_pressure(T, 1.0 / ctot, self.mole_fractions(conc))

    def cv_mole(self, T, conc):
        """Mixture molar cv (J/mol/K)."""
        x = self.mole_fractions(conc)
        cv_ig = jnp.sum(x * (cp0_R(self.mech, T) - 1.0)) * R_GAS
        if not self.real_gas:
            return cv_ig
        _, cv_dep = self._eos_departures(T, 1.0 / jnp.sum(conc), x)
        return cv_ig + cv_dep

    def partial_molar_int_energy(self, T, conc):
        """u_k (J/mol). Real-gas: ideal per-species + mixture departure
        attributed via d(n u_dep)/dn_k at constant T, V (autodiff)."""
        u_ig = u0_RT(self.mech, T) * R_GAS * T
        if not self.real_gas:
            return u_ig

        def U_dep_total(c):
            ntot = jnp.sum(c)
            x = c / ntot
            u_dep, _ = self._eos_departures(T, 1.0 / ntot, x)
            return ntot * u_dep   # per unit volume

        return u_ig + jax.grad(U_dep_total)(conc)
