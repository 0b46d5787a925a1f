"""IAPWS-95 real-water equation of state (WaterPropsIAPWS role).

The reference carries a hand-differentiated Helmholtz implementation
(cantera/src/thermo/WaterPropsIAPWS{,phi}.cpp) behind WaterSSTP /
PDSS_Water standard states. The TPU-native rebuild writes the
dimensionless Helmholtz energy phi(tau, delta) = phi0 + phir ONCE and
lets jax.grad produce every property derivative — no hand-coded
phiR_d/phiR_dd/... family.

Coefficients are the published IAPWS-95 release constants (Wagner &
Pruss 2002), including the two tiny triple-point anchoring corrections
Cantera applies to n0_1, n0_2 so that u = s = 0 for liquid water at the
triple point — kept so our reference-state offsets match the
reference's PDSS_Water exactly.

Units follow the reference: Rgas = 8.314371e3 J/kmol/K (the value in
the IAPWS release), M = 18.015268 kg/kmol, T_c = 647.096 K,
rho_c = 322 kg/m^3.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

T_C = 647.096
RHO_C = 322.0
RGAS = 8.314371e3          # J / kmol / K (IAPWS release value)
M_WATER = 18.015268        # kg / kmol
ONE_ATM = 101325.0

_NI0 = np.array([
    0.0, -8.320446483749715, 6.683210527593232,
    3.00632, 0.012436, 0.97315,
    1.2795, 0.96956, 0.24873,
])

_GAMMA0 = np.array([
    0.0, 0.0, 0.0,
    0.0, 1.28728967, 3.53734222,
    7.74073708, 9.24437796, 27.5075105,
])

_NI = np.array([
    0.0, 0.012533547935523, 7.8957634722828,
    -8.7803203303561, 0.31802509345418, -0.26145533859358,
    -0.0078199751687981, 0.0088089493102134, -0.66856572307965,
    0.20433810950965, -6.6212605039687e-05, -0.19232721156002,
    -0.25709043003438, 0.16074868486251, -0.040092828925807,
    3.9343422603254e-07, -7.5941377088144e-06, 0.00056250979351888,
    -1.5608652257135e-05, 1.1537996422951e-09, 3.6582165144204e-07,
    -1.3251180074668e-12, -6.2639586912454e-10, -0.10793600908932,
    0.017611491008752, 0.22132295167546, -0.40247669763528,
    0.58083399985759, 0.0049969146990806, -0.031358700712549,
    -0.74315929710341, 0.4780732991548, 0.020527940895948,
    -0.13636435110343, 0.014180634400617, 0.0083326504880713,
    -0.029052336009585, 0.038615085574206, -0.020393486513704,
    -0.0016554050063734, 0.0019955571979541, 0.00015870308324157,
    -1.638856834253e-05, 0.043613615723811, 0.034994005463765,
    -0.076788197844621, 0.022446277332006, -6.2689710414685e-05,
    -5.5711118565645e-10, -0.19905718354408, 0.31777497330738,
    -0.11841182425981, -31.306260323435, 31.546140237781,
    -2521.3154341695, -0.14874640856724, 0.31806110878444,
])

_DI = np.array([
    0, 1, 1, 1, 2, 2, 3, 4, 1, 1,
    1, 2, 2, 3, 4, 4, 5, 7, 9, 10,
    11, 13, 15, 1, 2, 2, 2, 3, 4, 4,
    4, 5, 6, 6, 7, 9, 9, 9, 9, 9,
    10, 10, 12, 3, 4, 4, 5, 14, 3, 6,
    6, 6, 3, 3, 3,
])

_TI_1_7 = np.array([
    0.0, -0.5, 0.875, 1.0,
    0.5, 0.75, 0.375, 1.0,
])

_TIR = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 4, 6,
    12, 1, 5, 4, 2, 13, 9, 3, 4, 11,
    4, 13, 1, 7, 1, 9, 10, 10, 3, 7,
    10, 10, 6, 10, 10, 1, 2, 3, 4, 8,
    6, 9, 8, 16, 22, 23, 23, 10, 50, 44,
    46, 50, 0, 1, 4,
])

_CIR = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 3, 3, 3, 4, 6, 6,
    6, 6, 0, 0, 0, 0,
])

_ALPHA = np.array([
    20.0, 20.0, 20.0,
])

_BETA = np.array([
    150.0, 150.0, 250.0,
])

_GAMMA = np.array([
    1.21, 1.21, 1.25,
])

_EPS = np.array([
    1.0, 1.0, 1.0,
])

_A56 = np.array([
    3.5, 3.5,
])

_B56 = np.array([
    0.85, 0.95,
])

_BB = np.array([
    0.2, 0.2,
])

_CC = np.array([
    28.0, 32.0,
])

_DD = np.array([
    700.0, 800.0,
])

_AA = np.array([
    0.32, 0.32,
])

_BBETA = np.array([
    0.3, 0.3,
])


def _phi0(tau, delta):
    v = jnp.log(delta) + _NI0[1] + _NI0[2] * tau + _NI0[3] * jnp.log(tau)
    return v + jnp.sum(_NI0[4:9]
                       * jnp.log(1.0 - jnp.exp(-_GAMMA0[4:9] * tau)))


def _phir(tau, delta):
    # terms 1-7 (pure polynomial; fractional tau exponents)
    v = jnp.sum(_NI[1:8] * delta ** _DI[1:8].astype(jnp.float64)
                * tau ** _TI_1_7[1:8])
    # terms 8-51 (polynomial * exp(-delta^c)), fully vectorized
    v = v + jnp.sum(_NI[8:52] * delta ** _DI[8:52].astype(jnp.float64)
                    * tau ** _TIR[8:52].astype(jnp.float64)
                    * jnp.exp(-delta ** _CIR[8:52].astype(jnp.float64)))
    # terms 52-54 (Gaussian)
    v = v + jnp.sum(_NI[52:55] * delta ** _DI[52:55].astype(jnp.float64)
                    * tau ** _TIR[52:55].astype(jnp.float64)
                    * jnp.exp(-_ALPHA * (delta - _EPS) ** 2
                              - _BETA * (tau - _GAMMA) ** 2))
    # terms 55-56 (critical-region)
    dm1sq = (delta - 1.0) ** 2 + 1e-300
    theta = (1.0 - tau) + _AA * dm1sq ** (0.5 / _BBETA)
    Delta = theta ** 2 + _BB * dm1sq ** _A56
    psi = jnp.exp(-_CC * dm1sq - _DD * (tau - 1.0) ** 2)
    return v + jnp.sum(_NI[55:57] * Delta ** _B56 * delta * psi)


def _phi(tau, delta):
    return _phi0(tau, delta) + _phir(tau, delta)


_phir_d = jax.grad(_phir, argnums=1)
_phi_t = jax.grad(_phi, argnums=0)
_phir_t = jax.grad(_phir, argnums=0)


@jax.jit
def pressure(T, rho):
    """p(T, rho) [Pa]: p = rho R T (1 + delta phir_d) / M."""
    tau = T_C / T
    delta = rho / RHO_C
    return rho * RGAS * T / M_WATER * (1.0 + delta * _phir_d(tau, delta))


def _dp_drho(T, rho):
    return jax.grad(lambda r: pressure(T, r))(rho)


WATER_GAS = 0
WATER_LIQUID = 1


@partial(jax.jit, static_argnames=("phase",))
def density(T, P, phase=WATER_LIQUID, rho_guess=None):
    """Invert p(T, rho) = P by Newton (the m_sub.density role).

    phase picks the starting branch: liquid starts near 1000 kg/m^3,
    gas from the ideal-gas estimate."""
    T = jnp.asarray(T, jnp.float64)
    P = jnp.asarray(P, jnp.float64)
    if rho_guess is None:
        rho0 = (jnp.asarray(1000.0, jnp.float64) if phase == WATER_LIQUID
                else P * M_WATER / (RGAS * T))
    else:
        rho0 = jnp.asarray(rho_guess, jnp.float64)

    def body(i, rho):
        f = pressure(T, rho) - P
        df = _dp_drho(T, rho)
        step = f / df
        # damped to stay on the branch
        step = jnp.clip(step, -0.2 * rho, 0.2 * rho)
        return rho - step

    return jax.lax.fori_loop(0, 60, body, rho0)


@jax.jit
def helmholtz_mole(T, rho):
    """A [J/kmol]."""
    tau = T_C / T
    return RGAS * T * _phi(tau, rho / RHO_C)


@jax.jit
def entropy_mole(T, rho):
    """s [J/kmol/K]: s/R = tau phi_tau - phi."""
    tau = T_C / T
    delta = rho / RHO_C
    return RGAS * (tau * _phi_t(tau, delta) - _phi(tau, delta))


@jax.jit
def enthalpy_mole(T, rho):
    """h [J/kmol]: h/RT = 1 + tau phi_tau|0+r + delta phir_d."""
    tau = T_C / T
    delta = rho / RHO_C
    return RGAS * T * (1.0 + tau * _phi_t(tau, delta)
                       + delta * _phir_d(tau, delta))


def gibbs_mole(T, rho):
    return helmholtz_mole(T, rho) + pressure(T, rho) * M_WATER / rho


def isothermal_compressibility(T, rho):
    return 1.0 / (rho * _dp_drho(T, rho))


def thermal_expansion_coeff(T, rho):
    """alpha = -(1/rho)(drho/dT)_P."""
    dpdT = jax.grad(lambda Tv: pressure(Tv, rho))(jnp.asarray(T, jnp.float64))
    return dpdT / (rho * _dp_drho(T, rho))


class WaterStandardState:
    """PDSS_Water-equivalent: liquid-water-IAPWS95 standard state.

    Anchors the ideal-gas reference exactly as the reference does
    (PDSS_Water.cpp:28-50): at 298.15 K the gas branch at 0.01 Pa is
    offset so s(1 bar basis) = 188.835e3 J/kmol/K and
    h = -241.826e6 J/kmol.
    """

    # anchoring constants, precomputed once by _compute_offsets() below
    # (running the gas-branch Newton + property evals costs minutes of
    # XLA compile; the values are deterministic and verified by
    # tests/test_cantera.py::TestWaterIAPWS::test_offsets_reproduce)
    EW_OFFSET = -287728568.2492926      # J/kmol
    SW_OFFSET = 63307.076228570104      # J/kmol/K

    def __init__(self):
        self.EW_Offset = self.EW_OFFSET
        self.SW_Offset = self.SW_OFFSET

    @staticmethod
    def _compute_offsets():
        T0 = 298.15
        presLow = 1e-2
        rho_gas = float(density(T0, presLow, WATER_GAS, rho_guess=1e-9))
        s = float(entropy_mole(T0, rho_gas)) \
            - 8.31446261815324e3 * np.log(1e5 / presLow)
        h = float(enthalpy_mole(T0, rho_gas))
        return -241.826e6 - h, 188.835e3 - s

    def mu0(self, T, P=ONE_ATM):
        """Standard chemical potential of liquid water [J/kmol]."""
        rho = density(T, P, WATER_LIQUID)
        h = enthalpy_mole(T, rho) + self.EW_Offset
        s = entropy_mole(T, rho) + self.SW_Offset
        return h - T * s

    def density(self, T, P=ONE_ATM):
        return density(T, P, WATER_LIQUID)
