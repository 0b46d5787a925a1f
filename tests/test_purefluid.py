"""Pure-fluid (tpx) real-fluid phases vs the reference's blessed values.

Oracles: thermoFromYaml.cpp PureFluid_nitrogen / PureFluid_CO2.
The reference's EXPECT_NEAR tolerances (1e-6 absolute) are bit-level
regression bounds against its own arithmetic; the independent
evaluation here (autodiffed coefficient derivatives, tightly converged
Maxwell construction) agrees to ~2e-8 relative, asserted at that level.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end tier; smoke = -m 'not slow and not isolated'
import yaml

from g4s_tpu.models.cantera import purefluid as pf

YAML = "/root/reference/cantera/test/data/thermo-models.yaml"


@pytest.fixture(scope="module")
def n2_phase():
    d = yaml.safe_load(open(YAML))
    sp = next(s for s in d["species"] if s["name"] == "N2")
    return pf.PureFluid(pf.NITROGEN, sp["thermo"]["data"][0])


class TestNitrogen:
    def test_liquid_density_70K(self, n2_phase):
        rho, _ = n2_phase.set_TP(70.0, 2 * 101325.0)
        assert rho == pytest.approx(841.0420151, abs=1e-6)

    def test_gibbs_70K(self, n2_phase):
        rho, _ = n2_phase.set_TP(70.0, 2 * 101325.0)
        p = n2_phase.props(70.0, rho)
        assert p["g_mole"] == pytest.approx(-17654454.0912211, abs=1e-3)

    def test_gas_branch_ideal_limit(self, n2_phase):
        # dilute gas approaches ideal: rho ~ P M / RT
        T, P = 300.0, 1e4
        rho, _ = n2_phase.set_TP(T, P)
        assert rho == pytest.approx(
            P * pf.NITROGEN.M / (pf.GAS_CONSTANT * T), rel=1e-3)


class TestCarbonDioxide:
    def test_two_phase_density(self):
        ph = pf.PureFluid(pf.CARBON_DIOXIDE)
        rho, psat = ph.set_TX(275.0, 0.1)
        assert rho == pytest.approx(513.27928388, abs=1e-4)
        # saturation pressure of CO2 at 275 K ~ 36.6 bar (NIST ~36.55)
        assert psat == pytest.approx(3.659e6, rel=1e-3)

    def test_maxwell_equal_gibbs(self):
        sub = pf.CARBON_DIOXIDE
        psat, rho_f, rho_v = pf.update_sat(sub, 275.0)
        gf = float(pf.g_mass(sub, rho_f, 275.0))
        gv = float(pf.g_mass(sub, rho_v, 275.0))
        assert gf == pytest.approx(gv, abs=1e-2)
        # both branches reproduce the saturation pressure
        assert float(pf.pressure(sub, rho_f, 275.0)) == pytest.approx(
            psat, rel=1e-10)
        assert float(pf.pressure(sub, rho_v, 275.0)) == pytest.approx(
            psat, rel=1e-10)

    def test_quality_interpolation(self):
        ph = pf.PureFluid(pf.CARBON_DIOXIDE)
        rho0, _ = ph.set_TX(275.0, 0.0)
        rho1, _ = ph.set_TX(275.0, 1.0)
        psat, rho_f, rho_v = pf.update_sat(pf.CARBON_DIOXIDE, 275.0)
        assert rho0 == pytest.approx(rho_f, rel=1e-12)
        assert rho1 == pytest.approx(rho_v, rel=1e-12)


class TestThermoConsistency:
    @pytest.mark.parametrize("sub,T,rho", [
        (pf.NITROGEN, 90.0, 750.0), (pf.CARBON_DIOXIDE, 280.0, 900.0)])
    def test_du_drho_consistency(self, sub, T, rho):
        """du/dv|_T = T dP/dT|_v - P (exact for any consistent EoS;
        holds here because u and s come from the same C_i integrals)."""
        import jax
        import jax.numpy as jnp
        T = jnp.float64(T)
        rho = jnp.float64(rho)
        du_drho = jax.grad(lambda r: pf.u_mass(sub, r, T))(rho)
        dP_dT = jax.grad(lambda t: pf.pressure(sub, rho, t))(T)
        P = pf.pressure(sub, rho, T)
        # du/dv = -rho^2 du/drho
        lhs = -float(rho) ** 2 * float(du_drho)
        rhs = float(T * dP_dT - P)
        assert lhs == pytest.approx(rhs, rel=1e-9)
