"""PlasmaPhase: electron energy distributions and two-temperature rates.

Reference: src/thermo/PlasmaPhase.cpp, kinetics/TwoTempPlasmaRate.h, on
the reference's own test input (test/data/oxygen-plasma.yaml). The
reference test suite only round-trips these phases through YAML, so the
oracles here are the model's own exact identities (normalization, mean
energy <-> Te, the x=1 Maxwellian limit) plus the rate closed form.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from g4s_tpu.models.cantera import plasma

YAML = "/root/reference/cantera/test/data/oxygen-plasma.yaml"


class TestIsotropic:
    @pytest.fixture(scope="class")
    def ph(self):
        return plasma.load_plasma(YAML, "isotropic-electron-energy-plasma")

    def test_electron_temperature(self, ph):
        # Te = 2/3 * 1 eV * e/kB = 7736.8 K
        want = 2.0 / 3.0 * 1.602176634e-19 / 1.380649e-23
        assert ph.Te == pytest.approx(want, rel=1e-12)

    def test_species_and_electron_index(self, ph):
        assert ph.names == ("E", "O2", "O2-")
        assert ph.electron_index == 0

    def test_maxwellian_limit_normalization(self):
        # x = 1 on a dense grid: the EEDF normalizes to 2/3 int f deps^1.5 = 1
        # and reproduces its own mean energy
        lv = jnp.linspace(0.0, 25.0, 20001)
        f = plasma.isotropic_dist(lv, 1.3, 1.0)
        norm = 2.0 / 3.0 * plasma._quad_d(f, lv ** 1.5)
        assert float(norm) == pytest.approx(1.0, abs=2e-4)
        em = plasma.mean_electron_energy(lv, f)
        assert float(em) == pytest.approx(1.3, rel=1e-3)

    def test_druyvesteyn_mean_energy(self):
        # the x = 2 shape used by the reference phase: self-consistent em
        lv = jnp.linspace(0.0, 12.0, 20001)
        f = plasma.isotropic_dist(lv, 1.0, 2.0)
        assert float(plasma.mean_electron_energy(lv, f)) == pytest.approx(
            1.0, rel=1e-4)

    def test_electron_thermo_at_Te(self, ph):
        # E has constant-cp thermo: h(Te) = h0 + cp0 (Te - T0)
        h = float(ph.enthalpy_mole(300.0, np.array([1.0, 0.0, 0.0])))
        s = ph.species[0]
        T0, h0, s0, cp0 = s.coeffs[0]
        assert h == pytest.approx(h0 + cp0 * (ph.Te - T0), rel=1e-12)
        # heavy species stay at the gas temperature
        h_o2 = float(ph.enthalpy_mole(300.0, np.array([0.0, 1.0, 0.0])))
        assert h_o2 == pytest.approx(float(ph.species[1].h0(300.0)),
                                     rel=1e-12)


class TestDiscretized:
    @pytest.fixture(scope="class")
    def ph(self):
        return plasma.load_plasma(YAML,
                                  "discretized-electron-energy-plasma")

    def test_unnormalized_kept(self, ph):
        # the file sets normalize: False -> distribution taken verbatim
        np.testing.assert_allclose(np.asarray(ph.dist),
                                   [0.0, 0.2, 0.7, 0.01])

    def test_te_from_distribution(self, ph):
        em = 2.0 / 5.0 * float(plasma._quad_d(
            ph.levels ** 0 * ph.dist, ph.levels ** 2.5))
        assert ph.Te == pytest.approx(
            float(plasma.electron_temp_from_energy(em)), rel=1e-12)

    def test_normalization_helper(self):
        lv = jnp.asarray([0.0, 0.1, 1.0, 10.0])
        f = plasma.normalize_dist(lv, jnp.asarray([0.0, 0.2, 0.7, 0.01]))
        norm = 2.0 / 3.0 * float(plasma._quad_d(f, lv ** 1.5))
        assert norm == pytest.approx(1.0, rel=1e-12)


class TestTwoTempRate:
    def test_equal_temperature_reduces_to_arrhenius(self):
        # Te = T: k = A Te^b exp(-Ea_g/T)
        k = float(plasma.two_temp_plasma_rate(
            4.2e-27, -1.0, 600.0, 700.0, 1000.0, 1000.0))
        assert k == pytest.approx(
            4.2e-27 * 1000.0 ** -1.0 * np.exp(-600.0 / 1000.0), rel=1e-12)

    def test_reference_form(self):
        # the oxygen-plasma.yaml reaction at T=500, Te=7736.8
        A, b, eg, ee = 4.2e-27, -1.0, 600.0, 700.0
        T, Te = 500.0, 7736.8
        k = float(plasma.two_temp_plasma_rate(A, b, eg, ee, T, Te))
        want = A * np.exp(b * np.log(Te) - eg / T
                          + ee * (Te - T) / (Te * T))
        assert k == pytest.approx(want, rel=1e-12)
        # hotter electrons accelerate the (positive-Ea_e) channel
        k2 = float(plasma.two_temp_plasma_rate(A, b, eg, ee, T, 2 * Te))
        assert k2 * 2 > k  # b=-1 prefactor halves, exp term more than...
