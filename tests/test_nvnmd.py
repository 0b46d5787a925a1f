"""NVNMD: quantized hardware-deployment pipeline.

Covers the roles of the reference's test_nvnmd_* suite
(deepmd/source/tests/test_nvnmd_entrypoints.py etc.): the tanh4/qf/qr
primitives, the CNN->QNN quantization gap, the mapt piecewise tables,
the wrap fixed-point round trip, and two-stage training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end tier; smoke = -m 'not slow and not isolated'

from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
from g4s_tpu.models.deepmd.nvnmd import (NvnmdSpec, build_map,
                                         init_nvnmd_params, load_wrapped,
                                         nvnmd_energy_force,
                                         nvnmd_map_energy,
                                         nvnmd_map_energy_force,
                                         nvnmd_total_energy, qf, qr, tanh4,
                                         train_two_stage, wrap_model)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def small_spec():
    return NvnmdSpec(
        DescriptorSpec(rcut=3.0, rcut_smth=0.5, sel=(6, 10), ntypes=2),
        embed_neurons=(4, 8, 16), axis_neuron=4, fit_neurons=(16, 16))


def frame(rng, natoms=16, L=6.0):
    types = np.sort(rng.integers(0, 2, natoms)).astype(np.int32)
    coord = rng.uniform(0, L, (natoms, 3))
    return jnp.asarray(coord), jnp.asarray(np.eye(3) * L), jnp.asarray(types)


class TestPrimitives:
    def test_tanh4_formula(self):
        # sign(x)(|x|^4/16 - |x|^3/4 + |x|) on [-2,2]
        # (nvnmd/utils/network.py:80-88)
        for x in (0.0, 0.5, 1.0, 1.7, -0.9):
            a = abs(x)
            want = np.sign(x) * (a ** 4 / 16 - a ** 3 / 4 + a)
            assert abs(float(tanh4(x)) - want) < 1e-14

    def test_tanh4_saturation(self):
        # clips at |x|=2 with value 1 and zero slope
        assert float(tanh4(2.0)) == pytest.approx(1.0)
        assert float(tanh4(5.0)) == pytest.approx(1.0)
        assert float(tanh4(-5.0)) == pytest.approx(-1.0)
        assert float(jax.grad(tanh4)(0.0)) == pytest.approx(1.0)
        assert abs(float(jax.grad(tanh4)(1.999))) < 2e-3

    def test_qf_qr_values_and_ste(self):
        x = jnp.asarray(0.123456789)
        assert float(qf(x, 8)) == np.floor(0.123456789 * 256) / 256
        assert float(qr(x, 8)) == np.round(0.123456789 * 256) / 256
        # straight-through: derivative is exactly 1
        assert float(jax.grad(lambda v: qf(v, 8))(x)) == 1.0
        assert float(jax.grad(lambda v: qr(v, 8))(x)) == 1.0


class TestForward:
    def test_qnn_close_to_cnn(self, rng):
        spec = small_spec()
        params = init_nvnmd_params(jax.random.PRNGKey(0), spec)
        coords, box, types = frame(rng)
        e_cnn = float(nvnmd_total_energy(params, spec, coords, box, types,
                                         stage="cnn"))
        e_qnn = float(nvnmd_total_energy(params, spec, coords, box, types,
                                         stage="qnn"))
        # 23 fractional bits on data, 18 on weights: sub-1e-3 energy gap
        assert abs(e_qnn - e_cnn) < 1e-3 * max(1.0, abs(e_cnn))

    def test_forces_are_gradient_and_sum_zero(self, rng):
        spec = small_spec()
        params = init_nvnmd_params(jax.random.PRNGKey(1), spec)
        coords, box, types = frame(rng)
        e, f = nvnmd_energy_force(params, spec, coords, box, types,
                                  stage="cnn")
        assert np.asarray(jnp.abs(jnp.sum(f, axis=0))).max() < 1e-8
        # finite difference check on one coordinate
        h = 1e-5
        dp = coords.at[3, 1].add(h)
        dm = coords.at[3, 1].add(-h)
        fd = -(float(nvnmd_total_energy(params, spec, dp, box, types))
               - float(nvnmd_total_energy(params, spec, dm, box, types))) \
            / (2 * h)
        assert abs(fd - float(f[3, 1])) < 1e-5 * max(1.0, abs(fd))


class TestMapTables:
    def test_table_matches_direct_qnn(self, rng):
        """The mapt path (lookups only) reproduces the QNN net path."""
        spec = small_spec()
        params = init_nvnmd_params(jax.random.PRNGKey(2), spec)
        tables = build_map(params, spec)
        coords, box, types = frame(rng)
        e_qnn = float(nvnmd_total_energy(params, spec, coords, box, types,
                                         stage="qnn"))
        e_map = float(nvnmd_map_energy(params, spec, tables, coords, box,
                                       types))
        # table is a cubic interpolant of the exact net: small gap
        assert abs(e_map - e_qnn) < 5e-3 * max(1.0, abs(e_qnn))

    def test_map_forces_match_direct(self, rng):
        spec = small_spec()
        params = init_nvnmd_params(jax.random.PRNGKey(3), spec)
        tables = build_map(params, spec)
        coords, box, types = frame(rng)
        _, f_net = nvnmd_energy_force(params, spec, coords, box, types,
                                      stage="cnn")
        _, f_map = nvnmd_map_energy_force(params, spec, tables, coords,
                                          box, types)
        scale = float(jnp.max(jnp.abs(f_net))) + 1e-12
        assert float(jnp.max(jnp.abs(f_map - f_net))) / scale < 2e-2

    def test_pad_slots_are_silent(self, rng):
        """u=0 sentinel knot: pad slots contribute the same constant in
        both paths and no force."""
        spec = small_spec()
        params = init_nvnmd_params(jax.random.PRNGKey(4), spec)
        params["stats"]["avg"] = jnp.asarray([0.3, 0.1])
        params["stats"]["std_s"] = jnp.asarray([0.7, 1.2])
        tables = build_map(params, spec)
        # 3 atoms in a huge box: nearly all slots padded
        coords = jnp.asarray([[0., 0., 0.], [1.5, 0., 0.], [0., 1.6, 0.]])
        box = jnp.asarray(np.eye(3) * 50.0)
        types = jnp.asarray([0, 0, 1], jnp.int32)
        e_qnn = float(nvnmd_total_energy(params, spec, coords, box, types,
                                         stage="qnn"))
        e_map = float(nvnmd_map_energy(params, spec, tables, coords, box,
                                       types))
        assert abs(e_map - e_qnn) < 5e-3 * max(1.0, abs(e_qnn))
        _, f_map = nvnmd_map_energy_force(params, spec, tables, coords,
                                          box, types)
        assert np.all(np.isfinite(np.asarray(f_map)))


class TestWrap:
    def test_wrap_roundtrip_bit_exact(self, tmp_path, rng):
        spec = small_spec()
        params = init_nvnmd_params(jax.random.PRNGKey(5), spec)
        tables = build_map(params, spec)
        path = str(tmp_path / "nvnmd_model.npz")
        wrap_model(params, spec, tables, path)
        p2, spec2, t2 = load_wrapped(path)
        assert spec2.descriptor.sel == spec.descriptor.sel
        coords, box, types = frame(rng)
        e1 = float(nvnmd_map_energy(params, spec, tables, coords, box,
                                    types))
        e2 = float(nvnmd_map_energy(p2, spec2, t2, coords, box, types))
        # weights/tables quantized at save: reload is exact vs the
        # quantized artifact, and near the pre-wrap model
        e1b = float(nvnmd_map_energy(p2, spec2, t2, coords, box, types))
        assert e2 == e1b
        assert abs(e2 - e1) < 5e-3 * max(1.0, abs(e1))


class TestTrain:
    def test_two_stage_loss_decreases(self, rng):
        spec = small_spec()
        params = init_nvnmd_params(jax.random.PRNGKey(6), spec)
        # synthetic labels from a perturbed teacher
        teacher = init_nvnmd_params(jax.random.PRNGKey(42), spec)
        frames = []
        for _ in range(2):
            coords, box, types = frame(rng)
            e, f = nvnmd_energy_force(teacher, spec, coords, box, types)
            frames.append((coords, box, types, e, f))
        params, lc, lq = train_two_stage(params, spec, frames, lr=2e-4,
                                         steps_cnn=25, steps_qnn=15)
        assert lc[-1] < lc[0]
        assert lq[-1] <= lq[0] * 1.05   # QAT refines without divergence
        assert np.isfinite(lq[-1])
