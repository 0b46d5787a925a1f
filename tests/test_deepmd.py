"""DeePMD workload: descriptor vs brute-force oracle, model symmetries,
training step, freeze roundtrip, DP sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from g4s_tpu.models.deepmd import (
    DescriptorSpec, ModelSpec, init_params, total_energy,
    energy_force_virial, Trainer, LossConfig, LRConfig, freeze, load_frozen,
)
from g4s_tpu.models.deepmd.descriptor import env_mat, switch_fn, compute_stats


def tiny_spec():
    return ModelSpec(DescriptorSpec(rcut=3.0, rcut_smth=0.5, sel=(6, 10),
                                    ntypes=2),
                     embed_neurons=(4, 8, 16), axis_neuron=4,
                     fit_neurons=(16, 16))


def random_frame(rng, natoms=20, L=7.0):
    types = np.sort(rng.integers(0, 2, natoms)).astype(np.int32)
    coord = rng.uniform(0, L, (natoms, 3))
    box = np.eye(3) * L
    return jnp.asarray(coord), jnp.asarray(box), jnp.asarray(types)


class TestDescriptor:
    def test_switch_endpoints(self):
        assert float(switch_fn(jnp.asarray(0.3), 0.5, 3.0)) == 1.0
        assert float(switch_fn(jnp.asarray(3.5), 0.5, 3.0)) == 0.0
        mid = float(switch_fn(jnp.asarray(1.75), 0.5, 3.0))
        assert 0.0 < mid < 1.0
        # C2 smooth at rmax: value ~ 0
        assert abs(float(switch_fn(jnp.asarray(2.999), 0.5, 3.0))) < 1e-5

    def test_neighbor_counts_match_bruteforce(self, rng):
        coord, box, types = random_frame(rng)
        spec = tiny_spec().descriptor
        R, nlist = env_mat(coord, box, types, spec)
        c, b = np.asarray(coord), np.asarray(box)
        d = c[None] - c[:, None]
        f = d @ np.linalg.inv(b)
        f -= np.round(f)
        d = f @ b
        r = np.linalg.norm(d, axis=-1) + 1e10 * np.eye(c.shape[0])
        expected = (r < spec.rcut).sum(axis=1)
        got = (np.asarray(R)[..., 0] > 0).sum(axis=1)
        np.testing.assert_array_equal(got, expected)

    def test_env_mat_radial_row(self, rng):
        """First component is s(r); vector part has norm s(r)."""
        coord, box, types = random_frame(rng)
        spec = tiny_spec().descriptor
        R = np.asarray(env_mat(coord, box, types, spec)[0])
        s = R[..., 0]
        vec = np.linalg.norm(R[..., 1:], axis=-1)
        np.testing.assert_allclose(vec, s, rtol=1e-10)

    def test_stats_shapes(self, rng):
        coord, box, types = random_frame(rng)
        spec = tiny_spec().descriptor
        R = env_mat(coord, box, types, spec)[0]
        davg, dstd = compute_stats([R], [np.asarray(types)], 2, spec.nnei)
        assert davg.shape == (2, spec.nnei, 4)
        assert (dstd > 0).all()
        assert np.allclose(davg[:, :, 1:], 0)


class TestModel:
    def test_translation_invariance(self, rng):
        spec = tiny_spec()
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(0), spec)
        e1 = float(total_energy(params, spec, coord, box, types))
        e2 = float(total_energy(params, spec, coord + 1.234, box, types))
        assert abs(e1 - e2) < 1e-8 * max(abs(e1), 1)

    def test_permutation_invariance(self, rng):
        spec = tiny_spec()
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(0), spec)
        e1 = float(total_energy(params, spec, coord, box, types))
        # permute atoms within a type group
        perm = np.arange(coord.shape[0])
        t = np.asarray(types)
        idx0 = np.where(t == 0)[0]
        perm[idx0] = idx0[::-1]
        e2 = float(total_energy(params, spec, coord[perm], box, types[perm]))
        assert abs(e1 - e2) < 1e-8 * max(abs(e1), 1)

    def test_force_is_gradient(self, rng):
        spec = tiny_spec()
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(0), spec)
        e, f, v = energy_force_virial(params, spec, coord, box, types)
        # directional derivative vs jvp-free finite difference
        rngd = np.random.default_rng(0)
        direction = rngd.normal(size=coord.shape)
        direction /= np.linalg.norm(direction)
        eps = 1e-6
        ep = float(total_energy(params, spec, coord + eps * direction, box, types))
        em = float(total_energy(params, spec, coord - eps * direction, box, types))
        fd = (ep - em) / (2 * eps)
        analytic = -float(jnp.vdot(f, jnp.asarray(direction)))
        assert abs(fd - analytic) < 1e-5 * max(abs(fd), 1e-3)

    def test_forces_sum_to_zero(self, rng):
        """Translation invariance => zero net force."""
        spec = tiny_spec()
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(0), spec)
        _, f, _ = energy_force_virial(params, spec, coord, box, types)
        np.testing.assert_allclose(np.asarray(f).sum(axis=0), 0, atol=1e-8)


class TestTraining:
    pytestmark = pytest.mark.slow
    def _fake_data(self, rng):
        class FakeData:
            def __init__(self):
                self.calls = 0

            def sample_batch(inner):
                coord = rng.uniform(0, 7.0, (2, 20, 3))
                types = np.sort(rng.integers(0, 2, 20)).astype(np.int32)
                return dict(types=types, coord=coord,
                            box=np.tile(np.eye(3) * 7.0, (2, 1, 1)),
                            energy=rng.normal(size=2),
                            force=rng.normal(size=(2, 20, 3)))
        return FakeData()

    def test_loss_decreases_on_fixed_batch(self, rng):
        spec = tiny_spec()
        params = init_params(jax.random.PRNGKey(0), spec)
        tr = Trainer(spec, LossConfig(start_pref_f=1.0, limit_pref_f=1.0,
                                      start_pref_e=1.0, limit_pref_e=1.0),
                     LRConfig(start_lr=1e-3, stop_lr=1e-3, numb_steps=100))
        batch = self._fake_data(rng).sample_batch()
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        opt_state = tr.init(params)
        losses = []
        for i in range(15):
            params, opt_state, loss, aux = tr._update(
                params, opt_state, batch, jnp.asarray(float(i)))
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_lr_schedule(self):
        lr = LRConfig(start_lr=1e-3, stop_lr=1e-5, decay_steps=10,
                      numb_steps=100)
        assert abs(lr.lr_at(0) - 1e-3) < 1e-12
        assert abs(lr.lr_at(100) - 1e-5) < 1e-8


class TestFreeze:
    def test_freeze_roundtrip(self, tmp_path, rng):
        spec = tiny_spec()
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(3), spec)
        p = tmp_path / "frozen.npz"
        freeze(params, spec, p)
        params2, spec2 = load_frozen(p)
        assert spec2 == spec
        e1 = float(total_energy(params, spec, coord, box, types))
        e2 = float(total_energy(params2, spec2, coord, box, types))
        assert abs(e1 - e2) < 1e-12 * max(abs(e1), 1)


class TestDataParallel:
    def test_dp_train_step_8dev(self, rng):
        import optax
        from jax.sharding import Mesh
        from g4s_tpu.models.deepmd.train import make_dp_train_step
        spec = tiny_spec()
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        params = init_params(jax.random.PRNGKey(0), spec)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        lr = LRConfig(numb_steps=10, decay_steps=5)
        step_fn, shardings = make_dp_train_step(spec, LossConfig(), lr, opt,
                                                mesh)
        types = np.sort(rng.integers(0, 2, 20)).astype(np.int32)
        batch = dict(
            coord=jnp.asarray(rng.uniform(0, 7, (8, 20, 3))),
            box=jnp.asarray(np.tile(np.eye(3) * 7.0, (8, 1, 1))),
            energy=jnp.asarray(rng.normal(size=8)),
            force=jnp.asarray(rng.normal(size=(8, 20, 3))),
            types=jnp.asarray(types))
        batch = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
        params2, opt_state, loss, aux = step_fn(params, opt_state, batch,
                                                jnp.asarray(0.0))
        assert np.isfinite(float(loss))
        # parameters actually updated
        d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   params, params2)
        assert max(jax.tree_util.tree_leaves(d)) > 0


class TestCompress:
    pytestmark = pytest.mark.slow
    def test_compressed_equivalence(self, rng):
        """Compressed (tabulated) model matches the exact MLP — the
        model-compression equivalence test of the reference
        (source/tests/test_model_compression_se_a.py)."""
        from g4s_tpu.models.deepmd.compress import (
            compress_model, energy_force_compressed, total_energy_compressed)
        spec = tiny_spec()
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(0), spec)
        cm = compress_model(params, spec, stride=0.005)
        e0 = float(total_energy(params, spec, coord, box, types))
        e1 = float(total_energy_compressed(cm, coord, box, types))
        assert abs(e1 - e0) < 1e-8 * abs(e0)
        _, f0, _ = energy_force_virial(params, spec, coord, box, types)
        _, f1 = energy_force_compressed(cm, coord, box, types)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-7)


class TestMD:
    pytestmark = pytest.mark.slow
    def test_lammps_data_reader(self):
        from g4s_tpu.models.deepmd.md import read_lammps_data
        c, t, b = read_lammps_data(
            "/root/reference/deepmd/examples/water/lmp/water.lmp")
        assert c.shape == (192, 3)
        assert (np.bincount(t) == [64, 128]).all()
        np.testing.assert_allclose(np.diag(b), 12.4447)

    def test_nvt_conserves_temperature(self, rng):
        """NVT on a harmonic-ish potential stays near the target T."""
        from g4s_tpu.models.deepmd.md import NVTIntegrator, init_velocities
        n = 32
        masses = np.full(n, 16.0)
        box = np.eye(3) * 10.0
        x0 = rng.uniform(0, 10, (n, 3))
        anchors = jnp.asarray(x0)

        def force(x):
            d = x - anchors               # harmonic wells, min-image
            d = d - 10.0 * jnp.round(d / 10.0)
            return -0.5 * d

        integ = NVTIntegrator(force, masses, box, T0=300.0, tdamp=0.1,
                              dt=0.002)
        v0 = init_velocities(rng, masses, 300.0)
        assert abs(float(integ.temperature(jnp.asarray(v0))) - 300.0) < 1e-6
        state, f = None, None
        from g4s_tpu.models.deepmd.md import MDState
        st = MDState(jnp.asarray(x0), jnp.asarray(v0), jnp.zeros(3),
                     jnp.asarray(0, jnp.int32))
        fc = force(st.x)
        Ts = []
        for i in range(800):
            st, fc = integ._step(st, fc)
            if i % 50 == 49:
                Ts.append(float(integ.temperature(st.v)))
        # long-run mean near target (small systems oscillate)
        assert 150.0 < np.mean(Ts[4:]) < 600.0


class TestInferAPI:
    def test_deeppot_eval_and_model_devi(self, tmp_path, rng):
        from g4s_tpu.models.deepmd.infer import DeepPot, calc_model_devi
        spec = tiny_spec()
        coord, box, types = random_frame(rng)
        paths = []
        for seed in (1, 2):
            p = init_params(jax.random.PRNGKey(seed), spec)
            path = tmp_path / f"m{seed}.npz"
            freeze(p, spec, path)
            paths.append(path)
        pots = [DeepPot(p) for p in paths]
        e, f, v = pots[0].eval(coord, box, types)
        assert np.isfinite(float(e))
        assert f.shape == coord.shape
        # batch eval
        eb, fb, vb = pots[0].eval(jnp.stack([coord, coord]),
                                  jnp.stack([box, box]), types)
        assert eb.shape == (2,)
        np.testing.assert_allclose(float(eb[0]), float(e), rtol=1e-10)
        mx, mn, avg = calc_model_devi(pots, coord, box, types)
        assert mx[0] >= avg[0] >= mn[0] >= 0

    def test_se_r_descriptor(self, rng):
        spec = ModelSpec(DescriptorSpec(3.0, 0.5, (6, 10), 2), (4, 8, 16),
                         4, (16, 16), descriptor_type="se_e2_r")
        assert spec.descriptor_dim == 16
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(0), spec)
        e, f, v = energy_force_virial(params, spec, coord, box, types)
        assert np.isfinite(float(e)) and np.isfinite(np.asarray(f)).all()
        # rotation invariance of the radial descriptor (energy only)
        th = 0.3
        Rz = jnp.asarray([[np.cos(th), -np.sin(th), 0],
                          [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        e2 = float(jnp.asarray(
            __import__("g4s_tpu.models.deepmd.model", fromlist=["total_energy"])
            .total_energy(params, spec, coord @ Rz.T, box @ Rz.T, types)))
        assert abs(e2 - float(e)) < 1e-8 * max(abs(float(e)), 1)


class TestSeAtten:
    def _spec(self):
        return ModelSpec(DescriptorSpec(3.0, 0.5, (6, 10), 2), (4, 8, 16),
                         4, (16, 16), descriptor_type="se_atten",
                         attn_layers=2, tebd_dim=4)

    def test_invariances(self, rng):
        spec = self._spec()
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(0), spec)
        e = float(total_energy(params, spec, coord, box, types))
        assert np.isfinite(e)
        # translation
        e2 = float(total_energy(params, spec, coord + 0.77, box, types))
        assert abs(e2 - e) < 1e-8 * max(abs(e), 1)
        # rotation (box rotates too)
        th = 0.4
        Rz = jnp.asarray([[np.cos(th), -np.sin(th), 0],
                          [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        e3 = float(total_energy(params, spec, coord @ Rz.T, box @ Rz.T,
                                types))
        assert abs(e3 - e) < 1e-7 * max(abs(e), 1)

    def test_forces_and_training_grad(self, rng):
        spec = self._spec()
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(1), spec)
        e, f, v = energy_force_virial(params, spec, coord, box, types)
        np.testing.assert_allclose(np.asarray(f).sum(axis=0), 0, atol=1e-8)
        # params differentiable (training path)
        g = jax.grad(lambda p: total_energy(p, spec, coord, box, types))(
            params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert max(float(jnp.abs(l).max()) for l in leaves) > 0


class TestNeighborInfra:
    def test_celllist_matches_bruteforce(self, rng):
        from g4s_tpu.models.deepmd.descriptor import (env_mat,
                                                      env_mat_celllist)
        n, L = 200, 14.0
        coord = jnp.asarray(rng.uniform(0, L, (n, 3)))
        box = jnp.asarray(np.eye(3) * L)
        types = jnp.asarray(np.sort(rng.integers(0, 2, n)).astype(np.int32))
        spec = DescriptorSpec(3.5, 0.5, (12, 20), 2)
        R1, nl1 = env_mat(coord, box, types, spec)
        R2, nl2 = env_mat_celllist(coord, box, types, spec, max_per_cell=32)
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2),
                                   atol=1e-12)
        assert (np.sort(np.asarray(nl1), axis=1)
                == np.sort(np.asarray(nl2), axis=1)).all()

    def test_neighbor_stat_suggests_sane_sel(self, rng):
        from g4s_tpu.models.deepmd.descriptor import neighbor_stat
        n, L = 150, 12.0
        coord = rng.uniform(0, L, (n, 3))
        types = np.sort(rng.integers(0, 2, n)).astype(np.int32)
        mx, sel = neighbor_stat([coord], [np.eye(3) * L], types, 3.0, 2)
        assert all(s >= m for s, m in zip(sel, mx))
        assert all(s % 4 == 0 for s in sel)


class TestSeTAndHybrid:
    """DescrptSeT (se_t.py:617 _filter) and DescrptHybrid parity:
    per-type-pair angular embedding / sub-descriptor concatenation."""

    def _setup(self, dt):
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        from g4s_tpu.models.deepmd.model import ModelSpec, init_params
        dspec = DescriptorSpec(rcut=6.0, rcut_smth=0.5, sel=(12, 24),
                               ntypes=2)
        spec = ModelSpec(descriptor=dspec, embed_neurons=(8, 16),
                         axis_neuron=4, fit_neurons=(24, 24),
                         descriptor_type=dt)
        params = init_params(jax.random.PRNGKey(0), spec)
        rng = np.random.default_rng(0)
        n = 24
        coords = jnp.asarray(rng.uniform(0, 8.0, (n, 3)))
        box = jnp.asarray(np.diag([8.0, 8.0, 8.0]).astype(float))
        types = jnp.asarray((np.arange(n) % 3 == 0).astype(np.int32))
        return spec, params, coords, box, types

    @pytest.mark.parametrize("dt", ["se_t", "hybrid"])
    def test_forces_match_fd_and_invariance(self, dt):
        from g4s_tpu.models.deepmd.model import (energy_force_virial,
                                                 total_energy)
        spec, params, coords, box, types = self._setup(dt)
        e, F, W = energy_force_virial(params, spec, coords, box, types)
        eps = 1e-6
        f_num = -(total_energy(params, spec, coords.at[5, 1].add(eps),
                               box, types)
                  - total_energy(params, spec, coords.at[5, 1].add(-eps),
                                 box, types)) / (2 * eps)
        assert abs(float(F[5, 1] - f_num)) < 1e-6 * max(
            abs(float(f_num)), 1e-8)
        assert float(jnp.max(jnp.abs(W - W.T))) < 1e-12
        e2 = total_energy(params, spec, coords + 1.234, box, types)
        assert abs(float(e2 - e)) < 1e-10

    def test_hybrid_dim_is_sum(self):
        spec, params, coords, box, types = self._setup("hybrid")
        from g4s_tpu.models.deepmd.descriptor import env_mat
        from g4s_tpu.models.deepmd.model import atomic_descriptor
        R, nlist = env_mat(coords, box, types, spec.descriptor)
        D = atomic_descriptor(params, spec, R, types, nlist)
        m1 = spec.embed_neurons[-1]
        assert D.shape == (coords.shape[0], m1 * spec.axis_neuron + m1)


class TestCalculator:
    def test_ase_free_eval_and_gated_DP(self, tmp_path):
        """calculator.py: the ASE-free path evaluates a frozen model by
        element symbols; the DP class raises a clear error without ase."""
        from g4s_tpu.models.deepmd.calculator import DP, calc_ase_free
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        from g4s_tpu.models.deepmd.freeze import freeze
        from g4s_tpu.models.deepmd.model import ModelSpec, init_params
        spec = ModelSpec(DescriptorSpec(6.0, 0.5, (8, 12), 2),
                         (8, 16), 4, (24, 24))
        params = init_params(jax.random.PRNGKey(0), spec)
        mf = str(tmp_path / "m.npz")
        freeze(params, spec, mf, type_map=["O", "H"])
        rng = np.random.default_rng(0)
        pos = rng.uniform(0, 9, (24, 3))
        out = calc_ase_free(mf, pos, np.diag([9., 9., 9.]),
                            ["O"] * 8 + ["H"] * 16, ["O", "H"])
        assert out["forces"].shape == (24, 3)
        assert np.isfinite(out["energy"])
        try:
            import ase  # noqa: F401
            has_ase = True
        except ImportError:
            has_ase = False
        if not has_ase:
            with pytest.raises(ImportError):
                DP(mf)


class TestTensorFitting:
    def test_dipole_polar_covariance(self):
        """fit/dipole.py + fit/polar.py parity: outputs built from the
        se_e2_a rotation matrix are exactly covariant — dipole rotates as
        a vector, polarizability as a rank-2 tensor — and autodiff
        provides the DeepTensor derivative."""
        from scipy.spatial.transform import Rotation
        from g4s_tpu.models.deepmd import fit_tensor as ft
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        from g4s_tpu.models.deepmd.model import ModelSpec, init_params
        spec = ModelSpec(DescriptorSpec(6.0, 0.5, (8, 12), 2),
                         (8, 16), 4, (24, 24))
        params = init_params(jax.random.PRNGKey(0), spec)
        nets = ft.init_tensor_fit(jax.random.PRNGKey(1), spec)
        rng = np.random.default_rng(0)
        pos = rng.uniform(3.0, 6.0, (24, 3))
        box = jnp.asarray(np.diag([30., 30., 30.]))
        types = jnp.asarray((np.arange(24) % 3 == 0).astype(np.int32))
        d = ft.total_dipole(params, nets, spec, jnp.asarray(pos), box, types)
        P = ft.total_polar(params, nets, spec, jnp.asarray(pos), box, types)
        R = Rotation.from_euler("xyz", [0.3, -0.7, 1.1]).as_matrix()
        pos_r = jnp.asarray(pos @ R.T + 15.0)
        d_r = ft.total_dipole(params, nets, spec, pos_r, box, types)
        P_r = ft.total_polar(params, nets, spec, pos_r, box, types)
        Rj = jnp.asarray(R)
        assert float(jnp.max(jnp.abs(d_r - Rj @ d))) < 1e-10
        assert float(jnp.max(jnp.abs(P_r - Rj @ P @ Rj.T))) < 1e-10
        assert float(jnp.max(jnp.abs(P - P.T))) < 1e-14
        g = jax.jacrev(lambda c: ft.total_dipole(params, nets, spec, c,
                                                 box, types))(
            jnp.asarray(pos))
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_tensor_loss_training(self):
        """loss/tensor.py + trainer dipole path (the DPLR training leg):
        a student dipole model trained on a teacher's atomic-dipole
        labels recovers the teacher's outputs; sel_type masking keeps
        non-selected atoms out of the objective; the global-label term
        trains through the per-frame sum."""
        from g4s_tpu.models.deepmd import fit_tensor as ft
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        from g4s_tpu.models.deepmd.model import ModelSpec, init_params
        spec = ModelSpec(DescriptorSpec(6.0, 0.5, (6, 10), 2),
                         (6, 12), 3, (16, 16))
        teacher_p = init_params(jax.random.PRNGKey(7), spec)
        teacher_n = ft.init_tensor_fit(jax.random.PRNGKey(8), spec)
        rng = np.random.default_rng(3)
        nf, na = 16, 12
        coord = rng.uniform(2.0, 7.0, (nf, na, 3))
        box = np.broadcast_to(np.diag([20., 20., 20.]), (nf, 3, 3)).copy()
        types = jnp.asarray((np.arange(na) % 3 == 0).astype(np.int32))
        labels = np.stack([np.asarray(ft.atomic_dipole(
            teacher_p, teacher_n, spec, jnp.asarray(coord[i]),
            jnp.asarray(box[i]), types)) for i in range(nf)])
        frames = {"coord": coord, "box": box, "atomic_label": labels}
        cfg = ft.TensorLossConfig(pref=0.0, pref_atomic=1.0, sel_type=(0,))
        student_p = init_params(jax.random.PRNGKey(17), spec)
        student_n = ft.init_tensor_fit(jax.random.PRNGKey(18), spec)
        loss_fn = ft.make_tensor_loss_fn(spec, cfg)
        l0, _ = loss_fn((student_p, student_n),
                        {k: jnp.asarray(v) for k, v in frames.items()}, types)
        (tp, tn), aux = ft.train_tensor(
            student_p, student_n, spec, frames, types, numb_steps=150,
            loss_cfg=cfg, batch_size=8, seed=1)
        l1, _ = loss_fn((tp, tn),
                        {k: jnp.asarray(v) for k, v in frames.items()}, types)
        assert float(l1) < 0.05 * float(l0)
        # stats (normalization constants) stayed frozen, like the
        # reference's non-trainable t_avg/t_std
        for k in ("davg", "dstd"):
            assert np.allclose(np.asarray(tp["stats"][k]),
                               np.asarray(student_p["stats"][k]))
        # sel_type masking: perturbing the labels of NON-selected atoms
        # does not change the loss
        bad = dict(frames)
        lab2 = labels.copy()
        lab2[:, np.asarray(types) != 0, :] += 100.0
        bad["atomic_label"] = lab2
        lb, _ = loss_fn((tp, tn),
                        {k: jnp.asarray(v) for k, v in bad.items()}, types)
        assert np.isclose(float(lb), float(l1))
        # global-label mode trains too
        gcfg = ft.TensorLossConfig(pref=1.0, pref_atomic=0.0, sel_type=(0,))
        sel = np.asarray(types) == 0
        gframes = {"coord": coord, "box": box,
                   "label": labels[:, sel, :].sum(axis=1)}
        gl_fn = ft.make_tensor_loss_fn(spec, gcfg)
        g0, _ = gl_fn((student_p, student_n),
                      {k: jnp.asarray(v) for k, v in gframes.items()}, types)
        (gp, gn), _ = ft.train_tensor(
            student_p, student_n, spec, gframes, types, numb_steps=100,
            loss_cfg=gcfg, batch_size=8, seed=2)
        g1, _ = gl_fn((gp, gn),
                      {k: jnp.asarray(v) for k, v in gframes.items()}, types)
        assert float(g1) < 0.2 * float(g0)

    def test_fparam_aparam_conditioning(self, tmp_path):
        """numb_fparam/numb_aparam (ener.py:127-260): frame/atom
        parameters are normalized and appended to the fitting input; the
        energy must actually depend on them, and the dp CLI trains from
        fparam.npy/aparam.npy sets (examples/fparam data layout)."""
        import argparse
        import json
        import os
        from g4s_tpu.drivers import dp
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        from g4s_tpu.models.deepmd.model import (ModelSpec, init_params,
                                                 total_energy)
        spec = ModelSpec(DescriptorSpec(6.0, 0.5, (8, 12), 2),
                         (6, 12), 3, (16, 16), numb_fparam=2,
                         numb_aparam=1)
        params = init_params(jax.random.PRNGKey(0), spec)
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.uniform(2.0, 7.0, (10, 3)))
        box = jnp.asarray(np.diag([20., 20., 20.]))
        types = jnp.asarray((np.arange(10) % 2).astype(np.int32))
        fp1, fp2 = jnp.asarray([0.1, -0.3]), jnp.asarray([1.4, 0.7])
        ap = jnp.asarray(rng.normal(size=(10, 1)))
        e1 = total_energy(params, spec, pos, box, types, fparam=fp1,
                          aparam=ap)
        e2 = total_energy(params, spec, pos, box, types, fparam=fp2,
                          aparam=ap)
        assert abs(float(e1) - float(e2)) > 1e-8
        with pytest.raises(ValueError):
            total_energy(params, spec, pos, box, types)

        # CLI end-to-end on a synthetic npy system with fparam labels
        sysdir = tmp_path / "sys"
        (sysdir / "set.000").mkdir(parents=True)
        nf, na = 24, 8
        t = (np.arange(na) % 2).astype(np.int32)
        np.savetxt(sysdir / "type.raw", t, fmt="%d")
        coord = rng.uniform(1.0, 9.0, (nf, na * 3))
        fparam = rng.uniform(-1, 1, (nf, 1))
        energy = coord.reshape(nf, -1, 3)[:, :, 0].sum(1) * 0.01 \
            + 0.5 * fparam[:, 0]
        force = np.zeros((nf, na * 3))
        force[:, 0::3] = -0.01
        np.save(sysdir / "set.000" / "coord.npy", coord)
        np.save(sysdir / "set.000" / "box.npy",
                np.tile(np.eye(3).ravel() * 10, (nf, 1)))
        np.save(sysdir / "set.000" / "energy.npy", energy)
        np.save(sysdir / "set.000" / "force.npy", force)
        np.save(sysdir / "set.000" / "fparam.npy", fparam)
        jd = {"model": {"type_map": ["O", "H"],
                        "descriptor": {"rcut": 6.0, "rcut_smth": 0.5,
                                       "sel": [8, 12], "neuron": [6, 12],
                                       "axis_neuron": 3},
                        "fitting_net": {"neuron": [16, 16],
                                        "numb_fparam": 1}},
              "learning_rate": {"start_lr": 5e-3, "stop_lr": 1e-4,
                                "decay_steps": 20},
              "loss": {"start_pref_e": 1, "limit_pref_e": 1,
                       "start_pref_f": 1, "limit_pref_f": 1},
              "training": {"numb_steps": 60,
                           "training_data": {"systems": ["sys"],
                                             "batch_size": 8}}}
        inp = tmp_path / "input.json"
        inp.write_text(json.dumps(jd))
        args = argparse.Namespace(input=str(inp), steps=None,
                                  checkpoint=str(tmp_path / "ck.npz"),
                                  restart=None, init_model=None,
                                  finetune=None, dtype="f32")
        cwd = os.getcwd()
        try:
            os.chdir(tmp_path)
            dp.cmd_train(args)
        finally:
            os.chdir(cwd)
        assert os.path.exists(tmp_path / "ck.npz")

    def test_spin_model_reference_data(self, tmp_path):
        """Atomic-spin model (utils/spin.py): virtual-type sel/ntypes
        expansion trains the bundled NiO spin data through the standard
        energy/force path; augment/split_forces obey the chain rule
        dE/dS = f_virtual * virtual_len/spin_norm."""
        import argparse
        import json as _json
        import os
        data = "/root/reference/deepmd/examples/spin/data/data_0"
        if not os.path.exists(data):
            pytest.skip("reference data not present")
        from g4s_tpu.drivers import dp
        from g4s_tpu.models.deepmd import spin as sp
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        from g4s_tpu.models.deepmd.model import (ModelSpec, init_params,
                                                 total_energy)
        # chain rule check on a tiny augmented model
        spec = ModelSpec(DescriptorSpec(5.6, 5.4, (8, 8, 8), 3),
                         (6, 12), 3, (16, 16))
        params = init_params(jax.random.PRNGKey(0), spec)
        ss = sp.SpinSpec((True, False), (0.4,), (1.2737,))
        rng = np.random.default_rng(0)
        coord = jnp.asarray(rng.uniform(1.0, 9.0, (6, 3)))
        types = np.array([0, 0, 1, 1, 1, 1], np.int32)
        svec = np.zeros((6, 3))
        svec[:2] = rng.normal(size=(2, 3))
        box = jnp.asarray(np.diag([12.0, 12.0, 12.0]))

        def e_of_spin(s_flat):
            ca, ta = sp.augment(coord, s_flat.reshape(6, 3), types, ss)
            return total_energy(params, spec, ca, box, ta)

        g = jax.grad(e_of_spin)(jnp.asarray(svec).reshape(-1)).reshape(6, 3)
        ca, ta = sp.augment(coord, jnp.asarray(svec), types, ss)
        f_aug = -jax.grad(lambda c: total_energy(params, spec, c, box,
                                                 ta))(ca)
        _, f_mag = sp.split_forces(f_aug, ta, ss)
        np.testing.assert_allclose(np.asarray(-g[:2]), np.asarray(f_mag),
                                   rtol=1e-5, atol=1e-8)
        # CLI training on the real NiO spin data (virtual atoms are
        # materialized in type.raw/coord.npy)
        jd = {"model": {"type_map": ["Ni", "O"],
                        "descriptor": {"rcut": 5.6, "rcut_smth": 5.4,
                                       "sel": [24, 24],
                                       "neuron": [6, 12],
                                       "axis_neuron": 4},
                        "fitting_net": {"neuron": [24, 24]},
                        "spin": {"use_spin": [True, False],
                                 "virtual_len": [0.4],
                                 "spin_norm": [1.2737]}},
              "learning_rate": {"start_lr": 1e-3, "stop_lr": 1e-4,
                                "decay_steps": 20},
              "loss": {"start_pref_e": 0.1, "limit_pref_e": 1,
                       "start_pref_f": 100, "limit_pref_f": 1},
              "training": {"numb_steps": 30,
                           "training_data": {"systems": [data],
                                             "batch_size": 2}}}
        inp = tmp_path / "input.json"
        inp.write_text(_json.dumps(jd))
        args = argparse.Namespace(input=str(inp), steps=None,
                                  checkpoint=str(tmp_path / "ck.npz"),
                                  restart=None, init_model=None,
                                  finetune=None, dtype="f32")
        cwd = os.getcwd()
        try:
            os.chdir(tmp_path)
            dp.cmd_train(args)
        finally:
            os.chdir(cwd)
        assert os.path.exists(tmp_path / "ck.npz")

    def test_dp_train_dos_cli_reference_data(self, tmp_path):
        """`dp train` with fitting_net.type=dos (fit/dos.py + loss/dos.py)
        on the REAL reference heat-221 DOS data: atomic-DOS rmse must
        drop substantially from the data-mean baseline."""
        import argparse
        import os
        ref = "/root/reference/deepmd/examples/dos/train/input.json"
        if not os.path.exists(ref):
            pytest.skip("reference data not present")
        from g4s_tpu.drivers import dp
        args = argparse.Namespace(input=ref, steps=40,
                                  checkpoint=str(tmp_path / "m.npz"),
                                  restart=None, dtype="f32")
        out = dp.cmd_train(args)
        assert out["loss_tail"] < 0.3 * out["loss_head"], out
        assert os.path.exists(tmp_path / "m.npz")

    def test_dp_train_dipole_cli_reference_data(self, tmp_path):
        """`dp train dipole_input.json` on the REAL reference
        water_tensor dipole data (nopbc, mixed atomic- and global-label
        systems, sel_type=[O]): losses on both label structures must
        decrease."""
        import argparse
        import os
        ref = ("/root/reference/deepmd/examples/water_tensor/dipole/"
               "dipole_input.json")
        if not os.path.exists(ref):
            pytest.skip("reference data not present")
        from g4s_tpu.drivers import dp
        args = argparse.Namespace(input=ref, steps=40,
                                  checkpoint=str(tmp_path / "m.npz"),
                                  restart=None, dtype="f32")
        out = dp.cmd_train(args)
        for key, curve in out["loss_curves"].items():
            head = np.mean(curve[:3])
            tail = np.mean(curve[-3:])
            assert tail < 0.8 * head, (key, head, tail)
        assert os.path.exists(tmp_path / "m.npz")


class TestLocFrame:
    def test_invariance_and_forces(self):
        """DescrptLocFrame: descriptor in the per-atom orthonormal frame
        is exactly invariant under global rotation+translation; autodiff
        forces match finite differences."""
        from scipy.spatial.transform import Rotation
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        from g4s_tpu.models.deepmd.model import (ModelSpec,
                                                 energy_force_virial,
                                                 init_params, total_energy)
        dspec = DescriptorSpec(rcut=6.0, rcut_smth=0.5, sel=(8, 12),
                               ntypes=2)
        spec = ModelSpec(descriptor=dspec, embed_neurons=(8, 16),
                         axis_neuron=4, fit_neurons=(24, 24),
                         descriptor_type="loc_frame")
        params = init_params(jax.random.PRNGKey(0), spec)
        rng = np.random.default_rng(0)
        pos = rng.uniform(3.0, 6.0, (24, 3))
        box = jnp.asarray(np.diag([30., 30., 30.]))
        types = jnp.asarray((np.arange(24) % 3 == 0).astype(np.int32))
        e = total_energy(params, spec, jnp.asarray(pos), box, types)
        R = Rotation.from_euler("xyz", [0.4, -0.9, 1.3]).as_matrix()
        e_rot = total_energy(params, spec, jnp.asarray(pos @ R.T + 12.0),
                             box, types)
        assert abs(float(e - e_rot)) < 1e-10
        _, F, _ = energy_force_virial(params, spec, jnp.asarray(pos), box,
                                      types)
        eps = 1e-6
        fd = -(total_energy(params, spec,
                            jnp.asarray(pos).at[4, 0].add(eps), box, types)
               - total_energy(params, spec,
                              jnp.asarray(pos).at[4, 0].add(-eps), box,
                              types)) / (2 * eps)
        assert abs(float(F[4, 0] - fd)) < 1e-7


class TestSeAEbdAndMask:
    def _water6(self):
        coords = np.array([[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0],
                           [4, 4, 4], [4.96, 4, 4], [3.76, 4.93, 4]],
                          np.float64)
        types = np.array([0, 1, 1, 0, 1, 1], np.int32)
        box = np.eye(3) * 12.0
        return jnp.asarray(coords), jnp.asarray(box), jnp.asarray(types)

    def test_se_a_ebd_invariance_and_forces(self):
        """DescrptSeAEbd (type-embedded se_a): rotation+translation
        invariant, forces are the exact energy gradient."""
        from g4s_tpu.models.deepmd.model import (ModelSpec,
                                                 energy_force_virial,
                                                 init_params, total_energy)
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        spec = ModelSpec(DescriptorSpec(6.0, 0.5, (4, 8), 2),
                         (8, 16), 4, (24, 24), descriptor_type="se_a_ebd")
        params = init_params(jax.random.PRNGKey(3), spec)
        assert params["embed"]["attn"] == []      # no attention layers
        coords, box, types = self._water6()
        e, f, v = energy_force_virial(params, spec, coords, box, types)
        # invariance under rotation + translation
        th = 0.7
        Q = jnp.asarray(np.array([[np.cos(th), -np.sin(th), 0],
                                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]]))
        e2 = total_energy(params, spec, coords @ Q.T + 1.7, box @ Q.T, types)
        np.testing.assert_allclose(float(e2), float(e), rtol=1e-9)
        # FD check of one force component
        eps = 1e-6
        dp = coords.at[2, 1].add(eps)
        dm = coords.at[2, 1].add(-eps)
        fd = -(total_energy(params, spec, dp, box, types)
               - total_energy(params, spec, dm, box, types)) / (2 * eps)
        np.testing.assert_allclose(float(f[2, 1]), float(fd), rtol=1e-5,
                                   atol=1e-8)

    def test_se_a_mask_virtual_atoms(self):
        """DescrptSeAMask: virtual (masked) atoms contribute nothing, so
        a 6-atom system with 2 virtual padding atoms gives the same
        energy as the bare 6-atom evaluation on the 8-atom graph."""
        from g4s_tpu.models.deepmd.model import (ModelSpec, init_params,
                                                 total_energy)
        from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
        spec = ModelSpec(DescriptorSpec(6.0, 0.5, (6, 10), 2),
                         (8, 16), 4, (24, 24), descriptor_type="se_a_mask")
        params = init_params(jax.random.PRNGKey(4), spec)
        coords, box, types = self._water6()
        # pad with 2 virtual atoms placed ON TOP of real ones (worst case)
        coords8 = jnp.concatenate([coords, coords[:2] + 0.1], axis=0)
        types8 = jnp.concatenate([types, types[:2]])
        mask8 = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], bool)
        e_masked = total_energy(params, spec, coords8, None, types8,
                                atom_mask=mask8)
        e_bare = total_energy(params, spec, coords, None, types,
                              atom_mask=jnp.ones(6, bool))
        np.testing.assert_allclose(float(e_masked), float(e_bare),
                                   rtol=1e-10)


class TestDPLR:
    pytestmark = pytest.mark.slow
    """Long-range electrostatics (dplr.py): ewald_recp + the dipole
    charge modifier (reference: source/lib/src/ewald.cc,
    deepmd/infer/data_modifier.py)."""

    def test_madelung_nacl(self):
        """recip + real + self Ewald must reproduce the NaCl Madelung
        constant (1.7475645946...) — an analytic oracle no part of the
        reference test suite could leak."""
        from g4s_tpu.models.deepmd.dplr import (ewald_recp,
                                                ewald_real_and_self,
                                                ELECTROSTATIC_CONVERSION)
        a = 5.64                      # conventional cubic cell, angstrom
        # rock salt: Na at (0,0,0)+fcc, Cl at (.5,0,0)+fcc
        fcc = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
        na = fcc
        cl = (fcc + [0.5, 0, 0]) % 1.0
        frac = np.vstack([na, cl])
        coord = frac * a
        q = np.array([1.0] * 4 + [-1.0] * 4)
        box = np.eye(3) * a
        beta = 0.9
        e_r, _, _ = ewald_recp(coord, q, box, beta=beta, spacing=0.35)
        e_rs = float(ewald_real_and_self(coord, q, box, beta=beta,
                                         rcut=8.0, n_images=2))
        e_total = float(e_r) + e_rs
        # 4 ion pairs, nearest-neighbor distance a/2
        madelung = -e_total * (a / 2) / (4 * ELECTROSTATIC_CONVERSION)
        assert abs(madelung - 1.7475645946) < 2e-6, madelung

    def test_recp_forces_are_gradients(self):
        from g4s_tpu.models.deepmd.dplr import ewald_recp
        rng = np.random.default_rng(0)
        n = 6
        box = np.eye(3) * 7.0
        coord = rng.uniform(0, 7.0, (n, 3))
        q = rng.normal(size=n)
        q -= q.mean()
        e0, f, v = ewald_recp(coord, q, box, beta=1.0, spacing=2.0)
        # central-difference check on one coordinate
        eps = 1e-5
        cp = coord.copy(); cp[2, 1] += eps
        cm = coord.copy(); cm[2, 1] -= eps
        ep, _, _ = ewald_recp(cp, q, box, beta=1.0, spacing=2.0)
        em, _, _ = ewald_recp(cm, q, box, beta=1.0, spacing=2.0)
        fd = -(float(ep) - float(em)) / (2 * eps)
        assert abs(fd - float(f[2, 1])) < 1e-6 * max(1.0, abs(fd))

    def test_dipole_charge_modifier(self):
        """Modifier energy/forces: neutral system, translation-invariant
        energy, forces = -grad (via an independent finite difference)."""
        import jax
        from g4s_tpu.models.deepmd.dplr import DipoleChargeModifier
        from g4s_tpu.models.deepmd.fit_tensor import init_tensor_fit
        from g4s_tpu.models.deepmd import init_params
        spec = tiny_spec()
        rng = np.random.default_rng(1)
        coord, box, types = random_frame(rng)
        params = init_params(jax.random.PRNGKey(0), spec)
        nets = init_tensor_fit(jax.random.PRNGKey(1), spec)
        mod = DipoleChargeModifier(params, nets, spec,
                                   model_charge_map=[-2.0, -1.0],
                                   sys_charge_map=[2.0, 1.0],
                                   ewald_h=2.0, ewald_beta=1.0)
        e, f, v = mod.eval(coord, box, types)
        assert np.isfinite(float(e))
        # translation invariance (charges ride with coords)
        e2, f2, _ = mod.eval(np.asarray(coord) + 0.37, box, types)
        assert abs(float(e2) - float(e)) < 1e-8 * max(1.0, abs(float(e)))
        # finite-difference force check
        eps = 1e-5
        c = np.asarray(coord, np.float64)
        cp = c.copy(); cp[1, 0] += eps
        cm = c.copy(); cm[1, 0] -= eps
        ep, _, _ = mod.eval(cp, box, types)
        em, _, _ = mod.eval(cm, box, types)
        fd = -(float(ep) - float(em)) / (2 * eps)
        np.testing.assert_allclose(float(f[1, 0]), fd,
                                   rtol=1e-5, atol=1e-7)


class TestSeAEf:
    """se_a_ef descriptor (electric-field variants, se_a_ef.py /
    ComputeDescriptor.h:879): parallel + perpendicular env mats."""

    def test_para_plus_vert_recovers_standard(self):
        import jax
        from g4s_tpu.models.deepmd.descriptor import env_mat
        spec = tiny_spec()
        rng = np.random.default_rng(3)
        coord, box, types = random_frame(rng)
        ef = jnp.asarray(rng.normal(size=(coord.shape[0], 3)))
        R0, _ = env_mat(coord, box, types, spec.descriptor)
        Rp, _ = env_mat(coord, box, types, spec.descriptor,
                        efield=ef, ef_mode="para")
        Rv, _ = env_mat(coord, box, types, spec.descriptor,
                        efield=ef, ef_mode="vert")
        # channel 0 (1/r of the full distance) identical in all three;
        # vector channels decompose exactly
        np.testing.assert_allclose(np.asarray(Rp[..., 0]),
                                   np.asarray(R0[..., 0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(Rp[..., 1:] + Rv[..., 1:]),
                                   np.asarray(R0[..., 1:]), atol=1e-10)

    def test_descriptor_rotation_covariance(self):
        """Rotating coords, box AND efield leaves the se_a_ef descriptor
        invariant (the scalar contraction is rotation-invariant when the
        field co-rotates)."""
        import jax
        from scipy.spatial.transform import Rotation
        from g4s_tpu.models.deepmd import init_params
        from g4s_tpu.models.deepmd.descriptor import atomic_descriptor_ef
        spec = tiny_spec()
        rng = np.random.default_rng(4)
        coord, box, types = random_frame(rng)
        pp = init_params(jax.random.PRNGKey(0), spec)
        pv = init_params(jax.random.PRNGKey(1), spec)
        ef = rng.normal(size=(np.asarray(coord).shape[0], 3))
        D0 = atomic_descriptor_ef(pp, pv, spec, coord, box, types,
                                  jnp.asarray(ef))
        Q = Rotation.from_rotvec([0.3, -0.2, 0.9]).as_matrix()
        D1 = atomic_descriptor_ef(
            pp, pv, spec, jnp.asarray(np.asarray(coord) @ Q.T),
            jnp.asarray(np.asarray(box) @ Q.T), types,
            jnp.asarray(ef @ Q.T))
        np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                                   rtol=2e-5, atol=1e-7)


class TestFinetuneAndMultiTask:
    pytestmark = pytest.mark.slow
    def _two_datasets(self, rng):
        """Two tiny in-memory 'systems' with different energy offsets."""
        from g4s_tpu.models.deepmd.data import DataSystem

        class _Sys:
            pass

        def mk(offset, seed):
            r = np.random.default_rng(seed)
            s = _Sys()
            s.types = np.array([0, 0, 1, 1], np.int32)
            s.natoms = 4
            s.nframes = 8
            base = r.uniform(1.5, 4.5, (1, 4, 3))
            s.coord = (base + 0.05 * r.normal(size=(8, 4, 3))).astype(
                np.float64)
            s.box = np.tile(np.eye(3) * 6.0, (8, 1, 1))
            s.energy = offset + 0.1 * r.normal(size=8)
            s.force = 0.1 * r.normal(size=(8, 4, 3))
            return s

        class _Data:
            def __init__(self, sys_):
                self.systems = [sys_]
                self.batch_size = 2
                self.rng = np.random.default_rng(0)
                self.probs = np.array([1.0])

            def energy_bias(self, ntypes):
                from g4s_tpu.models.deepmd.data import DataSystem
                return DataSystem.energy_bias(self, ntypes)

            def sample_batch(self):
                from g4s_tpu.models.deepmd.data import DataSystem
                return DataSystem.sample_batch(self)

        return _Data(mk(-40.0, 1)), _Data(mk(+15.0, 2))

    def test_change_energy_bias_kills_offset(self, rng):
        import jax
        from g4s_tpu.models.deepmd import init_params
        from g4s_tpu.models.deepmd.model import energy_force_virial
        from g4s_tpu.models.deepmd.train import change_energy_bias
        spec = tiny_spec()
        d1, d2 = self._two_datasets(rng)
        params = init_params(jax.random.PRNGKey(0), spec,
                             bias_atom_e=d1.energy_bias(2))
        # 'finetune' onto dataset 2 whose energies sit +55 away
        p2, delta = change_energy_bias(params, spec, d2, 2)
        s = d2.systems[0]
        res = []
        for i in range(4):
            e, _, _ = energy_force_virial(p2, spec,
                                          jnp.asarray(s.coord[i]),
                                          jnp.asarray(s.box[i]),
                                          jnp.asarray(s.types))
            res.append(float(s.energy[i]) - float(e))
        # residual mean collapses to ~the intra-dataset noise (0.1)
        assert abs(np.mean(res)) < 0.5, np.mean(res)

    def test_multitask_shares_descriptor_trains_heads(self, rng):
        import jax
        from g4s_tpu.models.deepmd.train import MultiTaskTrainer
        spec = tiny_spec()
        d1, d2 = self._two_datasets(rng)
        mt = MultiTaskTrainer(spec, [
            {"name": "a", "data": d1}, {"name": "b", "data": d2}])
        mtp = mt.init_params(jax.random.PRNGKey(0))
        emb0 = np.asarray(
            jax.tree_util.tree_leaves(mtp["shared"]["embed"])[0]).copy()
        h0 = [np.asarray(jax.tree_util.tree_leaves(h)[0]).copy()
              for h in mtp["heads"]]
        mtp2, hist = mt.train(mtp, 8, disp_freq=4)
        emb1 = np.asarray(
            jax.tree_util.tree_leaves(mtp2["shared"]["embed"])[0])
        h1 = [np.asarray(jax.tree_util.tree_leaves(h)[0])
              for h in mtp2["heads"]]
        # the shared descriptor AND both heads moved
        assert np.abs(emb1 - emb0).max() > 0
        assert np.abs(h1[0] - h0[0]).max() > 0
        assert np.abs(h1[1] - h0[1]).max() > 0
        # both tasks keep their own bias scale: evaluate each head
        from g4s_tpu.models.deepmd.model import energy_force_virial
        for i, d in enumerate((d1, d2)):
            s = d.systems[0]
            e, _, _ = energy_force_virial(
                mt.task_params(mtp2, i), spec, jnp.asarray(s.coord[0]),
                jnp.asarray(s.box[0]), jnp.asarray(s.types))
            assert abs(float(e) - float(s.energy[0])) < 20.0


class TestIPIDriver:
    pytestmark = pytest.mark.slow
    """i-PI wire protocol driver (source/ipi/driver.cc role): an
    in-process mock i-PI server exchanges the exact byte protocol and
    the returned energy/forces/virial must match a direct DeepPot eval
    (unit-converted, cell-transposed)."""

    def _model(self, tmp_path):
        spec = tiny_spec()
        p = init_params(jax.random.PRNGKey(7), spec)
        path = tmp_path / "ipi_model.npz"
        freeze(p, spec, path)
        return path

    def test_protocol_roundtrip(self, tmp_path, rng):
        import struct
        from g4s_tpu.models.deepmd.infer import DeepPot
        from g4s_tpu.models.deepmd.ipi import (CVT_ENER, CVT_F, CVT_LEN,
                                               IPIDriver, wrap_coords)
        path = self._model(tmp_path)
        coord, box, types = random_frame(rng)
        names = ["O" if t == 0 else "H" for t in np.asarray(types)]
        drv = IPIDriver(str(path), names, {"O": 0, "H": 1})

        # build the byte stream an i-PI server would send
        cell_bohr = (np.asarray(box).T / CVT_LEN).astype("<f8")  # columns
        icell = np.linalg.inv(cell_bohr).astype("<f8")
        coords_bohr = (np.asarray(coord) / CVT_LEN).astype("<f8")
        inbox = [cell_bohr.tobytes(), icell.tobytes(),
                 struct.pack("<i", len(names)), coords_bohr.tobytes()]
        instream = b"".join(inbox)
        pos = [0]

        def recv(n):
            b = instream[pos[0]: pos[0] + n]
            pos[0] += n
            return b
        sent = []
        # STATUS before data -> READY
        drv.handle_message(b"STATUS      ", recv, sent.append)
        assert sent[-1].strip() == b"READY"
        drv.handle_message(b"POSDATA     ", recv, sent.append)
        drv.handle_message(b"STATUS      ", recv, sent.append)
        assert sent[-1].strip() == b"HAVEDATA"
        drv.handle_message(b"GETFORCE    ", recv, sent.append)
        msg = sent[-1]
        assert msg[:12].strip() == b"FORCEREADY"
        off = 12
        (ener,) = struct.unpack_from("<d", msg, off); off += 8
        (nat,) = struct.unpack_from("<i", msg, off); off += 4
        force = np.frombuffer(msg[off: off + 24 * nat], "<f8") \
            .reshape(nat, 3); off += 24 * nat
        virial = np.frombuffer(msg[off: off + 72], "<f8").reshape(3, 3)
        off += 72
        (ln,) = struct.unpack_from("<i", msg, off); off += 4
        assert msg[off: off + ln] == b"nothing"

        # oracle: direct DeepPot eval on the wrapped coordinates
        pot = DeepPot(str(path))
        xyz = wrap_coords(np.asarray(coord), np.asarray(box))
        e0, f0, v0 = pot.eval(xyz, box, types)
        assert ener == pytest.approx(float(e0) / CVT_ENER, rel=1e-10)
        np.testing.assert_allclose(force, np.asarray(f0) / CVT_F,
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(
            virial, np.asarray(v0).reshape(3, 3).T / CVT_ENER,
            rtol=1e-6, atol=1e-12)

    def test_socket_transport(self, tmp_path, rng):
        """serve_forever over a real socketpair with a minimal server."""
        import socket
        import struct
        import threading
        from g4s_tpu.models.deepmd.ipi import CVT_LEN, IPIDriver
        path = self._model(tmp_path)
        coord, box, types = random_frame(rng, natoms=8)
        names = ["O" if t == 0 else "H" for t in np.asarray(types)]
        drv = IPIDriver(str(path), names, {"O": 0, "H": 1})
        srv, cli = socket.socketpair()
        drv.sock = cli
        th = threading.Thread(target=drv.serve_forever, daemon=True)
        th.start()

        def sendall(b):
            srv.sendall(b)

        def recvn(n):
            buf = b""
            while len(buf) < n:
                buf += srv.recv(n - len(buf))
            return buf
        sendall(b"STATUS      ")
        assert recvn(12).strip() == b"READY"
        sendall(b"INIT        " + struct.pack("<i", 5) + b"hello")
        cell = (np.asarray(box).T / CVT_LEN).astype("<f8")
        sendall(b"POSDATA     " + cell.tobytes()
                + np.linalg.inv(cell).astype("<f8").tobytes()
                + struct.pack("<i", len(names))
                + (np.asarray(coord) / CVT_LEN).astype("<f8").tobytes())
        sendall(b"STATUS      ")
        assert recvn(12).strip() == b"HAVEDATA"
        sendall(b"GETFORCE    ")
        head = recvn(12)
        assert head.strip() == b"FORCEREADY"
        recvn(8 + 4 + 24 * len(names) + 72 + 4 + 7)
        srv.close()
        th.join(timeout=10)
        assert not th.is_alive()

    def test_read_xyz_names(self, tmp_path):
        from g4s_tpu.models.deepmd.ipi import read_xyz_names
        p = tmp_path / "w.xyz"
        p.write_text("3\nwater\nO 0 0 0\nH 1 0 0\nH 0 1 0\n")
        assert read_xyz_names(str(p)) == ["O", "H", "H"]
