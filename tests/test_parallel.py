"""Halo exchange + collectives on a virtual 8-device CPU mesh.

Oracle: assemble the same overlapping-block decomposition in numpy and
compare against the single-array ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from g4s_tpu.parallel import (
    halo_exchange_add, halo_copy_ghost, make_mesh, pdot, pnorm2, pmax,
    device_mesh_shape,
)


def split_overlapping(u, n_parts, axis=0):
    """Split a global array into n overlapping blocks sharing boundary
    planes (the reference's node-sharing decomposition)."""
    n = u.shape[axis]
    assert (n - 1) % n_parts == 0
    step = (n - 1) // n_parts
    return [np.take(u, range(i * step, (i + 1) * step + 1), axis=axis)
            for i in range(n_parts)]


def test_device_mesh_shape():
    assert device_mesh_shape(8, 3) == (2, 2, 2)
    assert device_mesh_shape(8, 1) == (8,)
    assert np.prod(device_mesh_shape(6, 2)) == 6


def test_halo_add_1d():
    mesh = make_mesh(("x",), (8,))
    rng = np.random.default_rng(0)
    n_global = 8 * 4 + 1  # 33 nodes, 8 blocks of 5 sharing boundaries
    partials = rng.normal(size=(8, 5, 3))  # per-device partial sums, 3 dof

    # ground truth: adjacent blocks share a node; total = sum of both copies
    truth = partials.copy()
    for i in range(7):
        s = partials[i, -1] + partials[i + 1, 0]
        truth[i, -1] = s
        truth[i + 1, 0] = s

    f = shard_map(lambda u: halo_exchange_add(u, [("x", 0)]),
                  mesh=mesh, in_specs=P("x"), out_specs=P("x"))
    out = np.asarray(f(jnp.asarray(partials.reshape(8 * 5, 3))))
    np.testing.assert_allclose(out.reshape(8, 5, 3), truth, rtol=1e-13)


def test_halo_add_2d_corners():
    mesh = make_mesh(("x", "y"), (4, 2))
    rng = np.random.default_rng(1)
    bx, by = 3, 4
    partials = rng.normal(size=(4, 2, bx, by))

    # numpy oracle: scatter-add every block into the global grid, read back
    gx, gy = 4 * (bx - 1) + 1, 2 * (by - 1) + 1
    glob = np.zeros((gx, gy))
    for i in range(4):
        for j in range(2):
            glob[i * (bx - 1): i * (bx - 1) + bx,
                 j * (by - 1): j * (by - 1) + by] += partials[i, j]
    truth = np.empty_like(partials)
    for i in range(4):
        for j in range(2):
            truth[i, j] = glob[i * (bx - 1): i * (bx - 1) + bx,
                               j * (by - 1): j * (by - 1) + by]

    f = shard_map(lambda u: halo_exchange_add(u, [("x", 0), ("y", 1)]),
                  mesh=mesh, in_specs=P("x", "y"), out_specs=P("x", "y"))
    out = np.asarray(f(jnp.asarray(partials.transpose(0, 2, 1, 3)
                                   .reshape(4 * bx, 2 * by))))
    out_blocks = out.reshape(4, bx, 2, by).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out_blocks, truth, rtol=1e-12)


def test_halo_replace_ghost():
    mesh = make_mesh(("x",), (8,))
    blocks = np.zeros((8, 3))
    blocks[:, :] = np.arange(8)[:, None]  # device id everywhere
    f = shard_map(lambda u: halo_copy_ghost(u, [("x", 0)]),
                  mesh=mesh, in_specs=P("x"), out_specs=P("x"))
    out = np.asarray(f(jnp.asarray(blocks.reshape(-1)))).reshape(8, 3)
    # each device's low plane now equals left neighbor's id; device 0 unchanged
    np.testing.assert_allclose(out[0], [0, 0, 0])
    for i in range(1, 8):
        np.testing.assert_allclose(out[i], [i - 1, i, i])


def test_pdot_with_ownership_weights():
    mesh = make_mesh(("x",), (8,))
    rng = np.random.default_rng(2)
    # global vector of 8*4+1 nodes decomposed with shared boundaries
    g = rng.normal(size=8 * 4 + 1)
    blocks = np.stack(split_overlapping(g, 8))  # (8, 5)
    # ownership: every device owns its nodes except the low shared plane
    # (owned by the left neighbor); device 0 owns everything.
    w = np.ones_like(blocks)
    w[1:, 0] = 0.0

    def body(u, wt):
        return jnp.full_like(u, pdot(u, u, "x", weight=wt))

    f = shard_map(body, mesh=mesh, in_specs=(P("x"), P("x")), out_specs=P("x"))
    out = np.asarray(f(jnp.asarray(blocks.reshape(-1)), jnp.asarray(w.reshape(-1))))
    np.testing.assert_allclose(out[0], g @ g, rtol=1e-12)


def test_pmax():
    mesh = make_mesh(("x",), (8,))
    x = np.arange(32, dtype=np.float64)
    f = shard_map(lambda u: jnp.full_like(u, pmax(u, "x")),
                  mesh=mesh, in_specs=P("x"), out_specs=P("x"))
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(x)))[0], 31.0)


class TestSphereTopology:
    """12-cap full-sphere pass tables (Full_parallel_related.c:505-715 spec)."""

    def test_reciprocity_single_proc(self):
        from g4s_tpu.parallel import sphere
        t = sphere.build_pass_tables(1, 1, 1)
        assert len(t) == 12
        assert sphere.check_reciprocity(t, 1, 1, 1)

    def test_reciprocity_brick(self):
        from g4s_tpu.parallel import sphere
        t = sphere.build_pass_tables(2, 2, 2)
        assert len(t) == 96
        assert sphere.check_reciprocity(t, 2, 2, 2)

    def test_face_counts_and_polar_pairing(self):
        from g4s_tpu.parallel import sphere
        t = sphere.build_pass_tables(1, 1, 1)
        for cap in range(12):
            faces = [p for p in t[(cap, 0, 0, 0)] if p.kind == "face"]
            assert len(faces) == 4
        # polar edges pair opposite caps (cap+6)%12 for families 1 and 2
        for cap in range(12):
            for p in t[(cap, 0, 0, 0)]:
                if p.kind == "edge":
                    assert p.target[0] == (cap + 6) % 12

    def test_seam_transposition_families(self):
        """cap%3 family rules: family-0 has a transposed -x seam to cap+3
        (Full_parallel_related.c:536-550)."""
        from g4s_tpu.parallel import sphere
        p = sphere.face_neighbor(0, 0, 0, 0, "-x", 1, 1, 1)
        assert p.target[0] == 3 and p.transposed
        p = sphere.face_neighbor(1, 0, 0, 0, "-x", 1, 1, 1)
        assert p.target[0] == 3 and not p.transposed

    def test_interior_passes_plain(self):
        from g4s_tpu.parallel import sphere
        t = sphere.build_pass_tables(3, 3, 1)
        center = t[(0, 1, 1, 0)]
        faces = [p for p in center if p.kind == "face"]
        assert all(not p.transposed and p.target[0] == 0 for p in faces)

    def test_ppermute_pairs_shape(self):
        from g4s_tpu.parallel import sphere
        t = sphere.build_pass_tables(1, 1, 1)
        pairs = sphere.ppermute_pairs(t, 1, 1, 1, kind="face")
        assert len(pairs) == 48       # 12 caps x 4 faces
        srcs = [a for a, b in pairs]
        assert len(set((a, b) for a, b in pairs)) == 48


class TestDistSpMV:
    def test_row_sharded_spmv(self, rng):
        import scipy.sparse as sp
        from jax.sharding import Mesh
        from g4s_tpu.ops.dist_spmv import dist_spmv, shard_rows_ell
        from g4s_tpu.sparse import CSR
        A = CSR.from_scipy(sp.random(100, 64, density=0.1,
                                     random_state=np.random.RandomState(3),
                                     format="csr"))
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("rows",))
        cols, vals, rows_per, shape = shard_rows_ell(A, 4)
        x = jnp.asarray(rng.normal(size=64))
        y = dist_spmv(mesh, "rows", cols, vals, shape, x)
        ref = A.to_scipy() @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(y).reshape(-1)[:100], ref,
                                   rtol=1e-10)


class TestDistSpGEMM:
    def test_row_sharded_matches_scipy(self):
        """Multi-chip SpGEMM (BIN.h row-partition strategy on devices):
        per-block plans + shard_map numeric reproduce scipy exactly,
        including skewed inputs with empty blocks."""
        import scipy.sparse as sp
        from jax.sharding import Mesh
        from g4s_tpu.ops.dist_spgemm import dist_spgemm
        from g4s_tpu.sparse import dense_to_csr
        A = sp.random(500, 400, density=0.03, format="csr", random_state=0)
        B = sp.random(400, 300, density=0.03, format="csr", random_state=1)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("r",))
        C = dist_spgemm(dense_to_csr(A.toarray()),
                        dense_to_csr(B.toarray()), mesh, "r")
        Cs = sp.csr_matrix((np.asarray(C.data), np.asarray(C.indices),
                            np.asarray(C.indptr)), shape=C.shape)
        assert abs((Cs - A @ B).toarray()).max() == 0.0
        A2 = sp.vstack([sp.random(10, 400, density=0.2, format="csr",
                                  random_state=2),
                        sp.csr_matrix((490, 400))]).tocsr()
        C2 = dist_spgemm(dense_to_csr(A2.toarray()),
                         dense_to_csr(B.toarray()), mesh, "r")
        C2s = sp.csr_matrix((np.asarray(C2.data), np.asarray(C2.indices),
                             np.asarray(C2.indptr)), shape=C2.shape)
        assert abs((C2s - A2 @ B).toarray()).max() == 0.0
