"""Sparse containers, conversions, Matrix-Market IO vs scipy oracle."""

import numpy as np
import pytest
import scipy.sparse as sp

from g4s_tpu.sparse import (
    COO, CSR, coo_to_csr, coo_to_csc, csc_to_csr, csr_to_csc, csr_to_coo,
    csr_to_dense, csr_to_ell, csr_to_sell, dense_to_csr, merge_duplicates,
    crop, read_mtx, read_mtx_csr, write_mtx, csr_allclose, error_tolerant_equal,
)


def random_csr(rng, n_rows=60, n_cols=40, density=0.1) -> CSR:
    m = sp.random(n_rows, n_cols, density=density, random_state=np.random.RandomState(7),
                  format="csr", dtype=np.float64)
    m.data = rng.normal(size=m.data.shape)
    return CSR.from_scipy(m)


def test_coo_csr_roundtrip(rng):
    a = random_csr(rng)
    b = coo_to_csr(csr_to_coo(a))
    assert csr_allclose(a, b, 0.0)


def test_csr_csc_roundtrip(rng):
    a = random_csr(rng)
    b = csc_to_csr(csr_to_csc(a))
    assert csr_allclose(a, b, 0.0)
    # against scipy
    c = csr_to_csc(a)
    np.testing.assert_array_equal(np.asarray(c.indptr), a.to_scipy().tocsc().indptr)


def test_dense_roundtrip(rng):
    a = random_csr(rng)
    d = csr_to_dense(a)
    np.testing.assert_allclose(d, a.to_scipy().toarray())
    b = dense_to_csr(d)
    np.testing.assert_allclose(csr_to_dense(b), d)


def test_merge_duplicates():
    coo = COO(np.array([0, 0, 1, 0]), np.array([1, 1, 2, 1]),
              np.array([1.0, 2.0, 5.0, 3.0]), (2, 3))
    m = merge_duplicates(coo_to_csr(coo))
    assert m.nnz == 2
    d = csr_to_dense(m)
    np.testing.assert_allclose(d, [[0, 6, 0], [0, 0, 5]])


def test_crop(rng):
    a = random_csr(rng, 50, 50)
    c = crop(a, 30, 20)
    np.testing.assert_allclose(csr_to_dense(c), a.to_scipy().toarray()[:30, :20])


def test_ell_roundtrip(rng):
    a = random_csr(rng)
    e = csr_to_ell(a, pad_to=8)
    assert e.cols.shape[1] % 8 == 0
    # reconstruct dense from ELL
    d = np.zeros(a.shape)
    for i in range(a.shape[0]):
        for k in range(e.cols.shape[1]):
            d[i, e.cols[i, k]] += e.vals[i, k]
    np.testing.assert_allclose(d, csr_to_dense(a))


def test_sell_covers_all_rows(rng):
    a = random_csr(rng, 100, 80, 0.05)
    s = csr_to_sell(a, slice_height=32)
    assert sum(s.slice_rows) == 100
    assert sorted(np.asarray(s.perm).tolist()) == list(range(100))
    np.testing.assert_array_equal(
        np.asarray(s.perm)[np.asarray(s.iperm)], np.arange(100))


def test_sell_waste_bounded_binning(rng):
    # power-law degrees: one hub row plus a light tail
    import scipy.sparse as sp
    n = 300
    rows, cols = [], []
    for i in range(n):
        deg = max(1, int(200 / (i + 1)))
        rows += [i] * deg
        cols += list(rng.integers(0, n, deg))
    m = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n)).tocsr()
    m.sum_duplicates()
    a = CSR(m.indptr.astype(np.int32), m.indices.astype(np.int32),
            m.data, (n, n))
    s = csr_to_sell(a, max_waste=0.5)
    assert sum(s.slice_rows) == n
    deg = np.diff(np.asarray(a.indptr))
    # per-slice padding waste bounded: width <= (1 + max_waste) * min row deg
    # (up to the pad_to rounding floor)
    r0 = 0
    for sl, nr in zip(s.slices, s.slice_rows):
        rows_here = np.asarray(s.perm)[r0:r0 + nr]
        w = sl.cols.shape[1]
        assert w <= max(1.5 * deg[rows_here].min(), 8) + 8
        r0 += nr
    # numerics identical to dense
    from g4s_tpu.ops import spmv_sell
    x = rng.standard_normal(n)
    y = np.asarray(spmv_sell(s.to_device(), x))
    np.testing.assert_allclose(y, csr_to_dense(a) @ x, rtol=1e-10)


def test_mtx_roundtrip(tmp_path, rng):
    a = random_csr(rng, 20, 30, 0.2)
    p = tmp_path / "m.mtx"
    write_mtx(p, csr_to_coo(a))
    b = read_mtx_csr(p)
    assert csr_allclose(a, b, 1e-14)


def test_mtx_symmetric_expansion(tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% a comment\n"
        "3 3 4\n"
        "1 1 2.0\n"
        "2 1 -1.0\n"
        "3 2 4.0\n"
        "3 3 1.0\n")
    m = read_mtx_csr(p)
    d = csr_to_dense(m)
    np.testing.assert_allclose(d, [[2, -1, 0], [-1, 0, 4], [0, 4, 1]])


def test_mtx_skew_and_pattern(tmp_path):
    p = tmp_path / "k.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "2 2 1\n"
        "2 1 3.0\n")
    d = csr_to_dense(read_mtx_csr(p))
    np.testing.assert_allclose(d, [[0, -3], [3, 0]])

    q = tmp_path / "p.mtx"
    q.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "2 3 2\n"
        "1 3\n"
        "2 1\n")
    d = csr_to_dense(read_mtx_csr(q))
    np.testing.assert_allclose(d, [[0, 0, 1], [1, 0, 0]])


def test_mtx_rejects_bad_banner(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real hermitian\n1 1 1\n1 1 1.0\n")
    with pytest.raises(ValueError):
        read_mtx(p)


def test_error_tolerant_equal():
    assert error_tolerant_equal(1.0, 1.0, 0.0)
    assert error_tolerant_equal(1e20, 1e20 * (1 + 1e-10), 1e-8)
    assert not error_tolerant_equal(1.0, 1.1, 1e-8)
    assert error_tolerant_equal(0.0, -0.0, 0.0)


def test_pytree_jit(rng):
    import jax
    a = random_csr(rng).to_device()
    total = jax.jit(lambda m: m.data.sum())(a)
    np.testing.assert_allclose(float(total), float(np.sum(np.asarray(a.data))))


class TestNative:
    def test_native_lib_builds(self):
        from g4s_tpu.runtime.native_lib import get_lib
        assert get_lib() is not None

    def test_parse_numbers_matches_python(self):
        from g4s_tpu.runtime.native_lib import parse_numbers
        body = "1 2 3.5\n4 5 -6.25e-3\n7 8 9\n"
        out = parse_numbers(body, 3, 3)
        np.testing.assert_allclose(out, [[1, 2, 3.5], [4, 5, -6.25e-3],
                                         [7, 8, 9]])

    def test_native_spgemm_symbolic_matches_numpy(self):
        from g4s_tpu.ops.spgemm import spgemm_plan
        A = CSR.from_scipy(
            sp.random(60, 60, density=0.1,
                      random_state=np.random.RandomState(1), format="csr"))
        p1 = spgemm_plan(A, A, use_native=True)
        p2 = spgemm_plan(A, A, use_native=False)
        assert p1.nnz == p2.nnz and p1.flops == p2.flops
        np.testing.assert_array_equal(np.asarray(p1.c_indptr),
                                      np.asarray(p2.c_indptr))
        np.testing.assert_array_equal(np.asarray(p1.c_indices),
                                      np.asarray(p2.c_indices))
        np.testing.assert_array_equal(np.asarray(p1.slot), np.asarray(p2.slot))
        np.testing.assert_array_equal(np.asarray(p1.src_a), np.asarray(p2.src_a))


class TestGTgraph:
    def test_read_gtgraph(self, tmp_path):
        """DIMACS/GTgraph edge lists (mm/inc/graph.h consumers): 1-based
        arcs, duplicate edges merged by summation."""
        import numpy as np
        from g4s_tpu.sparse import csr_to_dense, read_gtgraph
        p = tmp_path / "g.gr"
        p.write_text("c sample\np sp 4 5\na 1 2 1.5\na 1 2 0.5\n"
                     "a 2 3 2.0\na 3 1 -1.0\na 4 4 9.0\n")
        c = read_gtgraph(str(p))
        d = np.asarray(csr_to_dense(c))
        assert d.shape == (4, 4)
        assert d[0, 1] == 2.0      # duplicates merged
        assert d[2, 0] == -1.0 and d[3, 3] == 9.0
