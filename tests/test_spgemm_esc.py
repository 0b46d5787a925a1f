"""Gather-free ESC SpGEMM vs scipy oracle (ops/spgemm_esc.py)."""

import numpy as np
import pytest
import scipy.sparse as sp

from g4s_tpu.ops.spgemm_esc import (esc_numeric, esc_plan, spgemm_esc,
                                    spgemm_esc_col)
from g4s_tpu.sparse.containers import CSR


def _check(A_s, B_s, rtol=2e-5):
    A, B = CSR.from_scipy(A_s.tocsr()), CSR.from_scipy(B_s.tocsr())
    plan = esc_plan(A, B)
    C = spgemm_esc(A, B, plan=plan)
    ref = (A_s.astype(np.float64) @ B_s.astype(np.float64)).tocsr()
    ref.sort_indices()
    ref.eliminate_zeros()
    got = sp.csr_matrix((np.array(C.data, np.float64),
                         np.array(C.indices), np.array(C.indptr)),
                        shape=C.shape)
    got.eliminate_zeros()
    # structure without numerically-cancelled zeros must match exactly
    dense_ref = ref.toarray()
    dense_got = got.toarray()
    np.testing.assert_allclose(dense_got, dense_ref, rtol=rtol,
                               atol=rtol * max(1.0, np.abs(dense_ref).max()))
    return plan


class TestESC:
    def test_small_dense_oracle(self, rng):
        A = sp.random(40, 30, density=0.2, random_state=np.random.RandomState(3),
                      format="csr", dtype=np.float32)
        B = sp.random(30, 50, density=0.15,
                      random_state=np.random.RandomState(4), format="csr",
                      dtype=np.float32)
        _check(A, B)

    def test_square_er(self, rng):
        A = sp.random(500, 500, density=16 / 500,
                      random_state=np.random.RandomState(5), format="csr",
                      dtype=np.float32)
        _check(A, A)

    def test_skewed_rmat_like(self, rng):
        # power-law row/col degrees: stresses the class binning
        r = np.random.RandomState(7)
        n, nnz = 800, 12000
        rows = np.minimum((n * r.power(0.25, nnz)).astype(int), n - 1)
        cols = np.minimum((n * r.power(0.25, nnz)).astype(int), n - 1)
        A = sp.coo_matrix((r.randn(nnz).astype(np.float32), (rows, cols)),
                          shape=(n, n)).tocsr()
        A.sum_duplicates()
        plan = _check(A, A)
        assert plan.flops > 0

    def test_rectangular_chain(self, rng):
        A = sp.random(120, 60, density=0.1,
                      random_state=np.random.RandomState(8), format="csr",
                      dtype=np.float32)
        B = sp.random(60, 200, density=0.08,
                      random_state=np.random.RandomState(9), format="csr",
                      dtype=np.float32)
        _check(A, B)

    def test_f64(self, rng):
        A = sp.random(300, 300, density=0.05,
                      random_state=np.random.RandomState(10), format="csr",
                      dtype=np.float64)
        _check(A, A, rtol=1e-12)

    def test_plan_reuse_new_values(self, rng):
        A_s = sp.random(200, 200, density=0.08,
                        random_state=np.random.RandomState(11), format="csr",
                        dtype=np.float32)
        A = CSR.from_scipy(A_s)
        plan = esc_plan(A, A)
        d1 = esc_numeric(np.asarray(A.data), np.asarray(A.data), plan)
        new_vals = np.asarray(A.data) * 2.5
        d2 = np.asarray(esc_numeric(new_vals, new_vals, plan))
        np.testing.assert_allclose(d2, 6.25 * np.asarray(d1), rtol=1e-6)

    def test_structure_matches_scipy(self, rng):
        A_s = sp.random(150, 150, density=0.1,
                        random_state=np.random.RandomState(12), format="csr",
                        dtype=np.float32)
        A = CSR.from_scipy(A_s)
        plan = esc_plan(A, A)
        ref = (A_s @ A_s).tocsr()
        ref.sort_indices()
        np.testing.assert_array_equal(plan.c_indptr, ref.indptr)
        np.testing.assert_array_equal(plan.c_indices, ref.indices)

    def test_column_merge_csc(self, rng):
        # heap-role engine: CSC out, rows sorted within columns
        A_s = sp.random(180, 140, density=0.08,
                        random_state=np.random.RandomState(13), format="csr",
                        dtype=np.float32)
        B_s = sp.random(140, 90, density=0.1,
                        random_state=np.random.RandomState(14), format="csr",
                        dtype=np.float32)
        C = spgemm_esc_col(CSR.from_scipy(A_s), CSR.from_scipy(B_s))
        ref = (A_s @ B_s).tocsc()
        ref.sort_indices()
        np.testing.assert_array_equal(np.asarray(C.indptr), ref.indptr)
        np.testing.assert_array_equal(np.asarray(C.indices), ref.indices)
        np.testing.assert_allclose(np.asarray(C.data), ref.data, rtol=2e-5)
        # in-column rows sorted by construction
        for c in range(C.shape[1]):
            s, e = int(C.indptr[c]), int(C.indptr[c + 1])
            seg = np.asarray(C.indices[s:e])
            assert np.all(np.diff(seg) > 0)

    def test_plan_streams_are_int32(self, rng):
        # int64 streams would overflow under jax's default x64-off cast
        # (the sentinel-rank bug): keep every shipped stream int32
        A_s = sp.random(100, 100, density=0.05,
                        random_state=np.random.RandomState(15), format="csr",
                        dtype=np.float32)
        # ensure some inactive entries exist (empty B row hit by A)
        A_s = A_s.tolil()
        A_s[:, 50] = 0.0
        A_s[3, 50] = 1.0   # A uses column 50, B row 50 is empty
        A_s = A_s.tocsr()
        A_s.eliminate_zeros()
        B_s = A_s.copy().tolil()
        B_s[50, :] = 0.0
        B_s = B_s.tocsr()
        B_s.eliminate_zeros()
        plan = esc_plan(CSR.from_scipy(A_s), CSR.from_scipy(B_s))
        for f in ("a_rank", "b_rank", "d_a", "d_b", "d_pad", "off_c",
                  "d_head"):
            assert np.asarray(getattr(plan, f)).dtype == np.int32, f
        _check(A_s, B_s)

    def test_engine_mxm_accepts_esc_plan(self, rng):
        # the dispatcher's accelerator path: mxm with a pinned ESCPlan
        from g4s_tpu.engine.dispatch import mxm
        A_s = sp.random(120, 120, density=0.1,
                        random_state=np.random.RandomState(16), format="csr",
                        dtype=np.float32)
        A = CSR.from_scipy(A_s)
        plan = esc_plan(A, A)
        C = mxm(A, A, plan=plan)
        ref = (A_s @ A_s).tocsr()
        ref.sort_indices()
        np.testing.assert_array_equal(np.asarray(C.indptr), ref.indptr)
        np.testing.assert_allclose(np.asarray(C.data), ref.data, rtol=2e-5)

    def test_empty_rows_cols(self, rng):
        # rows/cols with no entries and inactive inner indices
        A = sp.csr_matrix((np.array([1.0, 2.0, 3.0], np.float32),
                           np.array([1, 3, 1]),
                           np.array([0, 2, 2, 3, 3])), shape=(4, 5))
        B = sp.csr_matrix((np.array([4.0, 5.0], np.float32),
                           np.array([0, 2]),
                           np.array([0, 1, 1, 1, 2, 2])), shape=(5, 3))
        _check(A, B)


@pytest.mark.parametrize("order_by", ["row", "col"])
def test_native_plan_bit_identical_to_numpy(rng, order_by, monkeypatch):
    """The C++ plan core (g4s_esc_plan_core) must emit bit-identical plan
    arrays to the numpy fallback — the numeric phase consumes every one of
    them, so any divergence is silent corruption."""
    import g4s_tpu.runtime.native_lib as nl
    if nl.get_lib() is None:
        pytest.skip("native library unavailable")
    A_s = sp.random(300, 260, density=0.06,
                    random_state=np.random.RandomState(21), format="csr",
                    dtype=np.float32)
    B_s = sp.random(260, 340, density=0.05,
                    random_state=np.random.RandomState(22), format="csr",
                    dtype=np.float32)
    A, B = CSR.from_scipy(A_s), CSR.from_scipy(B_s)
    p_nat = esc_plan(A, B, order_by=order_by)
    monkeypatch.setattr(nl, "esc_plan_core_native",
                        lambda *a, **k: None)
    p_np = esc_plan(A, B, order_by=order_by)
    for f in ("a_rank", "b_rank", "d_a", "d_b", "d_pad", "keys", "off_c",
              "d_head", "c_indptr", "c_indices"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p_nat, f)), np.asarray(getattr(p_np, f)), f)
    for f in ("nnz", "flops", "na", "nb_len", "m2", "t_a", "t_b", "t_pad",
              "t_sum", "t_head", "classes", "shape"):
        assert getattr(p_nat, f) == getattr(p_np, f), f
    assert p_nat.keys_minor is None and p_np.keys_minor is None


def test_native_plan_identity_two_key(rng, monkeypatch):
    """Two-key (m*n >= 2^31) native plan matches the numpy fallback."""
    import g4s_tpu.runtime.native_lib as nl
    if nl.get_lib() is None:
        pytest.skip("native library unavailable")
    n, nnz = 70000, 8000
    A_s = sp.coo_matrix(
        (rng.standard_normal(nnz).astype(np.float32),
         (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
        shape=(n, n)).tocsr()
    A_s.sum_duplicates()
    A = CSR.from_scipy(A_s)
    p_nat = esc_plan(A, A)
    monkeypatch.setattr(nl, "esc_plan_core_native",
                        lambda *a, **k: None)
    p_np = esc_plan(A, A)
    assert p_nat.keys_minor is not None
    for f in ("a_rank", "b_rank", "d_a", "d_b", "d_pad", "keys",
              "keys_minor", "off_c", "d_head", "c_indptr", "c_indices"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p_nat, f)), np.asarray(getattr(p_np, f)), f)
    assert (p_nat.nnz, p_nat.flops) == (p_np.nnz, p_np.flops)


@pytest.fixture
def _interpret(monkeypatch):
    """Run Pallas route kernels in interpreter mode (CPU test env)."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k))


class TestESCRouted:
    """Routed numeric (Benes routes replace sort + compactions) must
    reproduce the sort-based engine bit-for-bit structure-wise and match
    its sums up to addition order."""

    def test_routed_matches_sorted(self, rng, _interpret):
        from g4s_tpu.ops.spgemm_esc import (esc_numeric_routed,
                                            esc_route_plan)
        A_s = sp.random(256, 256, density=4 / 256,
                        random_state=np.random.RandomState(11),
                        format="csr", dtype=np.float32)
        A = CSR.from_scipy(A_s)
        rp = esc_route_plan(A, A)
        c_sorted = np.asarray(esc_numeric(
            np.asarray(A.data), np.asarray(A.data), rp.plan))
        c_routed = np.asarray(esc_numeric_routed(
            np.asarray(A.data), np.asarray(A.data), rp))
        np.testing.assert_allclose(c_routed, c_sorted, rtol=1e-6)
        C = (A_s.astype(np.float64) @ A_s.astype(np.float64)).tocsr()
        C.sort_indices()
        np.testing.assert_allclose(c_routed, C.data, rtol=1e-5, atol=1e-6)

    def test_routed_skewed_col_order(self, rng, _interpret):
        from g4s_tpu.ops.spgemm_esc import (esc_numeric_routed,
                                            esc_route_plan)
        r = np.random.RandomState(13)
        n, nnz = 300, 3000
        rows = np.minimum((n * r.power(0.3, nnz)).astype(int), n - 1)
        cols = np.minimum((n * r.power(0.3, nnz)).astype(int), n - 1)
        A_s = sp.coo_matrix(
            (r.randn(nnz).astype(np.float32), (rows, cols)),
            shape=(n, n)).tocsr()
        A_s.sum_duplicates()
        A = CSR.from_scipy(A_s)
        rp = esc_route_plan(A, A, order_by="col")
        c = np.asarray(esc_numeric_routed(
            np.asarray(A.data), np.asarray(A.data), rp))
        C = (A_s.astype(np.float64) @ A_s.astype(np.float64)).tocsc()
        C.sort_indices()
        assert rp.plan.nnz == C.nnz
        np.testing.assert_allclose(c, C.data, rtol=1e-5, atol=1e-6)


def test_two_key_sort_large_keyspace(rng):
    """m*n >= 2^31 switches the device merge to the int32 (major, minor)
    two-key stable sort (no int64 keys on device)."""
    import scipy.sparse as sp
    from g4s_tpu.ops.spgemm_esc import esc_numeric, esc_plan
    from g4s_tpu.sparse import CSR
    n = 70000                     # n*n ~ 4.9e9 > 2^31
    nnz = 30000
    A_s = sp.coo_matrix(
        (rng.standard_normal(nnz).astype(np.float32),
         (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
        shape=(n, n)).tocsr()
    A = CSR.from_scipy(A_s)
    plan = esc_plan(A, A)
    assert plan.keys_minor is not None
    c = esc_numeric(np.asarray(A.data), np.asarray(A.data), plan)
    C = (A_s.astype(np.float64) @ A_s.astype(np.float64)).tocsr()
    C.sort_indices()
    assert plan.nnz == C.nnz
    np.testing.assert_allclose(np.asarray(c), C.data, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(plan.c_indices, C.indices)


class TestDevicePlan:
    """esc_plan_device: the O(flop) symbolic passes on the device must
    agree with the host plan exactly (same nnz, same numeric output,
    same materialized C structure)."""

    def _check(self, A_s, B_s, order_by="row"):
        from g4s_tpu.ops.spgemm_esc import (esc_plan_device,
                                            materialize_structure)
        A, B = CSR.from_scipy(A_s), CSR.from_scipy(B_s)
        ph = esc_plan(A, B, order_by=order_by)
        pd = esc_plan_device(A, B, order_by=order_by)
        assert (ph.nnz, ph.flops) == (pd.nnz, pd.flops)
        ch = esc_numeric(np.asarray(A.data), np.asarray(B.data),
                         ph.to_device())
        cd = esc_numeric(np.asarray(A.data), np.asarray(B.data), pd)
        np.testing.assert_allclose(np.asarray(ch), np.asarray(cd),
                                   rtol=1e-6)
        ip, ix = materialize_structure(pd)
        np.testing.assert_array_equal(ip, ph.c_indptr)
        np.testing.assert_array_equal(ix, ph.c_indices)

    def test_rectangular(self, rng):
        A_s = sp.random(300, 280, density=0.02, random_state=rng,
                        format="csr", dtype=np.float32)
        B_s = sp.random(280, 250, density=0.02, random_state=rng,
                        format="csr", dtype=np.float32)
        self._check(A_s, B_s)

    def test_square_er(self, rng):
        A_s = sp.random(500, 500, density=0.01, random_state=rng,
                        format="csr", dtype=np.float32)
        self._check(A_s, A_s)

    def test_column_merge(self, rng):
        A_s = sp.random(300, 300, density=0.02, random_state=rng,
                        format="csr", dtype=np.float32)
        self._check(A_s, A_s, order_by="col")

    def test_two_key_large_keyspace(self, rng):
        n = 50000   # n*n >= 2^31 -> (major, minor) int32 pair sort
        A_s = sp.random(n, n, density=2e-5, random_state=rng,
                        format="csr", dtype=np.float32)
        self._check(A_s, A_s)


class TestBlockESC:
    """Block-ESC engine (ops/spgemm_block.py): the ESC machinery at
    bs x bs node-block granularity — the FE-stiffness-shaped SpGEMM
    tier (3 dofs/node, Element_calculations.c:475-509 sparsity; the
    reference's suite_sparse corpus members, mkl_spgemm.cpp:19-37)."""

    def _mk(self, rng, mb, nb, bs, dens, holes=0.0):
        pat = sp.random(mb, nb, dens, random_state=rng, format="csr")
        data = np.random.default_rng(7).normal(
            size=(pat.nnz, bs, bs)).astype(np.float32)
        M = sp.bsr_matrix((data, pat.indices, pat.indptr),
                          shape=(mb * bs, nb * bs),
                          blocksize=(bs, bs)).tocsr()
        if holes:
            keep = np.random.default_rng(8).random(M.nnz) > holes
            M.data[~keep] = 0.0
            M.eliminate_zeros()
        M.sort_indices()
        return M

    def _check(self, A_s, B_s, bs):
        from g4s_tpu.ops.spgemm_block import (block_c_to_scipy,
                                              spgemm_block)
        a, b = CSR.from_scipy(A_s), CSR.from_scipy(B_s)
        bp, cd = spgemm_block(a, b, bs)
        got = block_c_to_scipy(bp, cd).astype(np.float64)
        ref = (A_s.astype(np.float64) @ B_s.astype(np.float64)).tocsr()
        ref.eliminate_zeros()
        np.testing.assert_allclose(got.toarray(), ref.toarray(),
                                   rtol=2e-5,
                                   atol=2e-5 * max(1.0,
                                                   abs(ref).max()))

    def test_rect_with_holes(self, rng):
        """Imperfect block cover (eliminate_zeros holes) — the missing
        scalar entries must read as explicit zeros, and the pruned
        result must match scipy exactly."""
        A = self._mk(rng, 24, 18, 3, 0.15, holes=0.2)
        B = self._mk(rng, 18, 14, 3, 0.15, holes=0.2)
        self._check(A, B, 3)

    def test_square_reuse_bs2(self, rng):
        """bs=2, A @ A shared-pattern path + plan reuse across value
        updates (the stiffness-reassembly workload)."""
        from g4s_tpu.ops.spgemm_block import (block_c_to_scipy,
                                              block_numeric, block_plan)
        A = self._mk(rng, 30, 30, 2, 0.12, holes=0.1)
        a = CSR.from_scipy(A)
        bp = block_plan(a, a, 2)
        A2 = A.copy()
        A2.data = A2.data * 1.7 - 0.3
        got = block_c_to_scipy(
            bp, block_numeric(np.asarray(A2.data), np.asarray(A2.data),
                              bp)).astype(np.float64)
        ref = (A2.astype(np.float64) @ A2.astype(np.float64)).tocsr()
        ref.eliminate_zeros()
        np.testing.assert_allclose(got.toarray(), ref.toarray(),
                                   rtol=2e-5,
                                   atol=2e-5 * abs(ref).max())

    def test_block_cover_stat(self, rng):
        from g4s_tpu.ops.spgemm_block import block_cover
        A = self._mk(rng, 20, 20, 3, 0.2)
        assert block_cover(CSR.from_scipy(A), 3) == pytest.approx(1.0)
        assert block_cover(CSR.from_scipy(A), 7) == 0.0  # indivisible
        Ah = self._mk(rng, 20, 20, 3, 0.2, holes=0.3)
        c = block_cover(CSR.from_scipy(Ah), 3)
        assert 0.5 < c < 0.95


class TestFamilyBucketed:
    """Family-bucketed device symbolic (esc_plan_device_family): one
    compiled executable pair serves every matrix whose classes fit the
    canonical menu — the drifting-sparsity re-plan workload
    (hash_mult.h:495-508's repeated symbolic role)."""

    def _product(self, A_s, plan):
        from g4s_tpu.ops.spgemm_esc import (esc_numeric,
                                            materialize_structure)
        d = np.asarray(A_s.data, np.float32)
        c = np.asarray(esc_numeric(d, d, plan))[: plan.nnz_real]
        ip, ix = materialize_structure(plan)
        got = sp.csr_matrix((c.astype(np.float64), ix, ip),
                            shape=plan.shape)
        got.eliminate_zeros()
        ref = (A_s.astype(np.float64) @ A_s.astype(np.float64)).tocsr()
        ref.sort_indices()
        ref.eliminate_zeros()
        np.testing.assert_allclose(
            got.toarray(), ref.toarray(), rtol=2e-5,
            atol=2e-5 * max(1.0, abs(ref).max()))

    def test_family_reuse_no_recompile(self, rng):
        from g4s_tpu.ops.spgemm_esc import (_esc_symbolic_family,
                                            esc_plan_device_family)
        from g4s_tpu.sparse.containers import CSR as _CSR
        n0 = _esc_symbolic_family._cache_size()
        fam = None
        fams = []
        for seed in (11, 12, 13):
            A_s = sp.random(400, 400, density=0.02,
                            random_state=seed, format="csr",
                            dtype=np.float32)
            plan, fam = esc_plan_device_family(
                _CSR.from_scipy(A_s), _CSR.from_scipy(A_s), fam)
            fams.append(fam)
            self._product(A_s, plan)
        # instances 2 and 3 must have reused instance 1's family and
        # its compiled symbolic executable
        assert fams[1] is fams[0] or fams[1] == fams[0]
        assert _esc_symbolic_family._cache_size() - n0 <= 1
