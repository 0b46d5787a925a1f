"""SpMV / SpGEMM / BLAS2 kernels vs scipy + numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from g4s_tpu.ops import (
    gemv, symv, trmv, spmv_packed, pack_symmetric,
    spmv_ell, spmv_sell, spmv_csr, spgemm, spgemm_plan, spgemm_flops,
)
from g4s_tpu.ops.spgemm import spgemm_numeric
from g4s_tpu.sparse import CSR, csr_to_ell, csr_to_sell, csr_allclose, dense_to_csr
from g4s_tpu.sparse.convert import coo_to_csr
from g4s_tpu.sparse.containers import COO


def random_csr(seed, n_rows=80, n_cols=64, density=0.08) -> CSR:
    m = sp.random(n_rows, n_cols, density=density,
                  random_state=np.random.RandomState(seed), format="csr")
    m.data = np.random.default_rng(seed).normal(size=m.data.shape)
    return CSR.from_scipy(m)


class TestBlas2:
    def setup_method(self, _):
        rng = np.random.default_rng(5)
        self.a = rng.normal(size=(48, 48))
        self.x = rng.normal(size=48)

    def test_gemv(self):
        np.testing.assert_allclose(gemv(self.a, self.x), self.a @ self.x, rtol=1e-12)

    def test_symv(self):
        s = np.triu(self.a) + np.triu(self.a, 1).T
        np.testing.assert_allclose(symv(self.a, self.x), s @ self.x, rtol=1e-12)

    def test_trmv(self):
        np.testing.assert_allclose(
            trmv(self.a, self.x), np.triu(self.a) @ self.x, rtol=1e-12)
        np.testing.assert_allclose(
            trmv(self.a, self.x, uplo="L"), np.tril(self.a) @ self.x, rtol=1e-12)

    def test_spmv_packed(self):
        s = np.triu(self.a) + np.triu(self.a, 1).T
        ap = pack_symmetric(s)
        assert ap.size == 48 * 49 // 2
        np.testing.assert_allclose(spmv_packed(ap, self.x), s @ self.x, rtol=1e-12)


class TestSpMV:
    def setup_method(self, _):
        self.A = random_csr(0)
        self.x = np.random.default_rng(1).normal(size=self.A.shape[1])
        self.ref = self.A.to_scipy() @ self.x

    def test_ell(self):
        y = spmv_ell(csr_to_ell(self.A).to_device(), jnp.asarray(self.x))
        np.testing.assert_allclose(np.asarray(y), self.ref, rtol=1e-12)

    def test_sell(self):
        y = spmv_sell(csr_to_sell(self.A, slice_height=16).to_device(),
                      jnp.asarray(self.x))
        np.testing.assert_allclose(np.asarray(y), self.ref, rtol=1e-12)

    def test_csr(self):
        y = spmv_csr(self.A.to_device(), jnp.asarray(self.x))
        np.testing.assert_allclose(np.asarray(y), self.ref, rtol=1e-12)

    def test_jit_and_grad(self):
        ell = csr_to_ell(self.A).to_device()
        f = jax.jit(lambda v: spmv_ell(ell, v).sum())
        g = jax.grad(f)(jnp.asarray(self.x))
        # d/dx sum(Ax) = column sums of A
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(self.A.to_scipy().sum(axis=0)).ravel(),
            rtol=1e-10)

    def test_empty_rows(self):
        coo = COO(np.array([2]), np.array([1]), np.array([3.0]), (4, 3))
        A = coo_to_csr(coo)
        x = np.array([1.0, 2.0, 3.0])
        for y in (spmv_csr(A.to_device(), jnp.asarray(x)),
                  spmv_ell(csr_to_ell(A).to_device(), jnp.asarray(x))):
            np.testing.assert_allclose(np.asarray(y), [0, 0, 6.0, 0])


class TestSpGEMM:
    def test_square(self):
        A = random_csr(2, 60, 60, 0.1)
        C = spgemm(A, A)
        ref = (A.to_scipy() @ A.to_scipy()).toarray()
        np.testing.assert_allclose(
            np.asarray(C.to_scipy().toarray()), ref, rtol=1e-10, atol=1e-12)

    def test_rect(self):
        A = random_csr(3, 40, 70, 0.1)
        B = random_csr(4, 70, 30, 0.1)
        C = spgemm(A, B)
        ref = (A.to_scipy() @ B.to_scipy()).toarray()
        np.testing.assert_allclose(C.to_scipy().toarray(), ref, rtol=1e-10, atol=1e-12)

    def test_structure_exact(self):
        A = random_csr(5, 50, 50, 0.06)
        plan = spgemm_plan(A, A)
        ref = A.to_scipy() @ A.to_scipy()
        ref.sum_duplicates()
        ref.sort_indices()
        # scipy may keep explicit zeros; compare nnz of our exact structure
        assert plan.nnz == ref.nnz
        np.testing.assert_array_equal(np.asarray(plan.c_indptr), ref.indptr)
        np.testing.assert_array_equal(np.asarray(plan.c_indices), ref.indices)

    def test_plan_reuse_new_values(self):
        A = random_csr(6, 30, 30, 0.1)
        plan = spgemm_plan(A, A)
        rng = np.random.default_rng(9)
        new_vals = rng.normal(size=A.nnz)
        A2 = CSR(A.indptr, A.indices, new_vals, A.shape)
        c_data = spgemm_numeric(jnp.asarray(new_vals), jnp.asarray(new_vals),
                                plan.to_device())
        C = CSR(plan.c_indptr, plan.c_indices, np.asarray(c_data), plan.shape)
        ref = (A2.to_scipy() @ A2.to_scipy()).toarray()
        np.testing.assert_allclose(C.to_scipy().toarray(), ref, rtol=1e-10, atol=1e-12)

    def test_flops(self):
        A = random_csr(7, 20, 20, 0.2)
        dense = (A.to_scipy() != 0).astype(np.int64)
        ref_products = int((np.asarray(dense.toarray()) @ dense.toarray().T != -1).sum() * 0)
        # direct count: for each a_ik, deg_B(k)
        degB = np.diff(A.to_scipy().indptr)
        expected = 2 * int(degB[A.to_scipy().indices].sum())
        assert spgemm_flops(A, A) == expected

    def test_dim_mismatch_raises(self):
        import pytest
        A = random_csr(8, 10, 20)
        B = random_csr(9, 30, 10)
        with pytest.raises(ValueError):
            spgemm_plan(A, B)


class TestEngine:
    def test_mxv_variants_agree(self):
        from g4s_tpu.engine import build_graph, mxv
        A = random_csr(10, 100, 100, 0.05)
        x = np.random.default_rng(2).normal(size=100)
        ref = A.to_scipy() @ x
        for variant in ("ell", "csr"):
            g = build_graph(A, variant=variant)
            y = mxv(g, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-11)

    def test_mxv_min_plus(self):
        from g4s_tpu.engine import build_graph, mxv, MIN_PLUS
        # min-plus mxv over A^T = one relaxation step of shortest paths:
        # y[i] = min_j (A^T[i,j] + x[j]) = min over incoming edges j->i.
        # Graph: 0 -3-> 1 -1-> 2 with self loops of weight 0; store A^T.
        coo = COO(np.array([0, 1, 1, 2, 2]), np.array([0, 0, 1, 1, 2]),
                  np.array([0.0, 3.0, 0.0, 1.0, 0.0]), (3, 3))
        A = coo_to_csr(coo)
        x = np.array([0.0, np.inf, np.inf])
        for variant in ("ell", "csr"):
            g = build_graph(A, variant=variant)
            y = np.asarray(mxv(g, jnp.asarray(x), semiring=MIN_PLUS))
            np.testing.assert_allclose(y, [0.0, 3.0, np.inf])
            # second relaxation reaches vertex 2
            y2 = np.asarray(mxv(g, jnp.asarray(y), semiring=MIN_PLUS))
            np.testing.assert_allclose(y2, [0.0, 3.0, 4.0])

    def test_gather_apply_matches_spmv(self):
        from g4s_tpu.engine import build_graph, gather_apply
        A = random_csr(11, 50, 50, 0.1)
        x = np.random.default_rng(3).normal(size=50)
        g = build_graph(A)
        y = gather_apply(g, jnp.asarray(x),
                         gather=lambda w, s: w * s,
                         apply=lambda acc: 2.0 * acc)
        np.testing.assert_allclose(np.asarray(y), 2 * (A.to_scipy() @ x), rtol=1e-11)

    def test_spmm_dense_abi(self):
        from g4s_tpu.engine import spmm_dense
        rng = np.random.default_rng(4)
        w = rng.normal(size=(10, 6))
        s = rng.normal(size=(10, 6))
        y = spmm_dense(jnp.asarray(w), jnp.asarray(s), gather=lambda a, b: a * b)
        np.testing.assert_allclose(np.asarray(y), (w * s).sum(axis=1), rtol=1e-12)


class TestPallasSpMV:
    def test_bwell_pack_and_interpret(self):
        """BWELL packing + kernel (interpret mode) vs scipy on a band."""
        import scipy.sparse as sp
        from jax.experimental import pallas as pl
        import g4s_tpu.ops.pallas_spmv as ps
        orig = pl.pallas_call
        pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
        try:
            n = 2048
            offs = np.r_[0, np.arange(1, 8), -np.arange(1, 9)]
            m = sp.diags([np.ones(n)] * len(offs), offs, shape=(n, n),
                         format="csr").astype(np.float64)
            A = CSR.from_scipy(m)
            packed = ps.pack_bwell(A, packs_per_tile=4)
            assert packed.width == 16
            x = jnp.asarray(np.random.default_rng(0).normal(size=n)
                            .astype(np.float32))
            y = ps.spmv_bwell(packed, x, packs_per_batch=2)
            ref = m @ np.asarray(x)
            np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
        finally:
            pl.pallas_call = orig

    def test_wsell_pack_and_interpret(self):
        """WSELL-K packing + general kernel (interpret mode) vs scipy on a
        multi-cluster matrix no single 256-lane window can serve."""
        import scipy.sparse as sp
        from jax.experimental import pallas as pl
        import g4s_tpu.ops.pallas_spmv as ps
        rng = np.random.default_rng(0)
        n = 2048
        rows, cols, vals = [], [], []
        for i in range(n):
            for o in (0, 1, -1, 400, -400, 900, -900):
                j = i + o + int(rng.integers(-2, 3))
                if 0 <= j < n:
                    rows.append(i)
                    cols.append(j)
                    vals.append(float(rng.normal()))
        m = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        m.sum_duplicates()
        packed = ps.pack_wsell(CSR.from_scipy(m.astype(np.float32)),
                               packs_per_tile=2)
        assert packed.k > 2          # genuinely multi-window
        orig = pl.pallas_call
        pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
        try:
            x = jnp.asarray(rng.normal(size=n).astype(np.float32))
            y = ps.spmv_wsell(packed, x)
            np.testing.assert_allclose(np.asarray(y), m @ np.asarray(x),
                                       atol=1e-4)
        finally:
            pl.pallas_call = orig

    def test_wsell_chain_and_block_sort(self):
        """v2 surface: spmv_wsell_chain is pad-in/pad-out and matches the
        sliced wrapper; wsell_block_sort_perm leaves window counts
        invariant and yields monotone K-groups (interpret mode)."""
        import scipy.sparse as sp
        from jax.experimental import pallas as pl
        import g4s_tpu.ops.pallas_spmv as ps
        rng = np.random.default_rng(5)
        n = 1024
        rows, cols, vals = [], [], []
        for i in range(n):
            # first half: narrow band (few windows); second half: extra
            # far clusters (more windows) -> heterogeneous packs
            offs = [0, 1, -1] if i < n // 2 else [0, 1, -1, 300, -300]
            for o in offs:
                j = i + o
                if 0 <= j < n:
                    rows.append(i)
                    cols.append(j)
                    vals.append(float(rng.normal()))
        m = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        m.sum_duplicates()
        a = CSR.from_scipy(m.astype(np.float32))
        sigma = ps.wsell_block_sort_perm(a)
        if sigma is not None:
            assert np.array_equal(np.sort(sigma), np.arange(n))
            m = m[sigma][:, sigma].tocsr()
            a = CSR.from_scipy(m.astype(np.float32))
        packed = ps.pack_wsell(a, packs_per_tile=2)
        ks = [kg for _, kg in packed.groups]
        assert sum(c for c, _ in packed.groups) == packed.lanes.shape[0]
        if sigma is not None:
            # block-sorted -> monotone groups over the real tiles (a
            # trailing K=1 group may cover chain-mode zero-pad tiles)
            real = ks[:-1] if len(ks) > 1 and ks[-1] == 1 else ks
            assert real == sorted(real)
        assert packed.lanes.dtype == jnp.int16
        orig = pl.pallas_call
        pl.pallas_call = lambda *a_, **k_: orig(*a_, interpret=True, **k_)
        try:
            x = rng.normal(size=n).astype(np.float32)
            n_pad = ps._chain_pad(packed)
            xp = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
                jnp.asarray(x))
            yp = ps.spmv_wsell_chain(packed, xp)
            assert yp.shape == (n_pad,)          # chainable: same length
            np.testing.assert_allclose(np.asarray(yp[:n]), m @ x,
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(yp[n:]), 0.0)
            y2 = ps.spmv_wsell(packed, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(y2), m @ x, atol=1e-4)
        finally:
            pl.pallas_call = orig

    def test_wsell_rejects_scattered(self):
        """Random scatter beyond k_max windows per pack must be rejected
        (dispatcher then falls back to ELL/CSR)."""
        import pytest
        import scipy.sparse as sp
        import g4s_tpu.ops.pallas_spmv as ps
        rng = np.random.default_rng(1)
        n = 1 << 14
        nnz = n * 4
        m = sp.coo_matrix(
            (np.ones(nnz, np.float32),
             (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
            shape=(n, n)).tocsr()
        m.sum_duplicates()
        with pytest.raises(ValueError):
            ps.pack_wsell(CSR.from_scipy(m), k_max=8)

    def test_wsell_rectangular_and_empty_rows(self):
        """Rectangular shape, empty rows, and uneven degrees pack and
        evaluate correctly (interpret mode)."""
        import scipy.sparse as sp
        from jax.experimental import pallas as pl
        import g4s_tpu.ops.pallas_spmv as ps
        rng = np.random.default_rng(2)
        n_r, n_c = 500, 700
        m = sp.random(n_r, n_c, density=0.004, random_state=3,
                      format="csr", dtype=np.float32)
        # band-localize columns so the pack fits few windows
        m = m.tocoo()
        m.col[:] = np.minimum(n_c - 1, (m.row * n_c) // n_r
                              + (m.col % 64))
        m = sp.coo_matrix((m.data, (m.row, m.col)),
                          shape=(n_r, n_c)).tocsr()
        m.sum_duplicates()
        packed = ps.pack_wsell(CSR.from_scipy(m), packs_per_tile=2)
        orig = pl.pallas_call
        pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
        try:
            x = jnp.asarray(rng.normal(size=n_c).astype(np.float32))
            y = ps.spmv_wsell(packed, x)
            np.testing.assert_allclose(np.asarray(y), m @ np.asarray(x),
                                       atol=1e-4)
        finally:
            pl.pallas_call = orig

    def test_bwell_rejects_wide_packs(self):
        """A pack whose columns span >= 256 must be rejected."""
        import pytest
        import g4s_tpu.ops.pallas_spmv as ps
        from g4s_tpu.sparse.convert import coo_to_csr
        from g4s_tpu.sparse.containers import COO
        n = 512
        # rows hitting both column 0 and column n-1 -> span ~ n
        rows = np.arange(n, dtype=np.int32)
        coo = COO(np.r_[rows, rows], np.r_[np.zeros(n, np.int32),
                                           np.full(n, n - 1, np.int32)],
                  np.ones(2 * n), (n, n))
        A = coo_to_csr(coo)
        with pytest.raises(ValueError):
            ps.pack_bwell(A)


class TestDIA:
    def test_dia_roundtrip_and_spmv(self):
        from g4s_tpu.sparse import csr_to_dia
        from g4s_tpu.ops import spmv_dia
        m = sp.diags([np.arange(1.0, 101.0)] * 3, [0, 2, -5],
                     shape=(100, 100), format="csr")
        A = CSR.from_scipy(m.tocsr())
        d = csr_to_dia(A).to_device()
        x = np.random.default_rng(0).normal(size=100)
        y = spmv_dia(d, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), m @ x, rtol=1e-12)

    def test_dispatcher_picks_dia_for_banded(self):
        from g4s_tpu.engine import build_graph, mxv
        m = sp.diags([np.ones(256)] * 5, [0, 1, -1, 2, -2],
                     shape=(256, 256), format="csr")
        A = CSR.from_scipy(m.tocsr())
        g = build_graph(A)
        assert g.variant == "dia"
        x = np.random.default_rng(1).normal(size=256)
        y = mxv(g, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), m @ x, rtol=1e-12)
        # random (non-banded) matrix should NOT pick dia
        g2 = build_graph(random_csr(0, 100, 100, 0.05))
        assert g2.variant != "dia"

    def test_gas_on_dia(self):
        from g4s_tpu.engine import build_graph, gather_apply
        m = sp.diags([np.full(64, 2.0)] * 3, [0, 1, -1],
                     shape=(64, 64), format="csr")
        A = CSR.from_scipy(m.tocsr())
        g = build_graph(A)
        assert g.variant == "dia"
        x = np.random.default_rng(2).normal(size=64)
        y = gather_apply(g, jnp.asarray(x), gather=lambda w, s: w * s,
                         apply=lambda a: a + 1.0)
        np.testing.assert_allclose(np.asarray(y), m @ x + 1.0, rtol=1e-12)

    def test_dia_rejects_min_plus(self):
        import pytest
        from g4s_tpu.engine import build_graph, mxv, MIN_PLUS
        m = sp.diags([np.ones(64)] * 3, [0, 1, -1], shape=(64, 64),
                     format="csr")
        g = build_graph(CSR.from_scipy(m.tocsr()))
        with pytest.raises(NotImplementedError):
            mxv(g, jnp.ones(64), semiring=MIN_PLUS)


class TestBWELLRowMode:
    def test_row_window_mode(self):
        """Per-gather-row windows admit matrices whose columns cluster
        locally but span globally (pack mode infeasible); interpret-mode
        kernel matches scipy."""
        import scipy.sparse as sp
        from jax.experimental import pallas as pl
        from g4s_tpu.ops import pallas_spmv as ps
        rng = np.random.default_rng(0)
        n, W = 2048, 16
        gr = n // 8
        bases = rng.integers(0, (n - 64) // 64, size=gr) * 64
        cols = (bases[:, None, None]
                + rng.integers(0, 64, size=(gr, 8, W))).reshape(-1)
        rows = np.repeat(np.arange(n), W)
        vals = rng.standard_normal(n * W).astype(np.float32)
        S = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
        S.sum_duplicates()
        a = CSR.from_scipy(S.astype(np.float32))
        import pytest
        with pytest.raises(ValueError):
            ps.pack_bwell(a, mode="pack")
        packed = ps.pack_bwell(a, mode="auto")
        assert packed.mode == "row"
        orig = pl.pallas_call
        pl.pallas_call = lambda *ar, **k: orig(*ar, interpret=True, **k)
        try:
            x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            y = np.asarray(ps.spmv_bwell(packed, x))
        finally:
            pl.pallas_call = orig
        ref = S @ np.asarray(x)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


class TestVxm:
    def test_vxm_all_layouts(self):
        """vxm (GraphBLAS dual): y = v^T A matches scipy transpose on
        DIA, ELL and CSR layouts; min_plus vxm performs the relaxation
        step vertex programs use."""
        import scipy.sparse as sp
        from g4s_tpu.engine.dispatch import build_graph, vxm
        from g4s_tpu.engine.semiring import MIN_PLUS
        from g4s_tpu.sparse import dense_to_csr
        rng = np.random.default_rng(0)
        n = 300
        offs = [-5, -2, 0, 3]
        S = sp.diags([rng.standard_normal(n - abs(o)) for o in offs],
                     offs, format="csr")
        g = build_graph(dense_to_csr(S.toarray()))
        assert g.variant == "dia"
        x = rng.standard_normal(n)
        assert np.abs(np.asarray(vxm(g, jnp.asarray(x)))
                      - S.T @ x).max() < 1e-12
        R = sp.random(200, 150, density=0.05, format="csr",
                      random_state=1)
        g2 = build_graph(dense_to_csr(R.toarray()))
        x2 = rng.standard_normal(200)
        assert np.abs(np.asarray(vxm(g2, jnp.asarray(x2)))
                      - R.T @ x2).max() < 1e-12
        g3 = build_graph(dense_to_csr(R.toarray()), variant="csr")
        assert np.abs(np.asarray(vxm(g3, jnp.asarray(x2)))
                      - R.T @ x2).max() < 1e-12
        # SSSP relaxation: d <- min(d, vxm_minplus(d))
        A = np.zeros((4, 4))
        A[0, 1], A[1, 2], A[0, 2] = 1.0, 2.0, 5.0
        gm = build_graph(dense_to_csr(A), variant="ell")
        d = jnp.asarray([0.0, np.inf, np.inf, np.inf])
        for _ in range(2):
            d = jnp.minimum(d, vxm(gm, d, semiring=MIN_PLUS))
        assert np.allclose(np.asarray(d)[:3], [0.0, 1.0, 3.0])


class TestDeviceSymbolicCSR:
    def test_one_shot_structure_on_device(self):
        """spgemm_device_csr: device expand/sort/merge discovers C's
        structure; host only splits keys into indptr/indices."""
        import scipy.sparse as sp
        from g4s_tpu.ops.spgemm import spgemm_device_csr
        from g4s_tpu.sparse import dense_to_csr
        A = sp.random(300, 250, density=0.04, format="csr", random_state=0)
        B = sp.random(250, 200, density=0.04, format="csr", random_state=1)
        C = spgemm_device_csr(dense_to_csr(A.toarray()),
                              dense_to_csr(B.toarray()))
        Cs = sp.csr_matrix((np.asarray(C.data), np.asarray(C.indices),
                            np.asarray(C.indptr)), shape=C.shape)
        # structure must be exact; values merge duplicate runs with tree
        # adds (Hillis-Steele scan), which reassociates vs scipy's
        # sequential accumulation -> ulp-level differences
        assert (Cs - A @ B).nnz <= (A @ B).nnz
        ref = (A @ B).toarray()
        assert Cs.nnz == sp.csr_matrix(ref).nnz
        assert abs((Cs.toarray() - ref)).max() <= 1e-14 * abs(ref).max()


class TestDF64:
    """Double-word f32 arithmetic (ops/df64.py) vs numpy f64 oracles."""

    def test_eft_ops(self):
        from g4s_tpu.ops import df64 as dfm
        rng = np.random.default_rng(0)
        a64 = rng.normal(size=4096) * np.exp(rng.normal(size=4096) * 3)
        b64 = rng.normal(size=4096) * np.exp(rng.normal(size=4096) * 3)
        xa, xb = dfm.from_f64(a64), dfm.from_f64(b64)
        for name, fn, ref in [("add", dfm.add, a64 + b64),
                              ("mul", dfm.mul, a64 * b64),
                              ("div", dfm.div, a64 / b64)]:
            got = dfm.to_f64(jax.jit(fn)(xa, xb))
            rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
            # input splitting alone carries ~2^-49; ops must not add more
            # than cancellation amplifies
            assert rel.max() < 5e-12, (name, rel.max())

    def test_dot_beats_f32(self):
        from g4s_tpu.ops import df64 as dfm
        rng = np.random.default_rng(1)
        v = rng.normal(size=30000)
        w = rng.normal(size=30000)
        got = dfm.to_f64(jax.jit(dfm.dot)(dfm.from_f64(v), dfm.from_f64(w)))
        ref = float(np.dot(v, w))
        assert abs(got - ref) / abs(ref) < 1e-12
        f32 = float(np.dot(v.astype(np.float32), w.astype(np.float32)))
        assert abs(got - ref) < abs(f32 - ref)

    def test_sqrt(self):
        from g4s_tpu.ops import df64 as dfm
        rng = np.random.default_rng(2)
        a = np.abs(rng.normal(size=1000)) + 1e-3
        got = dfm.to_f64(jax.jit(dfm.sqrt)(dfm.from_f64(a)))
        rel = np.abs(got - np.sqrt(a)) / np.sqrt(a)
        assert rel.max() < 1e-13

    def test_exp(self):
        """df exp vs libm f64: Cody-Waite reduction + df Taylor must stay
        within tens of 2^-49 ulps across the viscosity-law argument range
        (Viscosity_structures.c visc_from_T exponents)."""
        from g4s_tpu.ops import df64 as dfm
        rng = np.random.default_rng(3)
        x = np.concatenate([rng.uniform(-60, 60, 20000),
                            rng.uniform(-0.5, 0.5, 5000),
                            [0.0, 1.0, -1.0, 30.0, -30.0, 59.5, -59.5]])
        got = dfm.to_f64(jax.jit(dfm.exp)(dfm.from_f64(x)))
        rel = np.abs(got - np.exp(x)) / np.exp(x)
        assert rel.max() < 2e-13, rel.max()
        f32 = np.exp(x.astype(np.float32)).astype(np.float64)
        rel32 = np.abs(f32 - np.exp(x)) / np.exp(x)
        assert rel.max() < 1e-4 * rel32.max()   # far beyond f32 exp

    def test_log_pow(self):
        """df log (Newton on exp) and powf (df-split exponent — an
        f32-rounded c would leak |log x| * 2^-24): the SDEPV power-law
        viscosity arithmetic."""
        from g4s_tpu.ops import df64 as dfm
        rng = np.random.default_rng(5)
        x = np.concatenate([np.exp(rng.uniform(-40, 40, 20000)),
                            rng.uniform(0.5, 2.0, 5000), [1.0]])
        got = dfm.to_f64(jax.jit(dfm.log)(dfm.from_f64(x)))
        err = np.abs(got - np.log(x)) / np.maximum(np.abs(np.log(x)), 1.0)
        assert err.max() < 3e-13, err.max()
        r = np.exp(rng.uniform(-50, 50, 10000))
        c = 2.0 / 3.0
        got = dfm.to_f64(jax.jit(lambda p: dfm.powf(p, c))(dfm.from_f64(r)))
        rel = np.abs(got - r ** c) / r ** c
        assert rel.max() < 1e-11, rel.max()

    def test_sin_cos(self):
        """df sin/cos (Cody-Waite pi/2 reduction + df Taylor): the tracer
        coordinate-rate arithmetic (u_fi / (r sin theta)). Absolute
        accuracy ~2^-48 on (0, pi); error grows ~|k|*1e-15 with the
        reduction multiple, so relative accuracy near zeros of sin/cos
        degrades for large |x| (documented; tracers use theta in (0, pi))."""
        from g4s_tpu.ops import df64 as dfm
        x = np.linspace(1e-6, np.pi - 1e-6, 4000)
        s = dfm.to_f64(jax.jit(dfm.sin)(dfm.from_f64(x)))
        c = dfm.to_f64(jax.jit(dfm.cos)(dfm.from_f64(x)))
        assert np.abs(s - np.sin(x)).max() < 1e-14
        assert np.abs(c - np.cos(x)).max() < 1e-14
        xm = np.linspace(-50, 50, 4000)      # reduction error ~ |k|*1e-15
        sm = dfm.to_f64(jax.jit(dfm.sin)(dfm.from_f64(xm)))
        assert np.abs(sm - np.sin(xm)).max() < 2e-13
        # tracer range: tight relative accuracy where sin is bounded away
        th = np.linspace(0.05, np.pi - 0.05, 5000)
        st = dfm.to_f64(jax.jit(dfm.sin)(dfm.from_f64(th)))
        rel = np.abs(st - np.sin(th)) / np.sin(th)
        assert rel.max() < 2e-13, rel.max()
