"""Streaming SpMV for unstructured patterns (ops/stream_spmv.py).

Role parity: the reference's hash-based row merging + AVX gathers for
arbitrary sparsity (mm/inc/hash_mult.h:111-492) — recast as a static
expand/route/reduce schedule with no device gathers.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from g4s_tpu.ops.stream_spmv import (build_stream_plan, spmv_stream,
                                     spmv_stream_np)


def _random_csr(rng, n_rows, n_cols, nnz):
    a = sp.coo_matrix(
        (rng.normal(size=nnz).astype(np.float32),
         (rng.integers(0, n_rows, nnz), rng.integers(0, n_cols, nnz))),
        shape=(n_rows, n_cols)).tocsr()
    a.sum_duplicates()
    return a


class TestStreamPlan:
    def test_uniform_random(self, rng):
        a = _random_csr(rng, 3000, 3000, 24000)
        plan = build_stream_plan(a)
        x = rng.standard_normal(3000).astype(np.float32)
        y = spmv_stream_np(plan, x)
        np.testing.assert_allclose(y, a @ x, rtol=2e-5, atol=1e-5)

    def test_power_law_skew(self, rng):
        n, nnz = 4000, 32000
        rows = np.minimum((rng.pareto(0.6, nnz) * 2).astype(np.int64), n - 1)
        cols = np.minimum((rng.pareto(0.6, nnz) * 2).astype(np.int64), n - 1)
        a = sp.coo_matrix((rng.normal(size=nnz).astype(np.float32),
                           (rows, cols)), shape=(n, n)).tocsr()
        a.sum_duplicates()
        plan = build_stream_plan(a)
        x = rng.standard_normal(n).astype(np.float32)
        np.testing.assert_allclose(spmv_stream_np(plan, x), a @ x,
                                   rtol=2e-5, atol=1e-5)
        # the pareto-0.6 head columns exceed 8x mean degree -> MXU split
        # (hub rows may or may not survive the column removal)
        assert plan.hub_cols is not None
        # without the split the answer is identical (and the stream longer)
        plan0 = build_stream_plan(a, hub_split=False)
        assert plan0.hub_cols is None and plan0.m >= plan.m
        np.testing.assert_allclose(spmv_stream_np(plan0, x),
                                   spmv_stream_np(plan, x),
                                   rtol=2e-5, atol=1e-5)

    def test_hub_overlap_entries_counted_once(self, rng):
        # entries at (hub row, hub col) intersections must not be double
        # counted between the two dense blocks
        n = 1200
        a = _random_csr(rng, n, n, 5000).tolil()
        a[:, 5] = 1.0          # hub column (degree n)
        a[7, :] = 2.0          # hub row (degree n), overlaps at (7, 5)
        a = a.tocsr()
        plan = build_stream_plan(a)
        assert plan.hub_cols is not None and plan.hub_rows is not None
        x = rng.standard_normal(n).astype(np.float32)
        np.testing.assert_allclose(spmv_stream_np(plan, x), a @ x,
                                   rtol=2e-5, atol=2e-4)

    def test_rectangular(self, rng):
        a = sp.random(1500, 6000, density=0.002, format="csr",
                      dtype=np.float32, random_state=7)
        plan = build_stream_plan(a)
        x = rng.standard_normal(6000).astype(np.float32)
        np.testing.assert_allclose(spmv_stream_np(plan, x), a @ x,
                                   rtol=2e-5, atol=1e-5)

    def test_empty_rows_and_cols(self, rng):
        # rows/cols 0 and last have no entries at all
        a = _random_csr(rng, 2000, 2000, 6000).tolil()
        a[0, :] = 0
        a[:, 0] = 0
        a[-1, :] = 0
        a = a.tocsr()
        a.eliminate_zeros()
        plan = build_stream_plan(a)
        x = rng.standard_normal(2000).astype(np.float32)
        y = spmv_stream_np(plan, x)
        np.testing.assert_allclose(y, a @ x, rtol=2e-5, atol=1e-5)
        assert y[0] == 0 and y[-1] == 0


class TestDeviceApply:
    @pytest.fixture(autouse=True)
    def _interpret(self, monkeypatch):
        from jax.experimental import pallas as pl
        orig = pl.pallas_call
        monkeypatch.setattr(
            pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k))

    def test_device_matches_scipy(self, rng):
        import jax
        import jax.numpy as jnp
        a = _random_csr(rng, 2500, 2500, 20000)
        plan = build_stream_plan(a)
        x = rng.standard_normal(2500).astype(np.float32)
        y = np.asarray(jax.jit(
            lambda v: spmv_stream(plan, v))(jnp.asarray(x)))
        np.testing.assert_allclose(y, a @ x, rtol=2e-5, atol=1e-5)

    def test_device_hub_split(self, rng):
        import jax
        import jax.numpy as jnp
        n = 1500
        a = _random_csr(rng, n, n, 8000).tolil()
        a[:, 3] = 1.5
        a[9, :] = -0.5
        a = a.tocsr()
        plan = build_stream_plan(a)
        assert plan.hub_cols is not None and plan.hub_rows is not None
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(jax.jit(
            lambda v: spmv_stream(plan, v))(jnp.asarray(x)))
        np.testing.assert_allclose(y, a @ x, rtol=2e-5, atol=2e-4)
