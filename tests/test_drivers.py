"""Benchmark drivers (mv/mm) + Timings, on CPU with tiny sizes."""

import pytest

pytestmark = pytest.mark.slow  # end-to-end tier; smoke = -m 'not slow and not isolated'

import numpy as np
import scipy.sparse as sp

from g4s_tpu.drivers.mm_bench import bench_pair, load_pair
from g4s_tpu.drivers.mv_bench import run as mv_run
from g4s_tpu.obs import Timings
from g4s_tpu.ops.spgemm import spgemm_device_merge
from g4s_tpu.sparse import CSR, csr_to_coo, write_mtx


def test_timings_report():
    t = Timings("x")
    with t.stage("a"):
        pass
    t.record("b", 0.5)
    rep = t.report(flops=1_000_000_000)
    assert "a" in rep and "b" in rep and "GFLOPS" in rep
    assert abs(t.as_dict()["total"] - t.total) < 1e-12


def test_mv_driver_runs():
    res = mv_run(64, reps=2, verbose=False)
    assert set(res) == {"dsymv", "dtrmv", "dspmv", "dgemv"}
    assert all(v > 0 for v in res.values())


def test_mm_driver_and_crop(tmp_path):
    rng = np.random.RandomState(3)
    A = CSR.from_scipy(sp.random(50, 40, density=0.1, random_state=rng,
                                 format="csr"))
    B = CSR.from_scipy(sp.random(45, 30, density=0.1, random_state=rng,
                                 format="csr"))
    pa, pb = tmp_path / "a.mtx", tmp_path / "b.mtx"
    write_mtx(pa, csr_to_coo(A))
    write_mtx(pb, csr_to_coo(B))
    A2, B2 = load_pair(pa, pb)
    assert A2.shape[1] == B2.shape[0] == 40
    out = bench_pair(A2, B2, reps=2, verbose=False)
    assert out["flops"] > 0 and out["nnz_c"] > 0
    assert out["plan"]["numeric"] > 0


def test_device_merge_matches_plan():
    A = CSR.from_scipy(sp.random(64, 64, density=0.08, random_state=1,
                                 format="csr"))
    keys, vals, nnz = spgemm_device_merge(A, A)
    ref = (A.to_scipy() @ A.to_scipy()).tocsr()
    ref.sum_duplicates()
    assert int(nnz) == ref.nnz
    k = np.asarray(keys)[: int(nnz)]
    C = sp.coo_matrix((np.asarray(vals)[: int(nnz)], (k // 64, k % 64)),
                      shape=(64, 64)).tocsr()
    assert abs(C - ref).max() < 1e-12


class TestRegMM:
    def test_all_strategies_pass(self, capsys):
        """reg_mm: the four SpGEMM strategy analogs (hash/heap/outer/MKL)
        agree with the exact oracle on a random matrix."""
        from g4s_tpu.drivers import reg_mm
        rc = reg_mm.main(["--random", "200", "0.06"])
        out = capsys.readouterr().out
        assert rc == 0
        assert out.count("PASS") == 5      # 4 strategies + ALL PASS
        for name in ("plan", "csc", "device", "dense"):
            assert name in out

    def test_csc_strategy_rectangular(self):
        import scipy.sparse as sp
        from g4s_tpu.ops.spgemm import spgemm_via_csc
        from g4s_tpu.sparse import dense_to_csr
        A = sp.random(50, 70, density=0.1, format="csr", random_state=2)
        B = sp.random(70, 30, density=0.1, format="csr", random_state=3)
        c = spgemm_via_csc(dense_to_csr(A.toarray()),
                           dense_to_csr(B.toarray()))
        C = sp.csr_matrix((np.asarray(c.data), np.asarray(c.indices),
                           np.asarray(c.indptr)), shape=c.shape)
        assert abs((C - A @ B).toarray()).max() < 1e-12
        # heap-analog property: sorted columns within each row
        ind, ptr = np.asarray(c.indices), np.asarray(c.indptr)
        for i in range(c.shape[0]):
            seg = ind[ptr[i]:ptr[i + 1]]
            assert (np.diff(seg) > 0).all()
