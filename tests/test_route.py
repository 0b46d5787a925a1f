"""Clos/Benes static-permutation routing (ops/route.py).

Role parity: the reference's hand-scheduled data movement — cache-blocked
copy loops (mm/inc/outer_mult.h:315-353) and radix re-bucketing
(mm/inc/radix_sort.h) — recast as offline routing plans executed by
butterfly/roll kernels on TPU.
"""

import numpy as np
import pytest

from g4s_tpu.ops.route import (
    PermutePlan, apply_permute, apply_permute_np, benes_dists, benes_route,
    build_permute_plan, edge_color_bipartite, permute,
)


class TestBenesRoute:
    def test_route_various_sizes(self, rng):
        for n in (2, 4, 8, 32, 128):
            for B in (1, 5, 64):
                sigma = np.argsort(rng.standard_normal((B, n)), axis=1)
                bits = benes_route(sigma)
                # apply stages in numpy
                x = np.broadcast_to(np.arange(n), (B, n)).copy()
                lane = np.arange(n)[None, :]
                for s, d in enumerate(benes_dists(n)):
                    m = ((bits >> np.int32(s)) & 1) != 0
                    x = np.where(m, np.take_along_axis(x, lane ^ d, 1), x)
                assert np.array_equal(x, sigma)

    def test_bits_pair_symmetric(self, rng):
        n = 64
        sigma = np.argsort(rng.standard_normal((8, n)), axis=1)
        bits = benes_route(sigma)
        lane = np.arange(n)[None, :]
        for s, d in enumerate(benes_dists(n)):
            m = (bits >> np.int32(s)) & 1
            assert np.array_equal(
                m, np.take_along_axis(m, lane ^ d, axis=1)), (s, d)

    def test_identity_routes_zero_bits(self):
        sigma = np.broadcast_to(np.arange(128), (4, 128)).copy()
        assert not benes_route(sigma).any()

    def test_rejects_non_pow2(self):
        with pytest.raises(ValueError):
            benes_route(np.arange(6)[None, :])


class TestEdgeColoring:
    def test_each_vertex_sees_each_color_once(self, rng):
        # random 8-regular bipartite multigraph on 32+32 vertices
        deg, nv = 8, 32
        a = np.repeat(np.arange(nv), deg)
        b = rng.permuted(np.repeat(np.arange(nv), deg))
        col = edge_color_bipartite(a, b, deg)
        for v in range(nv):
            assert sorted(col[a == v]) == list(range(deg))
            assert sorted(col[b == v]) == list(range(deg))


class TestPermutePlan:
    @pytest.mark.parametrize("m0", [16384, 32768, 3 * 16384, 100000])
    def test_numpy_oracle(self, rng, m0):
        sigma = rng.permutation(m0)
        plan = build_permute_plan(sigma)
        z = rng.standard_normal(plan.m).astype(np.float32)
        out = apply_permute_np(plan, z)
        want = z[np.concatenate([sigma, np.arange(m0, plan.m)])]
        assert np.array_equal(out, want)

    def test_plan_is_pytree(self, rng):
        import jax
        plan = build_permute_plan(rng.permutation(16384))
        leaves = jax.tree_util.tree_leaves(plan)
        assert len(leaves) == 3  # bits1, bits5, mid_small

    def test_too_large_raises(self):
        from g4s_tpu.ops.route import MAX_M
        with pytest.raises(NotImplementedError):
            build_permute_plan(np.arange(MAX_M + 1))


class TestDeviceApply:
    @pytest.fixture(autouse=True)
    def _interpret(self, monkeypatch):
        from jax.experimental import pallas as pl
        orig = pl.pallas_call
        monkeypatch.setattr(
            pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k))

    @pytest.mark.parametrize("m0", [16384, 49152])
    def test_device_matches_sigma(self, rng, m0):
        sigma = rng.permutation(m0)
        plan, fn = permute(sigma)
        z = rng.standard_normal(plan.m).astype(np.float32)
        out = np.asarray(fn(z))
        want = z[np.concatenate([sigma, np.arange(m0, plan.m)])]
        assert np.array_equal(out, want)

    def test_roundtrip_inverse(self, rng):
        m0 = 16384
        sigma = rng.permutation(m0)
        inv = np.argsort(sigma)
        _, fwd = permute(sigma)
        _, bwd = permute(inv)
        z = rng.standard_normal(m0).astype(np.float32)
        assert np.array_equal(np.asarray(bwd(fwd(z))), z)
