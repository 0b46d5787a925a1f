"""Conflict-free log-shift stream movement (ops/shifts.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from g4s_tpu.ops.shifts import (bitfill, bitfill_np, compact, compact_np,
                                runsum, runsum_np, spread, spread_np,
                                stages_for)


def _random_compaction(rng, m, n_live):
    """Live elements at random increasing positions -> prefix slots."""
    pos = np.sort(rng.choice(m, size=n_live, replace=False))
    dist = pos - np.arange(n_live)           # monotone non-decreasing
    d = np.zeros(m, np.int32)
    d[pos] = dist.astype(np.int32)
    x = np.full(m, -1.0, np.float32)
    x[pos] = rng.standard_normal(n_live).astype(np.float32)
    return x, d, pos, dist


class TestCompact:
    @pytest.mark.parametrize("m,n_live", [(256, 100), (4096, 1000),
                                          (4096, 4096), (512, 1)])
    def test_matches_dense_gather(self, rng, m, n_live):
        x, d, pos, _ = _random_compaction(rng, m, n_live)
        T = stages_for(int(d.max(initial=0)))
        out = np.asarray(compact(jnp.asarray(x), jnp.asarray(d), T))
        np.testing.assert_array_equal(out[:n_live], x[pos])
        out_np = compact_np(x, d, T)
        np.testing.assert_array_equal(out_np[:n_live], x[pos])

    def test_multi_carry(self, rng):
        m, n_live = 1024, 300
        x, d, pos, _ = _random_compaction(rng, m, n_live)
        y = rng.integers(0, 1 << 20, m).astype(np.int32)
        T = stages_for(int(d.max(initial=0)))
        ox, oy = compact((jnp.asarray(x), jnp.asarray(y)), jnp.asarray(d), T)
        np.testing.assert_array_equal(np.asarray(ox)[:n_live], x[pos])
        np.testing.assert_array_equal(np.asarray(oy)[:n_live], y[pos])


class TestSpread:
    @pytest.mark.parametrize("m,n_live", [(256, 100), (4096, 1000),
                                          (2048, 2048), (512, 1)])
    def test_matches_dense_scatter(self, rng, m, n_live):
        # dests strictly increasing, sources are the prefix slots
        dest = np.sort(rng.choice(m, size=n_live, replace=False))
        d = np.full(m, -1, np.int32)
        d[:n_live] = (dest - np.arange(n_live)).astype(np.int32)
        x = np.full(m, 7.0, np.float32)
        x[:n_live] = rng.standard_normal(n_live).astype(np.float32)
        T = stages_for(int(d[:n_live].max(initial=0)))
        out = np.asarray(spread(jnp.asarray(x), jnp.asarray(d), T,
                                fill=0.0))
        ref = spread_np(x, d, T, fill=0.0)
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_array_equal(out[dest], x[:n_live])
        mask = np.ones(m, bool)
        mask[dest] = False
        assert np.all(out[mask] == 0.0)

    def test_roundtrip_with_compact(self, rng):
        m, n_live = 2048, 700
        dest = np.sort(rng.choice(m, size=n_live, replace=False))
        dist = (dest - np.arange(n_live)).astype(np.int32)
        d_sp = np.full(m, -1, np.int32)
        d_sp[:n_live] = dist
        x = np.zeros(m, np.float32)
        x[:n_live] = rng.standard_normal(n_live).astype(np.float32)
        T = stages_for(int(dist.max(initial=0)))
        spread_out = spread(jnp.asarray(x), jnp.asarray(d_sp), T)
        d_c = np.zeros(m, np.int32)
        d_c[dest] = dist
        back = np.asarray(compact(spread_out, jnp.asarray(d_c), T))
        np.testing.assert_array_equal(back[:n_live], x[:n_live])


class TestBitfill:
    def test_run_head_broadcast(self, rng):
        # runs of random lengths; off = position within run
        lens = rng.integers(1, 40, size=200)
        off = np.concatenate([np.arange(l) for l in lens]).astype(np.int32)
        m = off.size
        x = np.zeros(m, np.float32)
        heads = np.nonzero(off == 0)[0]
        x[heads] = rng.standard_normal(heads.size).astype(np.float32)
        T = stages_for(int(off.max()))
        out = np.asarray(bitfill(jnp.asarray(x), jnp.asarray(off), T))
        ref = np.repeat(x[heads], lens)
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_array_equal(bitfill_np(x, off, T), ref)


class TestRunsum:
    def test_head_sums(self, rng):
        lens = rng.integers(1, 33, size=300)
        off = np.concatenate([np.arange(l) for l in lens]).astype(np.int32)
        m = off.size
        x = rng.standard_normal(m).astype(np.float32)
        T = stages_for(int(lens.max() - 1))
        out = np.asarray(runsum(jnp.asarray(x), jnp.asarray(off), T))
        heads = np.nonzero(off == 0)[0]
        ends = np.append(heads[1:], m)
        ref = np.add.reduceat(x.astype(np.float64), heads)
        np.testing.assert_allclose(out[heads], ref, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(runsum_np(x, off, T)[heads], ref,
                                   rtol=2e-6, atol=2e-6)
        assert ends.size == heads.size
