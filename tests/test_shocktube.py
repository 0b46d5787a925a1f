"""The flagship Cantera benchmark: n-dodecane NonIdealShockTube ignition.

Runs the reference's actual benchmark configuration (NonIdealShockTube.py:
45-115 — 102-species nDodecane_Reitz mechanism, phi=1 c12h26/air,
1000 K / 40 atm, constant-UV reactor, IDT = peak OH) end-to-end through the
JAX BDF integrator. Bracket: the Wang/Ra/Reitz reduced mechanism (Fuel 136
(2014) 25-36) was built to reproduce n-dodecane shock-tube IDTs, which at
phi=1, 40 atm, 1000 K are a few-tenths of a millisecond (Vasu et al.,
Proc. Comb. Inst. 32 (2009): ~0.3-0.5 ms at these conditions).
"""

import numpy as np
import pytest

from g4s_tpu.models.cantera.shock_tube import (ShockTubeBenchmark,
                                               stoich_mixture,
                                               ignition_delay)

DODECANE = "/root/reference/cantera/data/nDodecane_Reitz.yaml"


@pytest.fixture(scope="module")
def bench():
    return ShockTubeBenchmark(DODECANE)


@pytest.mark.slow
class TestDodecaneIgnition:
    def test_idt_1000K_40atm_literature_bracket(self, bench):
        out = bench.run_single(1000.0, 40 * 101325.0)
        # physical bracket for this mechanism/conditions
        assert 2e-4 < out["tau_IG"] < 8e-4, out
        assert 2e-4 < out["tau_RG"] < 8e-4, out
        # real-gas departure is a small correction at 40 atm — the two
        # phases must agree to a few percent but NOT be identical
        rel = abs(out["tau_RG"] - out["tau_IG"]) / out["tau_IG"]
        assert 1e-4 < rel < 0.05, out

    def test_ntc_turnover(self, bench):
        """The sweep shows non-monotonic (NTC) behavior: IDT dips going
        1000 K -> 900 K then RISES again toward 825 K (the benchmark's
        whole point, NonIdealShockTube.py:194-266)."""
        X = stoich_mixture(bench.mech_ig, "c12h26")
        taus = {}
        for T0 in (1000.0, 900.0, 825.0):
            taus[T0], _ = ignition_delay(bench.r_ig, T0, 40 * 101325.0, X)
        assert taus[900.0] < taus[1000.0]   # hotter is SLOWER here
        assert taus[900.0] < taus[825.0]    # and colder is slower again

    def test_integrator_stats_sane(self, bench):
        X = stoich_mixture(bench.mech_ig, "c12h26")
        y0 = bench.r_ig.initial_state(1000.0, 40 * 101325.0, X)
        res = bench.r_ig.advance(y0, 0.005)
        assert bool(res.success)
        assert int(res.steps) < 20000
        # Jacobian refreshes should be a small fraction of steps
        assert int(res.n_jev) < 0.25 * int(res.steps)


class TestShardedSweep:
    pytestmark = pytest.mark.slow
    def test_sharded_equals_batched(self):
        """The mesh-sharded NTC sweep (mpi4py rank-striding analog) must
        equal the single-device batched sweep exactly — pure SPMD over
        the case axis. Uses the small H2/O2 mechanism for speed."""
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device (forced-host) platform")
        from jax.sharding import Mesh
        from g4s_tpu.models.cantera.shock_tube import ShockTubeBenchmark
        b = ShockTubeBenchmark(
            "/root/reference/cantera/data/h2o2.yaml",
            rk_phase="ohmech", ig_phase="ohmech", fuel="h2")
        temps = [1400.0, 1300.0, 1200.0, 1100.0]
        kw = dict(P0=5 * 101325.0, t_end=2e-4, rtol=1e-8, atol=1e-14,
                  record_size=4000)
        single = b.run_ntc_sweep_batched(temps, kw["P0"],
                                         t_end=kw["t_end"],
                                         rtol=kw["rtol"], atol=kw["atol"])
        mesh = Mesh(np.array(jax.devices()), ("case",))
        shard = b.run_ntc_sweep_sharded(mesh, temps, **kw)
        # tau is read off the per-step record grid; the two runs use
        # different record buffer sizes so agree to step granularity
        np.testing.assert_allclose(shard["tau_RG"], single["tau_RG"],
                                   rtol=1e-5)
        np.testing.assert_allclose(shard["tau_IG"], single["tau_IG"],
                                   rtol=1e-5)
