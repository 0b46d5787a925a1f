"""Molecular-dynamics inference driver: the LAMMPS water benchmark.

Replaces the reference's benchmark step `lmp -in in.lammps`
(deepmd/examples/water/lmp/in.lammps: metal units, periodic bulk water of
192 atoms, masses 16/2, velocities created at 330 K with seed 23456789,
Nose-Hoover NVT at 330 K with 0.5 ps damping, dt = 0.5 fs, 1000 steps,
thermo every 100) with a pure-JAX velocity-Verlet + Nose-Hoover loop whose
forces come from the trained se_e2_a model (the role of pair_deepmd,
deepmd/source/lmp/pair_deepmd.cpp:388 + DeepPot::compute,
source/api_cc/src/DeepPot.cc:553).

Also includes a minimal LAMMPS data-file reader for water.lmp.
Units (metal): lengths A, energy eV, time ps, mass g/mol.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# metal units: [mass g/mol][distance A][time ps][energy eV]
# a = F[eV/A] / m[g/mol] * MVV2E ; kB in eV/K
KB_EV = 8.617333262e-5
# 1 eV/A / (1 g/mol) in A/ps^2:
F_OVER_M = 9648.53306


def read_lammps_data(path):
    """Minimal LAMMPS data reader (atomic style): returns coord (N,3),
    types (N,) 0-based, box (3,3)."""
    lines = open(path).read().splitlines()
    n_atoms = None
    bounds = {}
    atoms_start = None
    for i, ln in enumerate(lines):
        s = ln.split("#")[0].strip()
        if s.endswith("atoms"):
            n_atoms = int(s.split()[0])
        for key in ("xlo", "ylo", "zlo"):
            if key in s:
                p = s.split()
                bounds[key[0]] = (float(p[0]), float(p[1]))
        if s.startswith("Atoms"):
            atoms_start = i + 2
    assert n_atoms and atoms_start
    rows = []
    for ln in lines[atoms_start:]:
        s = ln.split()
        if not s:
            if rows:
                break
            continue
        rows.append([float(v) for v in s[:5]])
    arr = np.asarray(rows)
    order = np.argsort(arr[:, 0])
    arr = arr[order]
    types = arr[:, 1].astype(np.int32) - 1
    coord = arr[:, 2:5]
    box = np.diag([bounds[d][1] - bounds[d][0] for d in "xyz"])
    return coord, types, box


def init_velocities(rng, masses, T0):
    """`velocity all create` semantics: Maxwell-Boltzmann at T0, zero net
    momentum, rescaled to exactly T0."""
    n = masses.shape[0]
    v = rng.normal(size=(n, 3)) * np.sqrt(KB_EV * T0 * F_OVER_M
                                          / masses[:, None])
    v -= (masses[:, None] * v).sum(axis=0) / masses.sum()
    ke = 0.5 * (masses[:, None] * v * v).sum() / F_OVER_M
    T_now = 2 * ke / (3 * n * KB_EV)
    return v * np.sqrt(T0 / T_now)


class MDState(NamedTuple):
    x: jax.Array      # (N, 3) positions
    v: jax.Array      # (N, 3) velocities
    xi: jax.Array     # (M,) thermostat chain velocities
    step: jax.Array


class NVTIntegrator:
    """Velocity-Verlet with a Nose-Hoover CHAIN thermostat (M=3), the
    integrator behind LAMMPS `fix nvt` (Martyna-Klein-Tuckerman update).
    A single Nose-Hoover is non-ergodic on near-harmonic systems; the
    chain fixes that."""

    M_CHAIN = 3

    def __init__(self, force_fn, masses, box, *, T0=330.0, tdamp=0.5,
                 dt=0.0005, nve=False):
        self.force_fn = force_fn
        self.masses = jnp.asarray(masses)
        self.box = jnp.asarray(box)
        self.T0, self.tdamp, self.dt = T0, tdamp, dt
        self.nve = nve          # thermostat off: plain velocity Verlet
                                # (the energy-drift validation ensemble)
        self.n = masses.shape[0]
        self.ndof = 3 * self.n
        kT = KB_EV * T0
        Q = np.full(self.M_CHAIN, kT * tdamp ** 2)
        Q[0] = self.ndof * kT * tdamp ** 2
        self.Q = jnp.asarray(Q)
        self._step = jax.jit(self._make_step())

    def temperature(self, v):
        ke = 0.5 * jnp.sum(self.masses[:, None] * v * v) / F_OVER_M
        return 2 * ke / (self.ndof * KB_EV)

    def _nhc_half(self, v, vxi):
        """Half-step thermostat-chain update; returns (scaled v, vxi)."""
        M = self.M_CHAIN
        kT = KB_EV * self.T0
        dt2, dt4, dt8 = self.dt / 2, self.dt / 4, self.dt / 8
        ke2 = jnp.sum(self.masses[:, None] * v * v) / F_OVER_M

        def G0(ke2_):
            return (ke2_ - self.ndof * kT) / self.Q[0]

        def Gk(k, vxi_):
            return (self.Q[k - 1] * vxi_[k - 1] ** 2 - kT) / self.Q[k]

        vxi = vxi.at[M - 1].add(Gk(M - 1, vxi) * dt4)
        for k in range(M - 2, 0, -1):
            e = jnp.exp(-vxi[k + 1] * dt8)
            vxi = vxi.at[k].set((vxi[k] * e + Gk(k, vxi) * dt4) * e)
        e = jnp.exp(-vxi[1] * dt8)
        vxi = vxi.at[0].set((vxi[0] * e + G0(ke2) * dt4) * e)

        scale = jnp.exp(-vxi[0] * dt2)
        v = v * scale
        ke2 = ke2 * scale * scale

        e = jnp.exp(-vxi[1] * dt8)
        vxi = vxi.at[0].set((vxi[0] * e + G0(ke2) * dt4) * e)
        for k in range(1, M - 1):
            e = jnp.exp(-vxi[k + 1] * dt8)
            vxi = vxi.at[k].set((vxi[k] * e + Gk(k, vxi) * dt4) * e)
        vxi = vxi.at[M - 1].add(Gk(M - 1, vxi) * dt4)
        return v, vxi

    def _make_step(self):
        m = self.masses[:, None]
        dt = self.dt

        def one_step(state, f):
            if self.nve:
                v, vxi = state.v, state.xi
            else:
                v, vxi = self._nhc_half(state.v, state.xi)
            v = v + dt / 2 * f / m * F_OVER_M
            x = state.x + dt * v
            inv = jnp.linalg.inv(self.box)
            frac = x @ inv
            x = (frac - jnp.floor(frac)) @ self.box
            f_new = self.force_fn(x)
            v = v + dt / 2 * f_new / m * F_OVER_M
            if not self.nve:
                v, vxi = self._nhc_half(v, vxi)
            return MDState(x, v, vxi, state.step + 1), f_new

        return one_step

    def run(self, x0, v0, n_steps: int, *, thermo_every: int = 100,
            energy_fn=None, verbose=True):
        f = self.force_fn(jnp.asarray(x0))
        state = MDState(jnp.asarray(x0), jnp.asarray(v0),
                        jnp.zeros((self.M_CHAIN,), f.dtype),
                        jnp.asarray(0, jnp.int32))
        log = []
        t0 = time.time()
        for i in range(n_steps):
            state, f = self._step(state, f)
            if (i + 1) % thermo_every == 0 or i == 0:
                T = float(self.temperature(state.v))
                pe = float(energy_fn(state.x)) if energy_fn else float("nan")
                log.append((i + 1, T, pe))
                if verbose:
                    print(f"step {i+1}: T={T:.1f} K  pe={pe:.4f} eV "
                          f"({(time.time()-t0)/(i+1)*1e3:.1f} ms/step)")
        return state, log


def water_md(params, spec, *, n_steps=1000, data_file=None, seed=23456789,
             verbose=True, dtype=jnp.float64, ensemble="nvt"):
    """The full water-MD benchmark from a trained model.

    ensemble="nvt": the reference protocol (examples/water/lmp/
    in.lammps:15,27 — 1000-step fix nvt at 330 K).
    ensemble="nve": thermostat off, for the energy-drift validation
    (log pe column + kinetic energy give the conserved E)."""
    from g4s_tpu.models.deepmd.model import energy_force_virial, total_energy
    if data_file is None:
        data_file = ("/root/reference/deepmd/examples/water/lmp/water.lmp")
    coord, types_np, box_np = read_lammps_data(data_file)
    types = jnp.asarray(types_np)
    box = jnp.asarray(box_np, dtype)
    masses = np.where(types_np == 0, 16.0, 2.0)  # in.lammps mass 1 16/2 2

    def force_fn(x):
        _, f, _ = energy_force_virial(params, spec, x, box, types)
        return f

    def energy_fn(x):
        return total_energy(params, spec, x, box, types)

    rng = np.random.default_rng(seed)
    v0 = init_velocities(rng, masses, 330.0)
    integ = NVTIntegrator(jax.jit(force_fn), masses, box_np,
                          nve=(ensemble == "nve"))
    return integ.run(jnp.asarray(coord, dtype), jnp.asarray(v0, dtype),
                     n_steps, energy_fn=jax.jit(energy_fn), verbose=verbose)
