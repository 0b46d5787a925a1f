"""Coupled coarse-global / fine-regional runs (the CitcomS Exchanger).

Reference: the CitcomS Exchanger package (citcoms/tests/exchange.py,
test1.sh/test2.sh launch a 12-proc coarse CitcomSFull coupled to a 1-proc
fine CitcomSRegional; the Exchanger's FEMInterpolator samples the coarse
solution at the fine mesh's boundary nodes each step and imposes it as
boundary conditions, while the fine interior temperature is restricted
back to embedded coarse nodes — two-way coupling over MPI).

TPU-first: both models live in one process; the "exchange" is two batched
interpolations — the full-sphere gnomonic sampler (full_tracers.
interp_field/interp_weights) evaluates the coarse solution at the fine
boundary nodes, and the regional trilinear sampler restricts the fine
temperature to coarse nodes inside the region. No MPI, no proxies: the
pass tables of the reference's Boundary/Interior exchangers collapse into
two static gather/weight matrices built once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.citcoms import full_tracers as ft
from g4s_tpu.models.citcoms.full_driver import FullSphereModel
from g4s_tpu.models.citcoms.driver import CitcomModel
from g4s_tpu.models.citcoms.full_mesh import _sph_to_xyz
from g4s_tpu.models.citcoms.tracers import TracerField, interp_velocity


def _regional_boundary_nodes(cfg) -> np.ndarray:
    """Flat node ids of all six faces of the regional box (the fine
    exchanger's Boundary node set)."""
    nox, noy, noz = cfg.nodex, cfg.nodey, cfg.nodez
    iy, jx, kz = np.meshgrid(np.arange(noy), np.arange(nox), np.arange(noz),
                             indexing="ij")
    on_face = ((iy == 0) | (iy == noy - 1) | (jx == 0) | (jx == nox - 1)
               | (kz == 0) | (kz == noz - 1))
    flat = (iy * nox + jx) * noz + kz
    return flat[on_face].ravel()


class CoupledRun:
    """Two-way coupled coarse full-sphere + fine regional convection."""

    def __init__(self, coarse: FullSphereModel, fine: CitcomModel,
                 *, two_way: bool = True):
        self.coarse = coarse
        self.fine = fine
        self.two_way = two_way
        self.tf_coarse = ft.FullTracerField.build(coarse.mesh)

        # fine boundary nodes in Cartesian (sampling sites on the coarse
        # sphere) — built once, like the Exchanger's createBoundary
        self.b_nodes = _regional_boundary_nodes(fine.cfg)
        sx = fine.mesh.sx[self.b_nodes]
        self.b_xyz = jnp.asarray(
            _sph_to_xyz(sx[:, 0], sx[:, 1]) * sx[:, 2:3])
        # static interpolation stencils coarse -> fine boundary
        self.b_ids, self.b_w = ft.interp_weights(self.tf_coarse, self.b_xyz)

        # masks with every boundary face essential (T and V imposed from
        # the coarse solution)
        tbc_mask = np.asarray(fine.tbc_mask).copy()
        tbc_mask[self.b_nodes] = True
        vbc_mask = np.asarray(fine.vbc_mask).copy()
        vbc_mask[self.b_nodes, :] = True
        self._tbc_mask = jnp.asarray(tbc_mask)
        self._vbc_mask = jnp.asarray(vbc_mask)

        # coarse nodes inside the fine region (restriction targets,
        # the Interior exchanger role)
        cfg = fine.cfg
        cs = coarse.mesh.sx
        eps = 1e-9
        inside = ((cs[:, 0] > cfg.theta_min + eps)
                  & (cs[:, 0] < cfg.theta_max - eps)
                  & (cs[:, 1] > cfg.fi_min + eps)
                  & (cs[:, 1] < cfg.fi_max - eps)
                  & (cs[:, 2] > cfg.radius_inner + eps)
                  & (cs[:, 2] < cfg.radius_outer - eps))
        self.interior_ids = jnp.asarray(np.where(inside)[0].astype(np.int32))
        self._interior_sph = jnp.asarray(cs[np.asarray(inside)])
        self.tf_fine = TracerField.from_mesh(fine.mesh)

        self._fine_step = jax.jit(self._fine_step_impl)
        self._exchange = jax.jit(self._exchange_impl)
        self._restrict = jax.jit(self._restrict_impl)

    # ------------------------------------------------------------------
    def _exchange_impl(self, T_c, V_c):
        """Sample the coarse solution at the fine boundary nodes and form
        the fine BC value arrays (FEMInterpolator role)."""
        Tb = jnp.sum(self.b_w * jnp.take(T_c, self.b_ids, axis=0), axis=1)
        Vb = jnp.sum(self.b_w[:, :, None]
                     * jnp.take(V_c, self.b_ids, axis=0), axis=1)
        tbc_val = jnp.zeros(self.fine.mesh.nno, T_c.dtype)
        tbc_val = tbc_val.at[self.b_nodes].set(Tb)
        vbc_val = jnp.zeros((self.fine.mesh.nno, 3), V_c.dtype)
        vbc_val = vbc_val.at[self.b_nodes].set(Vb)
        return tbc_val, vbc_val

    def _fine_step_impl(self, s, tbc_val, vbc_val):
        # BCs enter the traced step as explicit arguments — no model-
        # attribute mutation around tracing (advisor round-2 finding)
        return self.fine._timestep(
            s, bcs=(self._tbc_mask, tbc_val, self._vbc_mask, vbc_val))

    def _restrict_impl(self, T_c, T_f):
        """Fine temperature -> embedded coarse nodes (Interior role)."""
        Tf_at = interp_velocity(self.tf_fine, T_f[:, None],
                                self._interior_sph)[:, 0]
        return T_c.at[self.interior_ids].set(Tf_at)

    # ------------------------------------------------------------------
    def step(self, s_coarse, s_fine, *, fine_substeps: int = 1):
        """One coupled step: advance coarse, exchange BCs, advance fine
        (optionally several substeps at its smaller CFL dt), restrict."""
        s_coarse, d_c = self.coarse.step(s_coarse)
        tbc_val, vbc_val = self._exchange(s_coarse.T, s_coarse.V)
        for _ in range(fine_substeps):
            s_fine, d_f = self._fine_step(s_fine, tbc_val, vbc_val)
        if self.two_way:
            import dataclasses
            T_c = self._restrict(s_coarse.T, s_fine.T)
            s_coarse = dataclasses.replace(s_coarse, T=T_c)
        return s_coarse, s_fine, (d_c, d_f)
