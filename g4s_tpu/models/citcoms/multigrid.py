"""Multigrid velocity solver (the reference's Solver=multigrid path).

Reference: citcoms/lib/General_matrix_functions.c:152-305 `multi_grid` —
full multigrid with V-cycles: project the residual down a mesh hierarchy,
smooth at each level, solve the coarsest directly, interpolate corrections
up with an optimal line-search step alpha = <Au,res>/<Au,Au> (:259-260,
two global dots per level), plus the level-transfer operators of
Solver_multigrid.c (interp_vector:187, project_vector:479) and the
gauss_seidel smoother (:606).

TPU-first notes:
  - the default smoother is 8-color block Gauss-Seidel on the 27-point
    nodal stencil (nodal.gauss_seidel_colored) — the TPU realization of
    the reference's gauss_seidel (:606) via the same coloring idea its
    CUDA port uses (multigrid_kernel.cu:236-478); colors update
    simultaneously, the color sequence preserves GS's sweep ordering.
    Damped Jacobi (omega=0.6) remains as the `smoother='jacobi'` fallback;
  - the coarsest level is solved with a fixed number of CG iterations
    rather than many GS sweeps;
  - restriction = transpose of trilinear interpolation (scaled), the
    standard Galerkin-consistent pair.

Each level rebuilds the same FE operators (mesh, B tensors, elt_k) at its
own resolution — exactly how construct_stiffness_B_matrix populates all
levels in the reference (Construct_arrays.c:740).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.citcoms import assembly as asm
from g4s_tpu.models.citcoms import solvers as sol
from g4s_tpu.models.citcoms.config import CitcomConfig
from g4s_tpu.models.citcoms.mesh import build_regional_mesh
from g4s_tpu.models.citcoms.shapes import build_geometry
from g4s_tpu.models.citcoms.viscosity import element_materials, viscosity_at_vpts


def _coarsen(n_nodes: int) -> int:
    return (n_nodes - 1) // 2 + 1


class MGLevel(NamedTuple):
    cfg: CitcomConfig
    mesh: object
    geo: object
    ien: jax.Array
    plan: object
    N: jax.Array
    gda: jax.Array
    gweight: jax.Array
    B: jax.Array
    G: jax.Array
    cc: jax.Array
    vbc_mask: jax.Array
    vbc_val: jax.Array
    mat: jax.Array
    interp: object      # (fine_ids, weights) from this level UP to finer


def _interp_maps(coarse_cfg: CitcomConfig, fine_cfg: CitcomConfig):
    """Trilinear interpolation map coarse -> fine on nested grids.

    Returns (src_ids (nno_f, 8), weights (nno_f, 8)): every fine node is a
    weighted combination of up to 8 coarse nodes (exactly 1/2/4/8 active).
    """
    fnx, fny, fnz = fine_cfg.nodex, fine_cfg.nodey, fine_cfg.nodez
    cnx, cny, cnz = coarse_cfg.nodex, coarse_cfg.nodey, coarse_cfg.nodez

    iy, jx, kz = np.meshgrid(np.arange(fny), np.arange(fnx), np.arange(fnz),
                             indexing="ij")
    # fractional coarse coordinates of each fine node
    fy = iy * (cny - 1) / (fny - 1)
    fx = jx * (cnx - 1) / (fnx - 1)
    fz = kz * (cnz - 1) / (fnz - 1)
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, cny - 2)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, cnx - 2)
    z0 = np.clip(np.floor(fz).astype(np.int64), 0, cnz - 2)
    wy, wx, wz = fy - y0, fx - x0, fz - z0

    ids, wts = [], []
    for dy in (0, 1):
        for dx in (0, 1):
            for dz in (0, 1):
                node = ((y0 + dy) * cnx + (x0 + dx)) * cnz + (z0 + dz)
                w = (np.where(dy, wy, 1 - wy) * np.where(dx, wx, 1 - wx)
                     * np.where(dz, wz, 1 - wz))
                ids.append(node.reshape(-1))
                wts.append(w.reshape(-1))
    return (jnp.asarray(np.stack(ids, 1)),
            jnp.asarray(np.stack(wts, 1)))


def interp_up(level_interp, u_coarse):
    """u_fine = P u_coarse (interp_vector)."""
    ids, w = level_interp
    return jnp.einsum("nk,nk...->n...",
                      w, jnp.take(u_coarse, ids, axis=0))


def project_down(level_interp, r_fine, nno_coarse: int):
    """r_coarse = P^T r_fine (project_vector role)."""
    ids, w = level_interp
    contrib = w[:, :, None] * r_fine[:, None, :]
    flat_ids = ids.reshape(-1)
    flat = contrib.reshape(-1, r_fine.shape[-1])
    return jax.ops.segment_sum(flat, flat_ids, num_segments=nno_coarse)


class MGHierarchy:
    """Nested-level FE operators + the V-cycle solver."""

    def __init__(self, cfg: CitcomConfig, *, levels: int = None,
                 dtype=jnp.float64, smoother: str = "gs"):
        if levels is None:
            levels = max(cfg.levels, 2)
        self.dtype = dtype
        self.smoother = smoother
        cfgs = [cfg]
        for _ in range(levels - 1):
            prev = cfgs[-1]
            import dataclasses as dc
            nxt = dc.replace(prev, nodex=_coarsen(prev.nodex),
                             nodey=_coarsen(prev.nodey),
                             nodez=_coarsen(prev.nodez))
            if min(nxt.nodex, nxt.nodey, nxt.nodez) < 3:
                break
            cfgs.append(nxt)
        self.levels: List[MGLevel] = []
        self.stencil_plans = []
        self.gs_plans = []
        to = lambda x: jnp.asarray(x, dtype)
        from g4s_tpu.models.citcoms.nodal import GSPlan, StencilPlan
        for li, c in enumerate(cfgs):
            m = build_regional_mesh(c)
            g = build_geometry(m)
            interp = _interp_maps(c, cfgs[li - 1]) if li > 0 else None
            self.levels.append(MGLevel(
                c, m, g, jnp.asarray(m.ien),
                asm.ScatterPlan.build(m.ien, m.nno), to(g.N), to(g.gda),
                to(g.gweight), to(g.B), to(g.G), to(g.cc),
                jnp.asarray(m.vbc_mask), to(m.vbc_val),
                jnp.asarray(element_materials(c, m.e_center[:, 2],
                                              c.radius_outer)),
                interp))
            self.stencil_plans.append(StencilPlan.build(c))
            self.gs_plans.append(GSPlan.build((c.nodey, c.nodex, c.nodez)))

    def build_ops(self, T_fine):
        """Element stiffness at every level; coarse-level viscosity comes
        from injecting the fine temperature (visc_from_gint projections in
        the reference)."""
        ops = []
        T = T_fine
        for li, lv in enumerate(self.levels):
            if li > 0:
                # restrict T by sampling every other node
                pc, pf = lv.cfg, self.levels[li - 1].cfg
                grid = T.reshape(pf.nodey, pf.nodex, pf.nodez)
                sy = (pf.nodey - 1) // (pc.nodey - 1)
                sx = (pf.nodex - 1) // (pc.nodex - 1)
                sz = (pf.nodez - 1) // (pc.nodez - 1)
                T = grid[::sy, ::sx, ::sz].reshape(-1)
            evisc = viscosity_at_vpts(lv.cfg, lv.mat, T, lv.ien, lv.N)
            elt_k = asm.build_elt_k(lv.B, lv.gda, lv.gweight, evisc)
            BI = asm.build_diag_K(elt_k, lv.plan)
            BPI = asm.build_bpi(lv.G, BI, lv.ien, lv.vbc_mask)
            ops.append(asm.StokesOperators(lv.ien, elt_k, lv.G, lv.vbc_mask,
                                           lv.vbc_val, BI, BPI, lv.plan))
        return ops

    # ------------------------------------------------------------------
    def build_smoothers(self, ops):
        """Per-level GS ingredients (stencil W + 3x3 block Dinv), built
        once per viscosity update like Eqn_k (Construct_arrays.c:740)."""
        if self.smoother != "gs":
            return [None] * len(self.levels)
        from g4s_tpu.models.citcoms.nodal import (build_stencil,
                                                  stencil_block_dinv)
        out = []
        for li, lv in enumerate(self.levels):
            W = build_stencil(ops[li].elt_k, self.stencil_plans[li])
            grid = (lv.cfg.nodey, lv.cfg.nodex, lv.cfg.nodez)
            vg = lv.vbc_mask.reshape(*grid, 3)
            out.append((W, stencil_block_dinv(W, vg)))
        return out

    def _smooth(self, li, ops, F, u, n_sweeps: int, smooth_data=None,
                omega: float = 0.6):
        """gauss_seidel role: 8-color block GS (default) or damped
        Jacobi."""
        if smooth_data is not None:
            from g4s_tpu.models.citcoms.nodal import gauss_seidel_colored
            W, Dinv = smooth_data
            return gauss_seidel_colored(W, Dinv, F, u,
                                        self.levels[li].vbc_mask, n_sweeps,
                                        self.gs_plans[li])
        def body(i, u):
            r = F - asm.assemble_del2_u(ops, u, strip=True)
            return u + omega * ops.BI * r
        return jax.lax.fori_loop(0, n_sweeps, body, u)

    def v_cycle(self, ops, F, u, *, down: int = 2, up: int = 2,
                coarse_iters: int = 30, smooth_data=None):
        """One V-cycle with line-search-scaled corrections
        (mg_cycle, General_matrix_functions.c:214-280)."""
        levels = self.levels
        n = len(levels)
        sm = smooth_data if smooth_data is not None else [None] * n
        residuals = []
        # down-stroke
        for li in range(n - 1):
            u = self._smooth(li, ops[li], F, u, down, sm[li])
            r = asm.strip_bcs(F - asm.assemble_del2_u(ops[li], u, strip=True),
                              levels[li].vbc_mask)
            residuals.append((F, u))
            F = asm.strip_bcs(
                project_down(levels[li + 1].interp, r, levels[li + 1].mesh.nno),
                levels[li + 1].vbc_mask)
            u = jnp.zeros((levels[li + 1].mesh.nno, 3), F.dtype)
        # coarsest: CG
        prob = sol.local_problem(
            ops[n - 1], jnp.ones(levels[n - 1].mesh.nno, F.dtype),
            jnp.ones(levels[n - 1].mesh.nel, F.dtype), 1.0)
        cg = sol.conj_grad(prob, F, 1e-12, coarse_iters)
        u = cg.x
        # up-stroke
        for li in range(n - 2, -1, -1):
            F_f, u_f = residuals[li]
            du = asm.strip_bcs(interp_up(levels[li + 1].interp, u),
                               levels[li].vbc_mask)
            # optimal step: alpha = <A du, res> / <A du, A du>
            res = F_f - asm.assemble_del2_u(ops[li], u_f, strip=True)
            Adu = asm.assemble_del2_u(ops[li], du, strip=True)
            denom = jnp.vdot(Adu, Adu)
            alpha = jnp.where(denom > 0, jnp.vdot(Adu, res) / denom, 1.0)
            u = u_f + alpha * du
            u = self._smooth(li, ops[li], F_f, u, up, sm[li])
            F = F_f
        return u

    def solve(self, ops, F, *, acc: float, max_cycles: int = 50,
              down: int = 2, up: int = 2):
        """Repeated V-cycles until ||r|| < acc (solve_del2_u MG branch)."""
        u0 = jnp.zeros_like(F)
        smooth_data = self.build_smoothers(ops)

        def cond(state):
            u, res, it = state
            return jnp.logical_and(res > acc, it < max_cycles)

        def body(state):
            u, res, it = state
            u = self.v_cycle(ops, F, u, down=down, up=up,
                             smooth_data=smooth_data)
            r = F - asm.assemble_del2_u(ops[0], u, strip=True)
            r = asm.strip_bcs(r, self.levels[0].vbc_mask)
            return u, jnp.sqrt(jnp.vdot(r, r)), it + 1

        res0 = jnp.sqrt(jnp.vdot(F, F))
        u, res, it = jax.lax.while_loop(cond, body, (u0, res0,
                                                     jnp.asarray(0, jnp.int32)))
        return u, res, it
