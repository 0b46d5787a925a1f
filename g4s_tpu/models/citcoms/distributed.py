"""Multi-chip regional CitcomS: domain decomposition over a device mesh.

The TPU replacement for the reference's MPI bricks: the (theta, fi) plane
is split over mesh axes ("bx", "by") exactly like nprocx x nprocy
(citcoms/lib/Regional_parallel_related.c:213 regional_parallel_domain_
decomp0), with shared boundary nodes duplicated between neighbor devices.
Inside one shard_map-jitted timestep:

  - element assembly is block-local (each device owns a clean element
    brick; elements never straddle devices),
  - every nodal scatter is followed by an additive halo exchange over ICI
    (g4s_tpu.parallel.halo — the exchange_id_d/exchange_node_d combine,
    Regional_parallel_related.c:744-858),
  - CG / Uzawa dot products are ownership-weighted psums (global_vdot,
    Global_operations.c:496-529: each shared node counted once),
  - the horizontal layer average in the buoyancy uses a per-layer psum.

The SAME solver code (solvers.uzawa_cg over a StokesProblem) runs here as
on one chip — only the operator closures change.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from g4s_tpu.models.citcoms import assembly as asm
from g4s_tpu.models.citcoms import solvers as sol
from g4s_tpu.models.citcoms.config import CitcomConfig
from g4s_tpu.models.citcoms.driver import StepDiagnostics
from g4s_tpu.models.citcoms.mesh import build_regional_mesh, initial_temperature
from g4s_tpu.models.citcoms.shapes import build_geometry
from g4s_tpu.models.citcoms.viscosity import element_materials
from g4s_tpu.parallel.halo import halo_exchange_add
from g4s_tpu.parallel.collectives import psum_scalar

AXES = ("bx", "by")


def _block_slices(n_nodes: int, parts: int):
    """Overlapping node ranges per block along one axis (shared planes)."""
    nel = n_nodes - 1
    assert nel % parts == 0, f"{nel} elements not divisible by {parts} blocks"
    step = nel // parts
    return [(i * step, i * step + step + 1) for i in range(parts)]


class DistributedCitcom:
    """Builds per-block static arrays and the shard_map timestep."""

    def __init__(self, cfg: CitcomConfig, mesh: Mesh, *, dtype=jnp.float64):
        assert tuple(mesh.axis_names) == AXES
        px, py = mesh.shape["bx"], mesh.shape["by"]
        self.mesh_dev = mesh
        self.cfg = cfg
        self.dtype = dtype
        self.px, self.py = px, py

        gmesh = build_regional_mesh(cfg)
        geo = build_geometry(gmesh)
        self.gmesh, self.geo = gmesh, geo
        nox, noy, noz = cfg.nodex, cfg.nodey, cfg.nodez
        xs = _block_slices(nox, px)
        ys = _block_slices(noy, py)
        self.nxl = xs[0][1] - xs[0][0]
        self.nyl = ys[0][1] - ys[0][0]
        self.noz = noz
        nxl, nyl = self.nxl, self.nyl
        self.nno_loc = nxl * nyl * noz
        exl, eyl = nxl - 1, nyl - 1
        self.nel_loc = exl * eyl * (noz - 1)

        # local IEN on the local grid (same for every block)
        sub_cfg_ien = self._local_ien(nyl, nxl, noz)
        self.ien_loc = sub_cfg_ien

        # global grids for slicing
        grid_nodes = np.arange(gmesh.nno).reshape(noy, nox, noz)
        e_grid = np.arange(gmesh.nel).reshape(noy - 1, nox - 1, noz - 1)

        def for_blocks(fn):
            out = []
            for bx in range(px):
                for by in range(py):
                    out.append(fn(bx, by))
            return np.stack(out)

        def node_ids(bx, by):
            y0, y1 = ys[by]
            x0, x1 = xs[bx]
            return grid_nodes[y0:y1, x0:x1, :].reshape(-1)

        def elem_ids(bx, by):
            y0, y1 = ys[by]
            x0, x1 = xs[bx]
            return e_grid[y0:y1 - 1, x0:x1 - 1, :].reshape(-1)

        # per-block element tensors (stacked on a leading device axis)
        to = lambda x: jnp.asarray(x, dtype)
        self.B = to(for_blocks(lambda bx, by: geo.B[elem_ids(bx, by)]))
        self.gda = to(for_blocks(lambda bx, by: geo.gda[elem_ids(bx, by)]))
        self.cc = to(for_blocks(lambda bx, by: geo.cc[elem_ids(bx, by)]))
        self.G = to(for_blocks(lambda bx, by: geo.G[elem_ids(bx, by)]))
        self.e_area = to(for_blocks(lambda bx, by: geo.volume[elem_ids(bx, by)]))
        self.mat = jnp.asarray(for_blocks(
            lambda bx, by: element_materials(
                cfg, gmesh.e_center[elem_ids(bx, by), 2], cfg.radius_outer)))
        self.vbc_mask = jnp.asarray(for_blocks(
            lambda bx, by: gmesh.vbc_mask[node_ids(bx, by)]))
        self.vbc_val = to(for_blocks(
            lambda bx, by: gmesh.vbc_val[node_ids(bx, by)]))
        self.tbc_mask = jnp.asarray(for_blocks(
            lambda bx, by: gmesh.tbc_mask[node_ids(bx, by)]))
        self.tbc_val = to(for_blocks(
            lambda bx, by: gmesh.tbc_val[node_ids(bx, by)]))
        self.T0 = to(for_blocks(
            lambda bx, by: initial_temperature(gmesh)[node_ids(bx, by)]))
        self.e_size = to(for_blocks(
            lambda bx, by: gmesh.e_size[elem_ids(bx, by)]))

        # ownership weights: low-x/low-y shared planes owned by the neighbor
        def owner(bx, by):
            w = np.ones((nyl, nxl, noz))
            if bx > 0:
                w[:, 0, :] = 0.0
            if by > 0:
                w[0, :, :] = 0.0
            return w.reshape(-1)
        self.own = to(for_blocks(owner))

        self.total_volume = float(geo.volume.sum())
        self.plan = asm.ScatterPlan.build(self.ien_loc, self.nno_loc)
        self.ien_d = jnp.asarray(self.ien_loc)
        self.N = to(geo.N)
        self.gweight = to(geo.gweight)
        self.uzawa_params = sol.UzawaParams(
            cfg.accuracy, cfg.inner_accuracy_scale, cfg.piterations,
            cfg.vlowstep, cfg.check_pressure_convergence)
        self.diff_dt = 0.5 * float((gmesh.e_size ** 2).min())

        self.gradN = to(self._build_gradN(xs, ys))

        # per-block layer weights for the buoyancy horizontal average
        lw = self._layer_weights()
        self.layer_w = to(for_blocks(
            lambda bx, by: lw[node_ids(bx, by)] *
            owner(bx, by)))           # count shared nodes once

        self._step_sharded = self._build_step()

    # ------------------------------------------------------------------
    @staticmethod
    def _local_ien(nyl, nxl, noz):
        iy, jx, kz = np.meshgrid(np.arange(nyl - 1), np.arange(nxl - 1),
                                 np.arange(noz - 1), indexing="ij")
        corners = []
        for (dy, dx, dz) in [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0),
                             (0, 0, 1), (0, 1, 1), (1, 1, 1), (1, 0, 1)]:
            corners.append((((iy + dy) * nxl + (jx + dx)) * noz + kz + dz)
                           .ravel())
        return np.stack(corners, axis=1).astype(np.int32)

    def _layer_weights(self):
        m = self.gmesh
        cfg = self.cfg
        nox, noy, noz = cfg.nodex, cfg.nodey, cfg.nodez
        w = np.zeros((noy, nox, noz))
        th, r = m.theta, m.r
        dphi = m.fi[1] - m.fi[0] if noy > 1 else 1.0
        for j in range(nox - 1):
            band = np.cos(th[j]) - np.cos(th[j + 1])
            for k in range(noz):
                cell = 0.25 * band * dphi * r[k] ** 2
                w[:-1, j, k] += cell
                w[1:, j, k] += cell
                w[:-1, j + 1, k] += cell
                w[1:, j + 1, k] += cell
        return w.reshape(-1)

    # ------------------------------------------------------------------
    def _halo_nodes(self, u):
        """Additive halo over the (nyl, nxl) node grid; u: (nno_loc, k)."""
        shp = u.shape
        g = u.reshape(self.nyl, self.nxl, self.noz, -1)
        g = halo_exchange_add(g, [("by", 0), ("bx", 1)])
        return g.reshape(shp)

    def _build_step(self):
        cfg = self.cfg
        nno_loc, nel_loc = self.nno_loc, self.nel_loc
        axes = AXES

        def local_problem(blk, tmass_inv_nmass):
            (B, gda, cc, G, e_area, mat, vbc_mask, vbc_val, own) = blk
            nmass = tmass_inv_nmass

            def build_ops(T):
                from g4s_tpu.models.citcoms.viscosity import viscosity_at_vpts
                evisc = viscosity_at_vpts(cfg, mat, T, self.ien_d, self.N)
                elt_k = asm.build_elt_k(B, gda, self.gweight, evisc)
                diag = self.plan.scatter(
                    jnp.einsum("eaa->ea", elt_k).reshape(-1, 8, 3))
                diag = self._halo_nodes(diag)
                BI = jnp.where(diag != 0.0, 1.0 / diag, 1.0)
                BPI = asm.build_bpi(G, BI, self.ien_d, vbc_mask)
                ops = asm.StokesOperators(self.ien_d, elt_k, G, vbc_mask,
                                          vbc_val, BI, BPI, self.plan)
                return ops

            def mk_prob(ops):
                def A(u):
                    u_el = jnp.take(u, ops.ien, axis=0).reshape(-1, 24)
                    au = self.plan.scatter(
                        jnp.einsum("eab,eb->ea", ops.elt_k, u_el)
                        .reshape(-1, 8, 3))
                    au = self._halo_nodes(au)
                    return asm.strip_bcs(au, vbc_mask)

                def grad_p(p):
                    f = self.plan.scatter(G * p[:, None, None])
                    f = self._halo_nodes(f)
                    return asm.strip_bcs(f, vbc_mask)

                def div(u):
                    return jnp.einsum(
                        "eai,eai->e", G, jnp.take(u, ops.ien, axis=0))

                w3 = own[:, None]
                dot_v = lambda a, b: psum_scalar(
                    jnp.sum(a * b * w3), axes)
                dot_p = lambda a, b: psum_scalar(jnp.vdot(a, b), axes)
                v_norm2 = lambda v: psum_scalar(
                    jnp.sum(v * v * (nmass * own)[:, None]),
                    axes) / self.total_volume
                p_norm2 = lambda p: psum_scalar(
                    jnp.sum(p * p * e_area), axes) / self.total_volume
                div_norm2 = lambda p: psum_scalar(
                    jnp.sum(p * p / e_area), axes) / self.total_volume
                return sol.StokesProblem(
                    A, grad_p, div, dot_v, dot_p, ops.BI, ops.BPI,
                    lambda u: asm.strip_bcs(u, vbc_mask),
                    v_norm2, p_norm2, div_norm2)

            return build_ops, mk_prob

        def timestep(T, Tdot, V, Pr, time, blk_all):
            (B, gda, cc, G, e_area, mat, vbc_mask, vbc_val, own,
             tbc_mask1, tbc_val1, e_size, layer_w, gradN) = blk_all
            blk = (B, gda, cc, G, e_area, mat, vbc_mask, vbc_val, own)
            tbc_mask = tbc_mask1
            tbc_val = tbc_val1

            # lumped mass (halo-summed)
            mass = self.plan.scatter(jnp.einsum(
                "ag,eg,g->ea", self.N, gda, self.gweight)[:, :, None])[:, 0]
            mass = self._halo_nodes(mass[:, None])[:, 0]
            tmass = 1.0 / mass
            nmass = mass

            # ---- advection (SUPG) ----
            from g4s_tpu.models.citcoms.shapes import shape_n, _PPOINT
            adv_geo = _AdvGeo(self.N, jnp.asarray(shape_n(_PPOINT),
                                                  self.dtype),
                              self.gweight, gda, gradN, e_size, tmass)
            vv = jnp.take(V, self.ien_d, axis=0)
            uc = jnp.einsum("eai,a->ei", vv, adv_geo.N_center[:, 0])
            rate = jnp.sum(jnp.abs(uc) / e_size, axis=1)
            step = 0.5 / lax.pmax(jnp.max(rate), axes)
            dt = 1e-32 + jnp.minimum(cfg.finetunedt * step, self.diff_dt)

            T = T + (1.0 - cfg.adv_gamma) * dt * Tdot
            Tdot0 = jnp.zeros_like(Tdot)
            Tn, Tdn = T, Tdot0
            for _ in range(cfg.adv_sub_iterations):
                DT = self._pg_residual_dist(adv_geo, Tn, Tdn, V, tbc_mask)
                Tn = Tn + cfg.adv_gamma * dt * DT
                Tdn = Tdn + DT
                Tn = jnp.where(tbc_mask, tbc_val, Tn)
            T, Tdot = Tn, Tdn

            # ---- buoyancy with global layer average ----
            buoy = cfg.rayleigh * T
            layer = jnp.arange(nno_loc, dtype=jnp.int32) % self.noz
            wsum = psum_scalar(jax.ops.segment_sum(layer_w, layer, self.noz),
                               axes)
            bsum = psum_scalar(jax.ops.segment_sum(buoy * layer_w, layer,
                                                   self.noz), axes)
            buoy = buoy - jnp.take(bsum / wsum, layer)

            # ---- Stokes ----
            build_ops, mk_prob = local_problem(blk, nmass)
            ops = build_ops(T)
            f_nodes = jnp.take(buoy, self.ien_d, axis=0)
            f_gs = jnp.einsum("ea,ag->eg", f_nodes, self.N)
            wq = f_gs * gda * self.gweight[None, :]
            contrib = jnp.einsum("eg,ag,egia->eai", wq, self.N, cc[:, :, 2])
            F = self.plan.scatter(contrib)
            vb = jnp.where(vbc_mask, vbc_val, 0.0)
            u_el = jnp.take(vb, self.ien_d, axis=0).reshape(-1, 24)
            F = F - self.plan.scatter(
                jnp.einsum("eab,eb->ea", ops.elt_k, u_el).reshape(-1, 8, 3))
            F = self._halo_nodes(F)
            F = asm.strip_bcs(F, vbc_mask)

            prob = mk_prob(ops)
            fdotf = jnp.sqrt(prob.dot_v(F, F))
            V = asm.apply_vbc(V, vbc_mask, vbc_val)
            V, Pr, mon = sol.uzawa_cg(prob, V, Pr, F, fdotf,
                                      self.uzawa_params)
            diag = StepDiagnostics(dt, mon.v_norm, mon.p_norm,
                                   mon.incompressibility,
                                   mon.outer_iterations,
                                   mon.inner_iterations)
            return T, Tdot, V, Pr, time + dt, diag

        spec_n = P(AXES)          # leading device axis split over both
        blk_specs = tuple([spec_n] * 14)
        f = shard_map(
            lambda T, Td, V, Pr, t, *blk: _squeeze_wrap(timestep, T, Td, V,
                                                        Pr, t, blk),
            mesh=self.mesh_dev,
            in_specs=(spec_n, spec_n, spec_n, spec_n, P(), *blk_specs),
            out_specs=(spec_n, spec_n, spec_n, spec_n, P(), P()),
            check_vma=False)
        return f

    def _build_gradN(self, xs, ys):
        """Per-block physical shape-fn gradients, stacked on the device axis."""
        from g4s_tpu.models.citcoms.shapes import shape_dn, _GAUSS
        gmesh, cfg = self.gmesh, self.cfg
        coords = gmesh.sx[gmesh.ien]
        dth = coords[:, 1, 0] - coords[:, 0, 0]
        dfi = coords[:, 3, 1] - coords[:, 0, 1]
        dr = coords[:, 4, 2] - coords[:, 0, 2]
        half = 0.5 * np.stack([dth, dfi, dr], axis=1)
        dN = shape_dn(_GAUSS)
        gnx = dN[None] / half[:, None, None, :]
        rtf = self.geo.rtf
        ra = 1.0 / rtf[:, :, 2]
        isi = 1.0 / np.sin(rtf[:, :, 0])
        grad = np.stack([
            gnx[:, :, :, 0].transpose(0, 2, 1) * ra[:, :, None],
            gnx[:, :, :, 1].transpose(0, 2, 1) * (ra * isi)[:, :, None],
            gnx[:, :, :, 2].transpose(0, 2, 1)], axis=2)
        nox, noy, noz = cfg.nodex, cfg.nodey, cfg.nodez
        e_grid = np.arange(gmesh.nel).reshape(noy - 1, nox - 1, noz - 1)
        out = []
        for bx in range(self.px):
            for by in range(self.py):
                y0, y1 = ys[by]
                x0, x1 = xs[bx]
                out.append(grad[e_grid[y0:y1 - 1, x0:x1 - 1, :].reshape(-1)])
        return np.stack(out)

    def _pg_residual_dist(self, adv, T, Tdot, V, tbc_mask):
        vv = jnp.take(V, self.ien_d, axis=0)
        uc = jnp.einsum("eai,a->ei", vv, adv.N_center[:, 0])
        diff = self.cfg.inputdiffusivity
        twodiff = 2.0 * diff
        u_l = jnp.abs(uc) * adv.e_size
        xse = jnp.where(u_l > twodiff, 1.0 - twodiff / u_l, 0.0)
        unorm = jnp.sum(uc * uc, axis=1)
        adiff = jnp.where(unorm > 1e-6,
                          jnp.sum(u_l * xse, axis=1) / (2.0 * unorm), 0.0)
        u_g = jnp.einsum("eai,ag->egi", vv, adv.N)
        ugn = jnp.einsum("egi,egia->ega", u_g, adv.gradN)
        PG = adv.N.T[None] + adiff[:, None, None] * ugn
        T_el = jnp.take(T, self.ien_d, axis=0)
        Td_el = jnp.take(jnp.where(tbc_mask, 0.0, Tdot), self.ien_d, axis=0)
        dT_g = jnp.einsum("ea,ag->eg", Td_el, adv.N)
        gT = jnp.einsum("ea,egia->egi", T_el, adv.gradN)
        adv_term = jnp.einsum("egi,egi->eg", u_g, gT)
        wg = adv.gda * adv.gweight[None, :]
        res = -jnp.einsum("ega,eg,eg->ea", PG, wg, dT_g + adv_term) \
            - diff * jnp.einsum("egia,egi,eg->ea", adv.gradN, gT, wg)
        DT = self.plan.scatter(res[:, :, None])[:, 0]
        DT = self._halo_nodes(DT[:, None])[:, 0]
        return jnp.where(tbc_mask, 0.0, DT * adv.tmass)

    # ------------------------------------------------------------------
    def init_state(self):
        nblk = self.px * self.py
        put = lambda x: jax.device_put(x, NamedSharding(self.mesh_dev, P(AXES)))
        V0 = jnp.where(self.vbc_mask, self.vbc_val,
                       jnp.zeros((nblk, self.nno_loc, 3), self.dtype))
        return dict(
            T=put(self.T0), Tdot=put(jnp.zeros_like(self.T0)),
            V=put(V0),
            P=put(jnp.zeros((nblk, self.nel_loc), self.dtype)),
            time=jnp.asarray(0.0, self.dtype))

    def step(self, s):
        blk = (self.B, self.gda, self.cc, self.G, self.e_area, self.mat,
               self.vbc_mask, self.vbc_val, self.own, self.tbc_mask,
               self.tbc_val, self.e_size, self.layer_w, self.gradN)
        T, Td, V, Pr, t, diag = self._step_sharded(
            s["T"], s["Tdot"], s["V"], s["P"], s["time"], *blk)
        return dict(T=T, Tdot=Td, V=V, P=Pr, time=t), diag


class _AdvGeo(NamedTuple):
    N: jax.Array
    N_center: jax.Array
    gweight: jax.Array
    gda: jax.Array
    gradN: jax.Array
    e_size: jax.Array
    tmass: jax.Array


def _squeeze_wrap(fn, T, Td, V, Pr, t, blk):
    """shard_map gives each block a leading axis of size 1; squeeze it for
    the local computation and restore it on the way out."""
    sq = lambda x: x[0]
    blk_sq = tuple(sq(b) for b in blk)
    T2, Td2, V2, P2, t2, diag = fn(sq(T), sq(Td), sq(V), sq(Pr), t, blk_sq)
    ex = lambda x: x[None]
    return ex(T2), ex(Td2), ex(V2), ex(P2), t2, diag
