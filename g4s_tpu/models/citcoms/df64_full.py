"""Full-sphere CitcomS timestep in df64 on TPU — the 1e-10 tier for the
CitcomSFull solver branch (citcoms/bin/CitcomSFull.c, Full_solver.c).

df64_step.py covers the regional (structured-grid) model through the
27-point nodal stencil; the merged 12-cap global mesh is unstructured at
the cap seams, so the velocity stiffness here acts in ELEMENT form — the
reference's own e_assemble_del2_u path (Element_calculations.c:475-509)
transcribed to double-word f32: gather u at the incidence, one batched
(nel, 24, 24) df64 contraction, and the PaddedScatter additive assembly.
Everything else (forces, Uzawa CG with iterative-refinement inner
solves, SUPG advection, CFL) reuses the df64 solver core of df64_step,
which is parameterized on the matvec. Net-rotation removal
(Determine_net_rotation.c) runs in df64 against host-precomputed f64
basis vectors and inverse inertia tensor.

Feature envelope: constant or T-dependent viscosity (TDEPV laws 0-4
with VMIN/VMAX, per-step df64 operator re-assembly from eta-held-out
geometry blocks), cgrad inner, free-slip or prescribed-velocity BCs, PG
advection with the max-T guard, and the thermochemical step (df64
tracer advection + ratio composition + chemical buoyancy through
df64_full_tracers.py). No TALA/phase-change/SDEPV/PDEPV/CDEPV-viscosity
— outside the envelope callers use the f64-CPU FullSphereModel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops import df64 as df
from g4s_tpu.models.citcoms.df64_assembly import TDepDF, bpi_df, evisc_df
from g4s_tpu.models.citcoms.df64_step import (
    AdvDF, PaddedScatter, _Norms, _reshape, _take, _tree_sum, _where,
    advect_monitored_df, cfl_timestep_df, forces_df, pg_timestep_df,
    split64, uzawa_cg_df)


# ---------------------------------------------------------------------------
# element-form operator application (mesh-agnostic)
# ---------------------------------------------------------------------------

def elt_matvec_df(eltk_p, ien, scat_nodes, u_pair, vbc_mask, *, strip=True):
    """K u element-by-element in df64 (e_assemble_del2_u transcription):
    one (nel, 24, 24) df.mul + halving tree reduction + padded scatter."""
    u_el = _take(u_pair, ien, axis=0)                       # (nel, 8, 3)
    nel = u_el[0].shape[0]
    u_flat = _reshape(u_el, (nel, 1, 24))
    t = df.mul(eltk_p, u_flat)                              # (nel, 24, 24)
    au = _tree_sum(t, axis=2)                               # (nel, 24)
    f = scat_nodes.apply(_reshape(au, (-1, 3)))             # (nno, 3)
    if strip:
        f = (jnp.where(vbc_mask, 0.0, f[0]), jnp.where(vbc_mask, 0.0, f[1]))
    return f


def elt_matvec_f32(elt_k_hi, ien, plan, u, vbc_mask):
    """f32 element matvec on the hi operator (IR correction solver)."""
    u_el = jnp.take(u, ien, axis=0).reshape(-1, 24)
    au = jnp.einsum("eab,eb->ea", elt_k_hi, u_el)
    au = plan.scatter(au.reshape(-1, 8, 3))
    return jnp.where(vbc_mask, 0.0, au)


def _build_tdep_full(model):
    """Element-form TDEPV statics for the full sphere: the per-Gauss
    geometry blocks M[e,g] = w_g |J|_eg B^T D B|_eg with viscosity held
    out (elt_k is linear in eta — the same factorization build_tdep uses
    for the regional 27-stencil, kept in (nel, 8g, 24, 24) element form
    because the merged 12-cap mesh has no structured stencil), plus the
    viscosity-law constants for evisc_df."""
    cfg = model.cfg
    B = np.asarray(model.B, np.float64)            # (nel, 8g, 6s, 8a, 3i)
    gda = np.asarray(model.gda, np.float64)
    gw = np.asarray(model.gweight, np.float64)
    W = gw[None, :] * gda
    D = np.array([2.0, 2.0, 2.0, 1.0, 1.0, 1.0])
    BD = B * D[None, None, :, None, None]
    M = np.einsum("egsai,egsbj->egaibj", BD, B, optimize=True) \
        * W[:, :, None, None, None, None]
    nel = B.shape[0]
    M = M.reshape(nel, 8, 24, 24)
    mat = np.asarray(model.mat)
    pick = lambda v: np.asarray(v, np.float64)[
        np.minimum(mat, len(np.atleast_1d(v)) - 1)]
    td = TDepDF(
        None, None, split64(np.asarray(model.N, np.float64)),
        split64(pick(cfg.visc0)), split64(pick(cfg.viscE)),
        split64(pick(cfg.viscT)), split64(pick(cfg.viscZ)),
        int(cfg.rheol),
        float(cfg.visc_min) if cfg.VMIN else None,
        float(cfg.visc_max) if cfg.VMAX else None,
        None, bool(cfg.TDEPV and any(e != 0.0 for e in cfg.viscE)))
    return td, split64(M), jnp.asarray(M.astype(np.float32))


def elt_k_from_eta_df(M_el_p, eta_p):
    """elt_k pairs (nel, 24, 24) = sum_g eta[e,g] * M[e,g]: 8 df64
    multiply-adds against the element geometry blocks (the
    construct_stiffness_B_matrix role on the unstructured mesh)."""
    acc = None
    for g in range(8):
        Mg = (M_el_p[0][:, g], M_el_p[1][:, g])             # (nel, 24, 24)
        eh = jnp.broadcast_to(eta_p[0][:, g, None, None], Mg[0].shape)
        el = jnp.broadcast_to(eta_p[1][:, g, None, None], Mg[0].shape)
        term = df.mul((eh, el), Mg)
        acc = term if acc is None else df.add(acc, term)
    return acc


def bi_from_elt_k_df(eltk_p, scat_nodes):
    """Jacobi preconditioner 1/diag(K) from the element diagonals
    (build_diag_K in df64, element form)."""
    dh = jnp.diagonal(eltk_p[0], axis1=1, axis2=2).reshape(-1, 3)
    dl = jnp.diagonal(eltk_p[1], axis1=1, axis2=2).reshape(-1, 3)
    diag = scat_nodes.apply((dh, dl))                       # (nno, 3)
    ones = (jnp.ones_like(diag[0]), jnp.zeros_like(diag[1]))
    inv = df.div(ones, _where(diag[0] != 0.0, diag, ones))
    return _where(diag[0] != 0.0, inv, ones)


def _col(pair, i):
    return pair[0][:, i], pair[1][:, i]


def _cross_df(a, b):
    """Componentwise df64 cross product for (n, 3) pairs."""
    outs = []
    for i, j, k in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        outs.append(df.sub(df.mul(_col(a, j), _col(b, k)),
                           df.mul(_col(a, k), _col(b, j))))
    h = jnp.stack([o[0] for o in outs], axis=1)
    l = jnp.stack([o[1] for o in outs], axis=1)
    return h, l


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------

class DF64FullModel:
    """One-device-dispatch df64 full-sphere timestep.

    Built FROM a CPU-f64 FullSphereModel (whose host tensors are the
    exact f64 geometry); all static tensors split into (hi, lo) pairs
    once. State carried f64 on host, split/merged per step."""

    def __init__(self, model, *, inner: str = "ir"):
        cfg = model.cfg
        self.cfg = cfg
        if inner not in ("ir", "df"):
            raise ValueError(f"inner must be 'ir' or 'df': {inner}")
        self.inner_ir = inner == "ir"
        if (cfg.disptn_number != 0.0 or cfg.SDEPV or cfg.PDEPV or cfg.CDEPV
                or cfg.Ra_410 != 0.0 or cfg.Ra_670 != 0.0
                or cfg.Ra_cmb != 0.0):
            raise NotImplementedError(
                "DF64FullModel covers the (T-dependent-)viscosity "
                "full-sphere envelope; use the f64 FullSphereModel "
                "otherwise")
        self.tdepv = bool(cfg.TDEPV and any(e != 0.0 for e in cfg.viscE))
        m = model.mesh
        self._mesh = m
        np64 = lambda x: np.asarray(x, np.float64)
        self.ien = jnp.asarray(np.asarray(m.ien))
        self.nno, self.nel = m.nno, m.nel
        self.noz = cfg.nodez
        self.vbc_mask = jnp.asarray(np.asarray(model.vbc_mask))
        self.tbc_mask = jnp.asarray(np.asarray(model.tbc_mask))
        self.vbc_val_p = split64(np64(model.vbc_val))
        self.tbc_val_p = split64(np64(model.tbc_val))
        g = model.geo
        self.G_p = split64(np64(g.G))
        self.N_p = split64(np64(g.N))
        self.gda_p = split64(np64(g.gda))
        self.gw_p = split64(np64(g.gweight))
        self.ccr_p = split64(np64(g.cc)[:, :, 2])          # (nel,8g,3,8a)

        self.scat_nodes = PaddedScatter.build(np.asarray(m.ien).ravel(),
                                              m.nno)
        self.plan = model.plan
        if self.tdepv:
            # viscosity changes per step: precompute the eta-held-out
            # geometry blocks; elt_k/BI/BPI re-assemble on device
            self.td, self.M_el_p, self.M_el_hi = _build_tdep_full(model)
            self.eltk_p = self.eltk_hi = self.BI_p = self.BPI_p = None
        else:
            # constant operators computed ONCE in true f64 on the CPU
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                s0 = model.init_state()
                ops = model._build_ops(s0.T)
            eltk64 = np.asarray(ops.elt_k, np.float64)
            self.eltk_p = split64(eltk64)
            self.eltk_hi = jnp.asarray(eltk64.astype(np.float32))
            self.BI_p = split64(np.asarray(ops.BI, np.float64))
            self.BPI_p = split64(np.asarray(ops.BPI, np.float64))
            self.td = None

        nmass64 = np64(model.nmass)                        # lumped mass
        self.norms = _Norms(split64(nmass64), split64(np64(model.e_area)),
                            split64(np.float64(1.0 / model.total_volume)))
        # buoyancy layer weights: z-fastest node layout -> (nsurf, noz)
        w2 = nmass64.reshape(-1, self.noz)
        self.lw_p = split64(w2)
        self.lwsum_p = split64(w2.sum(axis=0))
        self.rayleigh = np.float64(cfg.rayleigh)

        # advection statics (the general-mesh SUPG tensors)
        self.adv = AdvDF(
            self.N_p, split64(np64(model.N_center)[:, 0]), self.gw_p,
            self.gda_p, split64(np64(model.gradN)),
            split64(np64(model.e_size)), split64(np64(model.tmass)),
            split64(np.float64(model.diff_dt)))
        self.diff_p = split64(np.float64(cfg.inputdiffusivity))
        self.Q0_p = split64(np.float64(cfg.Q0))

        # net-rotation statics (remove_rigid_rot): spherical basis,
        # Cartesian coordinates, mass weights, inverse inertia — all
        # exact-f64 host precomputes
        sx = np64(m.sx)
        th, fi = sx[:, 0], sx[:, 1]
        st, ct, sf, cf = np.sin(th), np.cos(th), np.sin(fi), np.cos(fi)
        e_t = np.stack([ct * cf, ct * sf, -st], axis=1)
        e_f = np.stack([-sf, cf, np.zeros_like(sf)], axis=1)
        e_r = np.stack([st * cf, st * sf, ct], axis=1)
        E = np.stack([e_t, e_f, e_r], axis=1)              # (nno, 3i, 3c)
        self.E_p = split64(E)
        xyz = np64(model._xyz)
        self.xyz_p = split64(xyz)
        self.w_p = split64(nmass64)
        r2 = np.sum(xyz * xyz, axis=1, keepdims=True)
        inertia = (np.sum(nmass64[:, None] * r2) * np.eye(3)
                   - (xyz * nmass64[:, None]).T @ xyz)
        self.Iinv_p = split64(np.linalg.inv(inertia))

        # nocache_jit: see df64_step.py — serializer aborts on these
        from g4s_tpu.utils.platform import nocache_jit
        self._step_fn = nocache_jit(self._timestep_impl)
        self._stokes_jit = nocache_jit(self._stokes_impl)

    # -- operator closures --

    def _operators(self, T_p):
        """(eltk_p, eltk_hi, BI_p, BPI_p) for this step: the constant
        precomputes, or the TDEPV re-assembly from T (the
        construct_stiffness_B_matrix-after-viscosity-update role)."""
        if not self.tdepv:
            return self.eltk_p, self.eltk_hi, self.BI_p, self.BPI_p
        eta = evisc_df(self.td, T_p, self.ien)             # (nel, 8g)
        eltk_p = elt_k_from_eta_df(self.M_el_p, eta)
        eltk_hi = jnp.einsum("eg,egab->eab", eta[0], self.M_el_hi)
        BI_p = bi_from_elt_k_df(eltk_p, self.scat_nodes)
        BPI_p = bpi_df(self.G_p, BI_p, self.ien, self.vbc_mask)
        return eltk_p, eltk_hi, BI_p, BPI_p

    def matvec(self, u_pair, strip=True):
        if self.tdepv:
            raise NotImplementedError(
                "TDEPV operators are per-step; use _operators(T_p)")
        return elt_matvec_df(self.eltk_p, self.ien, self.scat_nodes,
                             u_pair, self.vbc_mask, strip=strip)

    def matvec_f32(self, u):
        if self.tdepv:
            raise NotImplementedError(
                "TDEPV operators are per-step; use _operators(T_p)")
        return elt_matvec_f32(self.eltk_hi, self.ien, self.plan, u,
                              self.vbc_mask)

    # -- physics pieces --

    def _buoyancy(self, T_p, C_p=None):
        buoy = df.mul_f(T_p, np.float32(self.rayleigh))
        if C_p is not None:
            buoy = df.sub(buoy, df.mul_f(
                C_p, np.float32(self.rayleigh * self.cfg.buoyancy_ratio)))
        b2 = _reshape(buoy, (-1, self.noz))
        bsum = _tree_sum(df.mul(b2, self.lw_p), axis=0)     # (noz,)
        have = df.div(bsum, self.lwsum_p)
        b = df.sub(b2, (jnp.broadcast_to(have[0][None], b2[0].shape),
                        jnp.broadcast_to(have[1][None], b2[0].shape)))
        return _reshape(b, (-1,))

    def _remove_net_rotation(self, V_p):
        E = self.E_p
        t = df.mul((V_p[0][:, :, None], V_p[1][:, :, None]), E)
        v_cart = _tree_sum(t, axis=1)                       # (nno, 3c)
        cx = _cross_df(self.xyz_p, v_cart)
        Lw = df.mul(cx, (self.w_p[0][:, None], self.w_p[1][:, None]))
        L = _tree_sum(Lw, axis=0)                           # (3,)
        om = df.mul(self.Iinv_p, (L[0][None, :], L[1][None, :]))
        omega = _tree_sum(om, axis=1)                       # (3,)
        ob = (jnp.broadcast_to(omega[0], self.xyz_p[0].shape),
              jnp.broadcast_to(omega[1], self.xyz_p[0].shape))
        v_new = df.sub(v_cart, _cross_df(ob, self.xyz_p))
        t = df.mul((v_new[0][:, None, :], v_new[1][:, None, :]), E)
        return _tree_sum(t, axis=2)                         # (nno, 3i)

    def _stokes_impl(self, T_p, V_p, P_p, C_p=None):
        cfg = self.cfg
        eltk_p, eltk_hi, BI_p, BPI_p = self._operators(T_p)

        def matvec(u_pair, strip=True):
            return elt_matvec_df(eltk_p, self.ien, self.scat_nodes,
                                 u_pair, self.vbc_mask, strip=strip)

        def matvec_f32(u):
            return elt_matvec_f32(eltk_hi, self.ien, self.plan, u,
                                  self.vbc_mask)

        buoy = self._buoyancy(T_p, C_p)
        F = forces_df(self.N_p, self.gda_p, self.gw_p, self.ccr_p,
                      self.ien, self.scat_nodes, buoy, None,
                      self.vbc_mask, self.vbc_val_p, matvec=matvec)
        V = _where(self.vbc_mask, self.vbc_val_p, V_p)
        V, P, mon = uzawa_cg_df(
            None, BI_p, BPI_p, self.G_p, self.ien,
            self.scat_nodes, self.norms, V, P_p, F, self.vbc_mask,
            cfg.accuracy, cfg.inner_accuracy_scale,
            cfg.piterations, cfg.vlowstep, cfg.check_pressure_convergence,
            inner_ir=self.inner_ir, matvec=matvec,
            matvec_f32=matvec_f32)
        V = self._remove_net_rotation(V)
        return V, P, mon

    def _timestep_impl(self, T_p, Td_p, V_p, P_p):
        cfg = self.cfg
        dt0 = cfl_timestep_df(self.adv, self.ien, V_p, cfg.finetunedt)

        def advect(dt_p):
            return pg_timestep_df(
                self.adv, self.ien, self.scat_nodes, T_p, Td_p, V_p, dt_p,
                diff_p=self.diff_p, Q0_p=self.Q0_p, gamma=cfg.adv_gamma,
                sub_iterations=cfg.adv_sub_iterations,
                tbc_mask=self.tbc_mask, tbc_val_p=self.tbc_val_p)

        T, Td, dt = advect_monitored_df(advect, T_p, dt0, self.tbc_mask,
                                        cfg.monitor_max_T)
        V, P, mon = self._stokes_impl(T, V_p, P_p)
        return T, Td, V, P, dt, mon

    # -- host API (CPU-f64 State in/out, like DF64Model) --

    def initial_solve(self, s):
        V, P, mon = self._stokes_jit(split64(np.asarray(s.T)),
                                     split64(np.asarray(s.V)),
                                     split64(np.asarray(s.P)))
        return dataclasses.replace(
            s, V=jnp.asarray(df.to_f64(V)), P=jnp.asarray(df.to_f64(P))), mon

    def step(self, s):
        T, Td, V, P, dt, mon = self._step_fn(
            split64(np.asarray(s.T)), split64(np.asarray(s.Tdot)),
            split64(np.asarray(s.V)), split64(np.asarray(s.P)))
        dt64 = float(np.float64(np.asarray(dt[0], np.float64))
                     + np.asarray(dt[1], np.float64))
        new = dataclasses.replace(
            s, T=jnp.asarray(df.to_f64(T)), Tdot=jnp.asarray(df.to_f64(Td)),
            V=jnp.asarray(df.to_f64(V)), P=jnp.asarray(df.to_f64(P)),
            time=s.time + dt64, dt=jnp.asarray(dt64), step=s.step + 1)
        return new, {"dt": dt64, "v_norm": float(df.to_f64(mon[0])),
                     "p_norm": float(df.to_f64(mon[1])),
                     "incompressibility": float(df.to_f64(mon[2])),
                     "outer": int(mon[3]), "inner": int(mon[4])}

    # -- thermochemical step (Full_tracer_advection.c capability) --

    def _timestep_tracers_impl(self, T_p, Td_p, V_p, P_p, pos_p, flavors):
        """Thermochemical full-sphere timestep: guarded T advection,
        tracer advection with the same dt and the PRE-solve velocity
        (matching FullSphereModel._timestep_tracers), ratio composition
        -> chemical buoyancy in the Stokes solve."""
        from g4s_tpu.models.citcoms.df64_full_tracers import (
            advect_tracers_full_df, element_composition_full_df)
        from g4s_tpu.models.citcoms.df64_tracers import \
            composition_to_nodes_df
        cfg = self.cfg
        dt0 = cfl_timestep_df(self.adv, self.ien, V_p, cfg.finetunedt)

        def advect(dt_p):
            return pg_timestep_df(
                self.adv, self.ien, self.scat_nodes, T_p, Td_p, V_p, dt_p,
                diff_p=self.diff_p, Q0_p=self.Q0_p, gamma=cfg.adv_gamma,
                sub_iterations=cfg.adv_sub_iterations,
                tbc_mask=self.tbc_mask, tbc_val_p=self.tbc_val_p)

        T, Td, dt = advect_monitored_df(advect, T_p, dt0, self.tbc_mask,
                                        cfg.monitor_max_T)
        pos = advect_tracers_full_df(self._tfdf, V_p, pos_p, dt)
        comps, _ = element_composition_full_df(self._tfdf, pos, flavors, 2)
        C = composition_to_nodes_df(None, comps[1], self.scat_nodes)
        V, P, mon = self._stokes_impl(T, V_p, P_p, C_p=C)
        return T, Td, V, P, dt, mon, pos, C

    def step_tracers(self, s, pos, flavors):
        """Whole thermochemical step on device; pos (n, 3) Cartesian f64.
        Returns (state, diag, pos64, C_nodes64)."""
        if not hasattr(self, "_tfdf"):
            from g4s_tpu.models.citcoms.df64_full_tracers import \
                FullTracerDF
            self._tfdf = FullTracerDF.build(self._mesh)
            from g4s_tpu.utils.platform import nocache_jit
            self._step_tr_fn = nocache_jit(self._timestep_tracers_impl)
        T, Td, V, P, dt, mon, pos_o, C = self._step_tr_fn(
            split64(np.asarray(s.T)), split64(np.asarray(s.Tdot)),
            split64(np.asarray(s.V)), split64(np.asarray(s.P)),
            split64(np.asarray(pos)), jnp.asarray(flavors))
        dt64 = float(np.float64(np.asarray(dt[0], np.float64))
                     + np.asarray(dt[1], np.float64))
        new = dataclasses.replace(
            s, T=jnp.asarray(df.to_f64(T)), Tdot=jnp.asarray(df.to_f64(Td)),
            V=jnp.asarray(df.to_f64(V)), P=jnp.asarray(df.to_f64(P)),
            time=s.time + dt64, dt=jnp.asarray(dt64), step=s.step + 1)
        diag = {"dt": dt64, "v_norm": float(df.to_f64(mon[0])),
                "p_norm": float(df.to_f64(mon[1])),
                "incompressibility": float(df.to_f64(mon[2])),
                "outer": int(mon[3]), "inner": int(mon[4])}
        return (new, diag, jnp.asarray(df.to_f64(pos_o)),
                jnp.asarray(df.to_f64(C)))
