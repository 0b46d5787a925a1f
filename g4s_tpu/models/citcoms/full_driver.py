"""Full-sphere convection model (the reference's CitcomSFull solver).

Single-device global solve over the merged 12-cap mesh: the solver
registry's "full" branch (citcoms/lib/Full_solver.c fn-ptr binding). The
inter-cap seams are resolved by node identification (full_mesh merges
them), so the SAME assembly/solver machinery as the regional model runs
globally; the distributed 12-cap variant (pass tables in parallel/sphere)
is the round-2 follow-up.

Free-slip top/bottom leaves the 3 rigid rotations in the operator's
nullspace; `remove_net_rotation` (Determine_net_rotation.c capability)
projects them out of a velocity field.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.citcoms import assembly as asm
from g4s_tpu.models.citcoms import solvers as sol
from g4s_tpu.models.citcoms.config import CitcomConfig
from g4s_tpu.models.citcoms.driver import State, StepDiagnostics
from g4s_tpu.models.citcoms.full_mesh import (build_full_sphere_mesh,
                                              _sph_to_xyz)
from g4s_tpu.models.citcoms.shapes import build_geometry_general, shape_n, _PPOINT
from g4s_tpu.models.citcoms.viscosity import viscosity_at_vpts


class FullSphereModel:
    """CitcomSFull-equivalent global solver (energy + Stokes)."""

    def __init__(self, cfg: CitcomConfig, *, dtype=jnp.float64):
        self.cfg = cfg
        self.dtype = dtype
        self.mesh = build_full_sphere_mesh(cfg.nodex, cfg.nodey, cfg.nodez,
                                           cfg.radius_inner, cfg.radius_outer)
        self.geo = build_geometry_general(self.mesh.sx, self.mesh.ien)
        m, g = self.mesh, self.geo
        to = lambda x: jnp.asarray(x, dtype)
        self.ien = jnp.asarray(m.ien)
        self.plan = asm.ScatterPlan.build(m.ien, m.nno)
        self.N = to(g.N)
        self.gda = to(g.gda)
        self.gweight = to(g.gweight)
        self.cc = to(g.cc)
        self.B = to(g.B)
        self.G = to(g.G)
        self.gradN = to(g.gradN_phys)
        self.e_area = to(g.volume)
        self.total_volume = float(g.volume.sum())
        self.mat = jnp.zeros(m.nel, jnp.int32)

        # BCs: free-slip (u_r = 0) or prescribed at top/bottom
        vbc_mask = np.zeros((m.nno, 3), dtype=bool)
        vbc_val = np.zeros((m.nno, 3))
        vbc_mask[m.surf_ids, 2] = True
        vbc_mask[m.bot_ids, 2] = True
        if cfg.topvbc == 1:
            vbc_mask[m.surf_ids, :] = True
            vbc_val[m.surf_ids, 0] = cfg.topvbxval
            vbc_val[m.surf_ids, 1] = cfg.topvbyval
        tbc_mask = np.zeros(m.nno, dtype=bool)
        tbc_val = np.zeros(m.nno)
        tbc_mask[m.surf_ids] = cfg.toptbc != 0
        tbc_val[m.surf_ids] = cfg.toptbcval
        tbc_mask[m.bot_ids] = cfg.bottbc != 0
        tbc_val[m.bot_ids] = cfg.bottbcval
        self.vbc_mask = jnp.asarray(vbc_mask)
        self.vbc_val = to(vbc_val)
        self.tbc_mask = jnp.asarray(tbc_mask)
        self.tbc_val = to(tbc_val)

        self.tmass = asm.build_tmass(self.plan, self.N, self.gda,
                                     self.gweight)
        self.nmass = 1.0 / self.tmass
        self.uzawa_params = sol.UzawaParams(
            cfg.accuracy, cfg.inner_accuracy_scale, cfg.piterations,
            cfg.vlowstep, cfg.check_pressure_convergence)

        # element physical sizes for CFL (Cartesian edge lengths)
        xyz = _sph_to_xyz(m.sx[:, 0], m.sx[:, 1]) * m.sx[:, 2:3]
        exyz = xyz[m.ien]
        self.e_size = to(np.stack(
            [np.linalg.norm(exyz[:, 1] - exyz[:, 0], axis=1),
             np.linalg.norm(exyz[:, 3] - exyz[:, 0], axis=1),
             np.linalg.norm(exyz[:, 4] - exyz[:, 0], axis=1)], axis=1))
        self.diff_dt = 0.5 * float(np.asarray(self.e_size).min() ** 2)
        self.N_center = to(shape_n(_PPOINT))
        self._xyz = xyz
        self._step_fn = jax.jit(self._timestep)
        self._stokes_fn = jax.jit(self._stokes)

    # ------------------------------------------------------------------
    def init_state(self) -> State:
        cfg = self.cfg
        r = self.mesh.sx[:, 2]
        T = cfg.bottbcval - (cfg.toptbcval + cfg.bottbcval) \
            * (r - cfg.radius_inner) / (cfg.radius_outer - cfg.radius_inner)
        T = np.where(np.asarray(self.tbc_mask), np.asarray(self.tbc_val), T)
        V = asm.apply_vbc(jnp.zeros((self.mesh.nno, 3), self.dtype),
                          self.vbc_mask, self.vbc_val)
        return State(jnp.asarray(T, self.dtype), jnp.zeros(self.mesh.nno,
                                                           self.dtype),
                     V, jnp.zeros(self.mesh.nel, self.dtype),
                     jnp.asarray(0.0, self.dtype),
                     jnp.asarray(0.0, self.dtype), jnp.asarray(0, jnp.int32))

    def buoyancy(self, T, C=None):
        """Ra*T minus chemical buoyancy (get_buoyancy:
        buoy -= Ra * buoyancy_ratio * C) minus the per-radial-layer
        average (mass-weighted)."""
        noz = self.cfg.nodez
        layer = jnp.arange(self.mesh.nno, dtype=jnp.int32) % noz
        w = self.nmass
        buoy = self.cfg.rayleigh * T
        if C is not None:
            buoy = buoy - self.cfg.rayleigh * self.cfg.buoyancy_ratio * C
        have = jax.ops.segment_sum(buoy * w, layer, noz) \
            / jax.ops.segment_sum(w, layer, noz)
        return buoy - jnp.take(have, layer)

    def _build_ops(self, T):
        evisc = viscosity_at_vpts(self.cfg, self.mat, T, self.ien, self.N)
        elt_k = asm.build_elt_k(self.B, self.gda, self.gweight, evisc)
        BI = asm.build_diag_K(elt_k, self.plan)
        BPI = asm.build_bpi(self.G, BI, self.ien, self.vbc_mask)
        return asm.StokesOperators(self.ien, elt_k, self.G, self.vbc_mask,
                                   self.vbc_val, BI, BPI, self.plan)

    def _stokes(self, T, V, P, C=None):
        ops = self._build_ops(T)
        buoy = self.buoyancy(T, C)
        F = asm.assemble_forces(ops, self.N, self.gda, self.gweight,
                                self.cc, buoy)
        fdotf = jnp.sqrt(jnp.vdot(F, F))
        V = asm.apply_vbc(V, self.vbc_mask, self.vbc_val)
        prob = sol.local_problem(ops, self.nmass, self.e_area,
                                 self.total_volume)
        V, P, mon = sol.uzawa_cg(prob, V, P, F, fdotf, self.uzawa_params)
        V = self.remove_net_rotation(V)
        return V, P, mon

    # ------------------------------------------------------------------
    def remove_net_rotation(self, V):
        """Project the rigid rotations out of V (remove_rigid_rot /
        Determine_net_rotation.c): omega = I^-1 L with L = int r x u dV."""
        xyz = jnp.asarray(self._xyz, V.dtype)
        # spherical components -> Cartesian velocity
        th, fi = (jnp.asarray(self.mesh.sx[:, 0], V.dtype),
                  jnp.asarray(self.mesh.sx[:, 1], V.dtype))
        st, ct = jnp.sin(th), jnp.cos(th)
        sf, cf = jnp.sin(fi), jnp.cos(fi)
        e_t = jnp.stack([ct * cf, ct * sf, -st], axis=1)
        e_f = jnp.stack([-sf, cf, jnp.zeros_like(sf)], axis=1)
        e_r = jnp.stack([st * cf, st * sf, ct], axis=1)
        v_cart = (V[:, 0:1] * e_t + V[:, 1:2] * e_f + V[:, 2:3] * e_r)
        w = self.nmass[:, None]
        L = jnp.sum(w * jnp.cross(xyz, v_cart), axis=0)
        # inertia tensor I = int (|r|^2 delta - r r^T) dV
        r2 = jnp.sum(xyz * xyz, axis=1, keepdims=True)
        I = (jnp.sum(w * r2) * jnp.eye(3, dtype=V.dtype)
             - (xyz * w).T @ xyz)
        omega = jnp.linalg.solve(I, L)
        v_rot = jnp.cross(jnp.broadcast_to(omega, xyz.shape), xyz)
        v_new = v_cart - v_rot
        # back to spherical components
        return jnp.stack([jnp.sum(v_new * e_t, axis=1),
                          jnp.sum(v_new * e_f, axis=1),
                          jnp.sum(v_new * e_r, axis=1)], axis=1)

    # ------------------------------------------------------------------
    def _pg_residual(self, T, Tdot, V):
        """SUPG residual on the general mesh (gradients from gradN_phys)."""
        cfg = self.cfg
        vv = jnp.take(V, self.ien, axis=0)
        uc = jnp.einsum("eai,a->ei", vv, self.N_center[:, 0])
        diff = cfg.inputdiffusivity
        twodiff = 2.0 * diff
        u_l = jnp.abs(uc) * self.e_size
        xse = jnp.where(u_l > twodiff, 1.0 - twodiff / u_l, 0.0)
        unorm = jnp.sum(uc * uc, axis=1)
        adiff = jnp.where(unorm > 1e-6,
                          jnp.sum(u_l * xse, axis=1) / (2.0 * unorm), 0.0)
        u_g = jnp.einsum("eai,ag->egi", vv, self.N)
        ugn = jnp.einsum("egi,egia->ega", u_g, self.gradN)
        PG = self.N.T[None] + adiff[:, None, None] * ugn
        T_el = jnp.take(T, self.ien, axis=0)
        Td_el = jnp.take(jnp.where(self.tbc_mask, 0.0, Tdot), self.ien,
                         axis=0)
        dT_g = jnp.einsum("ea,ag->eg", Td_el, self.N)
        gT = jnp.einsum("ea,egia->egi", T_el, self.gradN)
        adv_term = jnp.einsum("egi,egi->eg", u_g, gT)
        wg = self.gda * self.gweight[None, :]
        res = -jnp.einsum("ega,eg,eg->ea", PG, wg, dT_g + adv_term - cfg.Q0) \
            - diff * jnp.einsum("egia,egi,eg->ea", self.gradN, gT, wg)
        DT = self.plan.scatter(res[:, :, None])[:, 0]
        return jnp.where(self.tbc_mask, 0.0, DT * self.tmass)

    def _cfl_dt(self, V):
        cfg = self.cfg
        vv = jnp.take(V, self.ien, axis=0)
        uc = jnp.einsum("eai,a->ei", vv, self.N_center[:, 0])
        rate = jnp.sum(jnp.abs(uc) / self.e_size, axis=1)
        return 1e-32 + jnp.minimum(cfg.finetunedt * 0.5 / jnp.max(rate),
                                   self.diff_dt)

    def _advect_T(self, T0, Tdot0, V, dt0):
        """PG predictor-corrector through the shared max-T guard
        (advection.advect_monitored: dt-halving retries when the
        interior maximum grows past T_maxvaried=1.05, PG_timestep_solve
        do/while). Returns (T, Tdot, dt_used)."""
        from g4s_tpu.models.citcoms.advection import advect_monitored
        cfg = self.cfg

        def advect(dt):
            T = T0 + (1.0 - cfg.adv_gamma) * dt * Tdot0
            Tdot = jnp.zeros_like(Tdot0)
            for _ in range(cfg.adv_sub_iterations):
                DT = self._pg_residual(T, Tdot, V)
                T = T + cfg.adv_gamma * dt * DT
                Tdot = Tdot + DT
                T = jnp.where(self.tbc_mask, self.tbc_val, T)
            return T, Tdot

        return advect_monitored(advect, T0, dt0, self.tbc_mask,
                                cfg.monitor_max_T)

    def _timestep(self, s: State):
        T, Tdot, dt = self._advect_T(s.T, s.Tdot, s.V, self._cfl_dt(s.V))
        V, P, mon = self._stokes(T, s.V, s.P)
        diag = StepDiagnostics(dt, mon.v_norm, mon.p_norm,
                               mon.incompressibility, mon.outer_iterations,
                               mon.inner_iterations)
        return State(T, Tdot, V, P, s.time + dt, dt, s.step + 1), diag

    def initial_solve(self, s: State):
        V, P, mon = self._stokes_fn(s.T, s.V, s.P)
        return dataclasses.replace(s, V=V, P=P), mon

    def stokes(self, T, V, P):
        """One jitted full-sphere Stokes pass (same entry name as the
        regional CitcomModel.stokes)."""
        return self._stokes_fn(T, V, P)

    def step(self, s: State):
        return self._step_fn(s)

    # -------- tracers (Full_tracer_advection.c capability) --------

    def step_tracers(self, s: State, pos, flavors):
        """Thermochemical full-sphere timestep: advect Cartesian tracers
        with the step's dt and form the ratio-method composition
        (Full_tracer_advection.c + Composition_related.c capability).

        Returns (state, diag, new_pos, C_nodes); C_nodes is the dense
        flavor's nodal fraction for compositional buoyancy. pos: (n, 3)
        Cartesian."""
        from g4s_tpu.models.citcoms import full_tracers as ft
        if not hasattr(self, "_tracer_field"):
            self._tracer_field = ft.FullTracerField.build(self.mesh)
            self._tracer_step = jax.jit(self._timestep_tracers)
        return self._tracer_step(s, pos, flavors)

    def _timestep_tracers(self, s: State, pos, flavors):
        from g4s_tpu.models.citcoms import full_tracers as ft
        tf = self._tracer_field
        # CFL dt (same rule as _timestep, incl. the max-T guard); the
        # tracers advect with the step's final (possibly halved) dt
        T, Tdot, dt = self._advect_T(s.T, s.Tdot, s.V, self._cfl_dt(s.V))
        pos = ft.advect_tracers(tf, s.V, pos, dt)
        comp_el, _ = ft.element_composition(tf, self.mesh, pos, flavors, 2)
        # composition -> nodes (volume-agnostic average, like the
        # regional composition_to_nodes)
        contrib = jnp.broadcast_to(comp_el[1][:, None],
                                   (self.mesh.nel, 8))
        num = self.plan.scatter(contrib[:, :, None])[:, 0]
        den = self.plan.scatter(jnp.ones_like(contrib)[:, :, None])[:, 0]
        C_nodes = num / jnp.maximum(den, 1.0)
        V, P, mon = self._stokes(T, s.V, s.P, C=C_nodes)
        diag = StepDiagnostics(dt, mon.v_norm, mon.p_norm,
                               mon.incompressibility, mon.outer_iterations,
                               mon.inner_iterations)
        new_s = State(T, Tdot, V, P, s.time + dt, dt, s.step + 1)
        return new_s, diag, pos, C_nodes


def shard_full_sphere(model: FullSphereModel, mesh, axis: str = "e"):
    """Multi-chip execution of the full-sphere solve by ELEMENT sharding.

    Unlike the regional brick decomposition (explicit shard_map + halo),
    the 12-cap mesh's irregular seams are handled by letting pjit propagate
    shardings: per-element tensors (B, gda, cc, G, ...) are placed with
    their leading axis split over the device mesh, nodal fields stay
    replicated, and XLA inserts the all-reduces for every element->node
    scatter — the compiler-scheduled analog of the reference's
    full_exchange_id_d. Pads nel to a multiple of the axis size (zero
    elements contribute nothing).

    Returns a jitted `stokes(T, V, P)` running sharded.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    nel = model.mesh.nel
    pad = (-nel) % n_dev

    def pad_e(x):
        if pad == 0:
            return x
        pad_width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    shard_e = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(pad_e(x), shard_e)
    B = put(model.B)
    gda = put(model.gda)
    cc = put(model.cc)
    G = put(model.G)
    ien = put(model.ien)
    mat = put(model.mat)
    plan = asm.ScatterPlan.build(
        np.concatenate([np.asarray(model.mesh.ien),
                        np.zeros((pad, 8), np.int32)]), model.mesh.nno)

    from g4s_tpu.models.citcoms.viscosity import viscosity_at_vpts

    def stokes(T, V, P_):
        evisc = viscosity_at_vpts(model.cfg, mat, T, ien, model.N)
        elt_k = asm.build_elt_k(B, gda, model.gweight, evisc)
        BI = asm.build_diag_K(elt_k, plan)
        BPI = asm.build_bpi(G, BI, ien, model.vbc_mask)
        ops = asm.StokesOperators(ien, elt_k, G, model.vbc_mask,
                                  model.vbc_val, BI, BPI, plan)
        buoy = model.buoyancy(T)
        F = asm.assemble_forces(ops, model.N, gda, model.gweight, cc, buoy)
        fdotf = jnp.sqrt(jnp.vdot(F, F))
        V2 = asm.apply_vbc(V, model.vbc_mask, model.vbc_val)
        # e_area padded for the pressure norms
        e_area_p = pad_e(model.e_area) + jnp.where(
            jnp.arange(nel + pad) < nel, 0.0, 1.0)
        prob = sol.local_problem(ops, model.nmass, e_area_p,
                                 model.total_volume)
        V3, P3, mon = sol.uzawa_cg(prob, V2, jnp.pad(P_, (0, pad)), F,
                                   fdotf, model.uzawa_params)
        return model.remove_net_rotation(V3), P3[:nel], mon

    return jax.jit(stokes, in_shardings=(rep, rep, rep),
                   out_shardings=(rep, rep, rep))


def shard_full_step(model: FullSphereModel, mesh, axis: str = "e"):
    """Multi-chip FULL TIMESTEP (SUPG advection + Stokes) by element
    sharding. Unlike shard_full_sphere (which re-plumbs one solve), this
    re-homes the model's per-element tensors onto the device mesh and
    jits the existing _timestep — pjit propagation inserts the seam
    collectives everywhere an element->node scatter or node->element
    gather crosses shards. Requires nel % n_devices == 0 (pick nodex so
    12 (nodex-1)^2 (nodez-1) divides the device count).

    Returns a jitted step(state) -> (state, diagnostics), both
    replicated.
    """
    import copy

    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    if model.mesh.nel % n_dev:
        raise ValueError(f"nel {model.mesh.nel} not divisible by "
                         f"{n_dev} devices")
    shard_e = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    m2 = copy.copy(model)
    for name in ("ien", "gda", "cc", "B", "G", "gradN", "e_area", "mat",
                 "e_size"):
        setattr(m2, name, jax.device_put(getattr(model, name), shard_e))
    for name in ("N", "gweight", "vbc_mask", "vbc_val", "tbc_mask",
                 "tbc_val", "tmass", "nmass", "N_center"):
        setattr(m2, name, jax.device_put(getattr(model, name), rep))
    return jax.jit(m2._timestep, in_shardings=(rep,),
                   out_shardings=(rep, rep))
