"""SUPG (streamline-upwind Petrov-Galerkin) energy equation.

Predictor-corrector advection-diffusion of temperature, following
citcoms/lib/Advection_diffusion.c:
  - std_timestep (:140-194): advective CFL from element-center velocities
    and physical element sizes, combined with the diffusive limit
    0.5*min(size^2) (:316-336), scaled by finetunedt.
  - predictor/corrector (:345-388): T* = T + (1-gamma) dt Tdot; Tdot = 0;
    then per sub-iteration DTdot = M^-1 R, T += gamma dt DTdot,
    Tdot += DTdot.
  - pg_shape_fn (:459-518): streamline diffusion factor from element Peclet
    numbers; PG_a = N_a + adiff * (u . grad N_a).
  - element_residual (:525-685): R_a = -sum_g PG_a dOmega (Tdot + u.grad T
    - Q) - diff * grad N_a . grad T, with Tdot treated as 0 at TBC nodes.
  - lumped-mass scaling + zero at TBC nodes (pg_solver :435-450).

All gradients are physical spherical gradients ((1/r) d/dth,
1/(r sin th) d/dfi, d/dr); velocities are spherical components interpolated
as scalars at gauss points (velo_from_element with sphere_key=1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.citcoms.assembly import ScatterPlan


class AdvectionGeometry(NamedTuple):
    """Static per-element tensors for the energy solver (host-built)."""
    N: jax.Array         # (8a, 8g)
    N_center: jax.Array  # (8a, 1) shape fns at element center (ppt)
    gweight: jax.Array   # (8g,)
    gda: jax.Array       # (nel, 8g)
    gradN: jax.Array     # (nel, 8g, 3, 8a) physical gradient of N
    e_size: jax.Array    # (nel, 3) physical element lengths
    tmass: jax.Array     # (nno,) inverse lumped mass
    diff_dt: jax.Array   # scalar: diffusive timestep limit


def build_advection_geometry(geo, mesh, tmass) -> AdvectionGeometry:
    """Assemble static advection tensors from shapes.FEMGeometry."""
    from g4s_tpu.models.citcoms.shapes import (
        shape_n, shape_dn, _GAUSS, _PPOINT)
    # physical gradient of N at gauss pts: rows ((1/r) d/dth, 1/(r s) d/dfi, d/dr)
    coords = mesh.sx[mesh.ien]
    dth = coords[:, 1, 0] - coords[:, 0, 0]
    dfi = coords[:, 3, 1] - coords[:, 0, 1]
    dr = coords[:, 4, 2] - coords[:, 0, 2]
    half = 0.5 * np.stack([dth, dfi, dr], axis=1)
    dN = shape_dn(_GAUSS)                                  # (8a, 8g, 3)
    gnx = dN[None] / half[:, None, None, :]                # (nel, 8a, 8g, 3)
    rtf = geo.rtf
    ra = 1.0 / rtf[:, :, 2]
    isi = 1.0 / np.sin(rtf[:, :, 0])
    grad = np.stack([
        gnx[:, :, :, 0].transpose(0, 2, 1) * ra[:, :, None],
        gnx[:, :, :, 1].transpose(0, 2, 1) * (ra * isi)[:, :, None],
        gnx[:, :, :, 2].transpose(0, 2, 1),
    ], axis=2)                                             # (nel, 8g, 3, 8a)
    diff_dt = 0.5 * float((mesh.e_size ** 2).min())
    # adopt the model dtype from tmass so the f32 production path stays f32
    dt = jnp.asarray(tmass).dtype
    return AdvectionGeometry(
        jnp.asarray(geo.N, dt), jnp.asarray(shape_n(_PPOINT), dt),
        jnp.asarray(geo.gweight, dt), jnp.asarray(geo.gda, dt),
        jnp.asarray(grad, dt), jnp.asarray(mesh.e_size, dt), tmass,
        jnp.asarray(diff_dt, dt))


def element_velocities(adv: AdvectionGeometry, ien, V):
    """V at element nodes (nel, 8a, 3) spherical components."""
    return jnp.take(V, ien, axis=0)


def cfl_timestep(adv: AdvectionGeometry, ien, V, *, finetunedt: float,
                 fixed_timestep: float = 0.0):
    """std_timestep: dt = min(finetunedt * 0.5/max_e(sum |u_c|/size),
    diff_dt)."""
    if fixed_timestep != 0.0:
        return jnp.asarray(fixed_timestep)
    vv = element_velocities(adv, ien, V)                   # (nel, 8, 3)
    uc = jnp.einsum("eai,a->ei", vv, adv.N_center[:, 0])   # center velocity
    rate = jnp.sum(jnp.abs(uc) / adv.e_size, axis=1)       # (nel,)
    step = 0.5 / jnp.max(rate)
    return 1.0e-32 + jnp.minimum(finetunedt * step, adv.diff_dt)


def pg_residual(adv: AdvectionGeometry, ien, plan: ScatterPlan,
                T, Tdot, V, diff, Q0, tbc_mask):
    """One SUPG residual evaluation -> DTdot (pg_solver)."""
    vv = element_velocities(adv, ien, V)                   # (nel, 8a, 3)
    uc = jnp.einsum("eai,a->ei", vv, adv.N_center[:, 0])   # (nel, 3)

    twodiff = 2.0 * diff
    u_l = jnp.abs(uc) * adv.e_size                         # (nel, 3)
    xse = jnp.where(u_l > twodiff, 1.0 - twodiff / u_l, 0.0)
    unorm = jnp.sum(uc * uc, axis=1)
    adiff = jnp.where(unorm > 1e-6,
                      jnp.sum(u_l * xse, axis=1) / (2.0 * unorm), 0.0)

    u_g = jnp.einsum("eai,ag->egi", vv, adv.N)             # (nel, 8g, 3)
    # u . grad N  (nel, 8g, 8a)
    ugn = jnp.einsum("egi,egia->ega", u_g, adv.gradN)
    PG = adv.N.T[None] + adiff[:, None, None] * ugn        # (nel, 8g, 8a)

    T_el = jnp.take(T, ien, axis=0)                        # (nel, 8a)
    Tdot_masked = jnp.where(tbc_mask, 0.0, Tdot)
    Td_el = jnp.take(Tdot_masked, ien, axis=0)
    dT_g = jnp.einsum("ea,ag->eg", Td_el, adv.N)
    gT = jnp.einsum("ea,egia->egi", T_el, adv.gradN)       # grad T at gauss
    adv_term = jnp.einsum("egi,egi->eg", u_g, gT)

    wg = adv.gda * adv.gweight[None, :]
    res_adv = -jnp.einsum("ega,eg,eg->ea", PG, wg, dT_g + adv_term - Q0)
    res_diff = -diff * jnp.einsum("egia,egi,eg->ea", adv.gradN, gT, wg)
    Eres = res_adv + res_diff                              # (nel, 8a)

    DTdot = plan.scatter(Eres[:, :, None])[:, 0]
    return jnp.where(tbc_mask, 0.0, DTdot * adv.tmass)


def pg_timestep(adv: AdvectionGeometry, ien, plan: ScatterPlan,
                T, Tdot, V, dt, *, diff, Q0, gamma, sub_iterations,
                tbc_mask, tbc_val):
    """One full predictor-corrector temperature step (PG_timestep_solve
    without the max-T subcycling guard; the driver wraps that)."""
    T = T + (1.0 - gamma) * dt * Tdot
    Tdot = jnp.zeros_like(Tdot)
    for _ in range(sub_iterations):
        DTdot = pg_residual(adv, ien, plan, T, Tdot, V, diff, Q0, tbc_mask)
        T = T + gamma * dt * DTdot
        Tdot = Tdot + DTdot
        T = jnp.where(tbc_mask, tbc_val, T)    # temperatures_conform_bcs
    return T, Tdot


def advect_monitored(advect, T0, dt0, tbc_mask, monitor: bool):
    """Max-T guard shared by the regional and full-sphere f64/f32
    drivers: redo `advect(dt) -> (T, Tdot)` with halved dt while the
    interior maximum grows past T_maxvaried=1.05 (PG_timestep_solve
    do/while, Advection_diffusion.c:234-280; at most 5 retries).
    Returns (T, Tdot, dt_used). The df64 twin is
    df64_step.advect_monitored_df."""
    if not monitor:
        T, Tdot = advect(dt0)
        return T, Tdot, dt0
    T_int0 = jnp.max(jnp.where(tbc_mask, -jnp.inf, T0))
    T1, Td1 = advect(dt0)

    def cond(carry):
        T, Td, dt, tries = carry
        blown = jnp.max(jnp.where(tbc_mask, -jnp.inf, T)) \
            / jnp.maximum(T_int0, 1e-30) > 1.05
        return jnp.logical_and(blown, tries < 5)

    def body(carry):
        T, Td, dt, tries = carry
        dt2 = dt * 0.5
        T2, Td2 = advect(dt2)
        return T2, Td2, dt2, tries + 1

    T, Tdot, dt, _ = jax.lax.while_loop(
        cond, body, (T1, Td1, dt0, jnp.asarray(0, jnp.int32)))
    return T, Tdot, dt
