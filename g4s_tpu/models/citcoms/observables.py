"""Surface observables and diagnostics.

Reference capability: citcoms/lib/Topo_gravity.c (surface/bottom topography
from radial stress), heat-flux diagnostics (output_surf_botm surf heat
flux), and the Lenardic-Kaula temperature filter
(Advection_diffusion.c:687 filter()).
"""

from __future__ import annotations

import jax.numpy as jnp


def surface_heat_flux(model, T, *, top: bool = True):
    """Conductive heat flux through the top (or bottom) surface and the
    Nusselt number (heat-flow diagnostics of output_surf_botm).

    q = -dT/dr evaluated from the outermost node layer pair; Nu is q
    normalized by the conductive flux of the reference profile.
    """
    cfg = model.cfg
    grid = T.reshape(cfg.nodey, cfg.nodex, cfg.nodez)
    r = model.mesh.r
    if top:
        dr = r[-1] - r[-2]
        q = -(grid[:, :, -1] - grid[:, :, -2]) / dr
    else:
        dr = r[1] - r[0]
        q = -(grid[:, :, 1] - grid[:, :, 0]) / dr
    ri, ro = cfg.radius_inner, cfg.radius_outer
    # conductive reference: linear profile dT/dr = -(Tbot)/(ro-ri)
    q_cond = (cfg.bottbcval - cfg.toptbcval) / (ro - ri)
    return q, jnp.mean(q) / q_cond


def dynamic_topography(model, state, ops):
    """Surface dynamic topography h = sigma_rr / (rho g) in nondimensional
    units (Topo_gravity.c get_STD_topo role, simplified): the radial normal
    stress at the top surface from the velocity/pressure solution.

    sigma_rr = -p + 2 eta du_r/dr, evaluated on the top element layer and
    averaged to surface nodes.
    """
    cfg = model.cfg
    m = model.mesh
    V = state.V
    # du_r/dr at top via one-sided difference of nodal u_r
    grid_v = V[:, 2].reshape(cfg.nodey, cfg.nodex, cfg.nodez)
    dr = m.r[-1] - m.r[-2]
    durdr = (grid_v[:, :, -1] - grid_v[:, :, -2]) / dr
    # element-constant pressure of the top layer -> surface cells
    P = state.P.reshape(cfg.nodey - 1, cfg.nodex - 1, cfg.nodez - 1)[:, :, -1]
    # average p to nodes (simple 4-cell mean, edges clamped)
    p_node = jnp.zeros((cfg.nodey, cfg.nodex), V.dtype)
    cnt = jnp.zeros((cfg.nodey, cfg.nodex), V.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            p_node = p_node.at[dy: cfg.nodey - 1 + dy,
                               dx: cfg.nodex - 1 + dx].add(P)
            cnt = cnt.at[dy: cfg.nodey - 1 + dy,
                         dx: cfg.nodex - 1 + dx].add(1.0)
    p_node = p_node / jnp.maximum(cnt, 1.0)
    sigma_rr = -p_node + 2.0 * durdr   # eta = 1 nondimensional at surface
    return sigma_rr / jnp.maximum(cfg.rayleigh, 1.0)


def rms_velocity(model, V):
    """Volume-RMS velocity (the v_norm monitor, global_v_norm2)."""
    return jnp.sqrt(jnp.sum(V * V * model.nmass[:, None])
                    / model.total_volume)


def filter_temperature(T, tbc_mask, tbc_val):
    """Lenardic & Kaula overshoot filter (Advection_diffusion.c:687):
    clip T to [0,1] while conserving the total heat content."""
    free = ~tbc_mask
    total0 = jnp.sum(jnp.where(free, T, 0.0))
    Tc = jnp.clip(T, 0.0, 1.0)
    # redistribute the clipped energy over interior unclipped free nodes
    interior = free & (Tc > 0.0) & (Tc < 1.0)
    n_free = jnp.maximum(jnp.sum(interior), 1)
    correction = (total0 - jnp.sum(jnp.where(free, Tc, 0.0))) / n_free
    Tf = jnp.where(interior, Tc + correction, Tc)
    return jnp.where(tbc_mask, tbc_val, Tf)


def max_interior_temperature(T, tbc_mask):
    """Tmaxd over non-BC nodes (monitor.T_interior)."""
    return jnp.max(jnp.where(tbc_mask, -jnp.inf, T))
