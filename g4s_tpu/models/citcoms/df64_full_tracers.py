"""Full-sphere tracer advection + composition in df64.

Extends the full-sphere 1e-10 tier (df64_full.py) to the thermochemical
envelope the same way df64_tracers.py extends the regional tier: the
CPU-f64 oracle is full_tracers.py (the Full_tracer_advection.c +
Composition_related.c capability, gnomonic closed-form location), and
this module reproduces it in double-word f32 so the whole
tracer-advection + chemical-buoyancy timestep runs in one device
dispatch.

Design notes (mirroring df64_tracers.py):
- All integer DECISIONS (cap membership, cell sign counts, radial
  level) are taken on the hi+lo sum: the f32 sum of a df pair keeps the
  true sign (|lo| <= ulp(hi)/2), so the decisions agree with true f64
  except for tracers within ~2^-49 of a face — the knife edge any two
  arithmetics disagree on. The uv/xi/weights that feed positions stay
  full df64.
- The static tables (gnomonic frames, grid-line equations, node uv,
  spherical bases) are recomputed on host in numpy f64 and split once —
  FullTracerField.build's jnp copies would downcast to f32 when x64 is
  off.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops import df64 as df
from g4s_tpu.models.citcoms.df64_step import _take, _tree_sum, _where, split64
from g4s_tpu.models.citcoms.df64_tracers import _floor_df, _sign_df
from g4s_tpu.models.citcoms.full_mesh import (FullSphereMesh, _sph_to_xyz,
                                              cap_surface_nodes)
from g4s_tpu.models.citcoms.full_tracers import _cap_frames, _grid_lines


class FullTracerDF(NamedTuple):
    """df64 static tables for the 12-cap shell (FullTracerField role)."""
    frames_p: df.DF          # (12, 3, 3) rows (n_hat, e_u, e_v)
    lines_x_p: df.DF         # (12, nox, 3)
    lines_y_p: df.DF         # (12, noy, 3)
    uv_nodes_p: df.DF        # (12, noy, nox, 2)
    surf_inverse: jax.Array  # (12*noy*nox,) int32 flat surface-node map
    basis_p: df.DF           # (nno, 3, 3) cols e_theta, e_fi, e_r
    r0_p: df.DF              # df scalars
    inv_dr_p: df.DF
    r1_p: df.DF
    nox: int
    noy: int
    noz: int

    @staticmethod
    def build(mesh: FullSphereMesh) -> "FullTracerDF":
        nox, noy, noz = mesh.nodex, mesh.nodey, len(mesh.r)
        frames = _cap_frames()
        lxs, lys, uvs = [], [], []
        for c in range(12):
            s = cap_surface_nodes(c, nox, noy)
            n, e_u, e_v = frames[c]
            p = _sph_to_xyz(s[..., 0], s[..., 1])
            uv = np.stack([p @ e_u, p @ e_v], axis=-1) / (p @ n)[..., None]
            lx, ly = _grid_lines(uv)
            lxs.append(lx)
            lys.append(ly)
            uvs.append(uv)
        th, ff = mesh.sx[:, 0], mesh.sx[:, 1]
        st, ct = np.sin(th), np.cos(th)
        sf, cf = np.sin(ff), np.cos(ff)
        e_t = np.stack([ct * cf, ct * sf, -st], 1)
        e_f = np.stack([-sf, cf, np.zeros_like(sf)], 1)
        e_r = np.stack([st * cf, st * sf, ct], 1)
        basis = np.stack([e_t, e_f, e_r], axis=2)
        r = np.asarray(mesh.r, np.float64)
        if r.size > 2 and not np.allclose(np.diff(r), r[1] - r[0],
                                          rtol=1e-6, atol=0.0):
            raise NotImplementedError(
                "FullTracerDF requires a uniform radial grid")
        s64 = lambda v: df.from_f64(np.float64(v))
        return FullTracerDF(
            split64(frames), split64(np.stack(lxs)), split64(np.stack(lys)),
            split64(np.stack(uvs)),
            jnp.asarray(np.asarray(mesh.surf_inverse).reshape(-1)
                        .astype(np.int32)),
            split64(basis),
            s64(r[0]), s64(1.0 / (r[1] - r[0])), s64(r[-1]),
            nox, noy, noz)


def _comp(p, i):
    return p[0][..., i], p[1][..., i]


def _hl(p):
    """Combined hi+lo value for sign/order decisions."""
    return p[0] + p[1]


def locate_full_df(tf: FullTracerDF, pos_p):
    """pos (n, 3) df Cartesian -> (cap, iy, ix, kz int32, uv df, wz df).
    full_tracers.locate in df64 (decisions on hi+lo)."""
    n = pos_p[0].shape[0]
    # pn/pu/pv: (n, 12) df dots of pos with the three frame rows
    pe = (pos_p[0][:, None, None, :], pos_p[1][:, None, None, :])
    fr = (tf.frames_p[0][None], tf.frames_p[1][None])        # (1,12,3,3)
    dots = _tree_sum(df.mul(pe, fr), axis=3)                 # (n,12,3rows)
    pn = _comp(dots, 0)
    pu = _comp(dots, 1)
    pv = _comp(dots, 2)
    tiny = np.float32(1e-9)
    safe = _where(pn[0] > tiny, pn,
                  (jnp.full_like(pn[0], tiny), jnp.zeros_like(pn[1])))
    u = df.div(pu, safe)                                     # (n, 12)
    v = df.div(pv, safe)

    def signs(lines_p):
        a = (lines_p[0][None, :, :, 0], lines_p[1][None, :, :, 0])
        b = (lines_p[0][None, :, :, 1], lines_p[1][None, :, :, 1])
        c = (lines_p[0][None, :, :, 2], lines_p[1][None, :, :, 2])
        ue = (u[0][:, :, None], u[1][:, :, None])
        ve = (v[0][:, :, None], v[1][:, :, None])
        return df.add(df.add(df.mul(ue, a), df.mul(ve, b)),
                      (jnp.broadcast_to(c[0], (n,) + c[0].shape[1:]),
                       jnp.broadcast_to(c[1], (n,) + c[1].shape[1:])))

    sx = signs(tf.lines_x_p)                                 # (n,12,nox)
    sy = signs(tf.lines_y_p)                                 # (n,12,noy)
    sxv, syv = _hl(sx), _hl(sy)
    margin = jnp.minimum(
        jnp.minimum(jnp.minimum(sxv[:, :, 0], -sxv[:, :, -1]),
                    jnp.minimum(syv[:, :, 0], -syv[:, :, -1])),
        _hl(pn) * 10.0)
    cap = jnp.argmax(margin, axis=1).astype(jnp.int32)       # (n,)

    tak = lambda arr: jnp.take_along_axis(arr, cap[:, None, None],
                                          axis=1)[:, 0]
    ix = jnp.clip(jnp.sum(tak(sxv) > 0, axis=1) - 1, 0,
                  tf.nox - 2).astype(jnp.int32)
    iy = jnp.clip(jnp.sum(tak(syv) > 0, axis=1) - 1, 0,
                  tf.noy - 2).astype(jnp.int32)
    tak1 = lambda p: (jnp.take_along_axis(p[0], cap[:, None], 1)[:, 0],
                      jnp.take_along_axis(p[1], cap[:, None], 1)[:, 0])
    uv = tak1(u), tak1(v)                                    # pair of df

    r = df.sqrt(_tree_sum(df.mul(pos_p, pos_p), axis=1))     # (n,)
    bc = lambda s: (jnp.broadcast_to(s[0], r[0].shape),
                    jnp.broadcast_to(s[1], r[0].shape))
    tz = df.mul(df.sub(r, bc(tf.r0_p)), bc(tf.inv_dr_p))
    kz = jnp.clip(_floor_df(tz), 0, tf.noz - 2)
    wz = df.add_f(tz, -kz.astype(jnp.float32))
    one = np.float32(1.0)
    wz = _where(_sign_df(wz) < 0.0,
                (jnp.zeros_like(wz[0]), jnp.zeros_like(wz[1])), wz)
    wz = _where(_sign_df(df.add_f(wz, -one)) > 0.0,
                (jnp.ones_like(wz[0]), jnp.zeros_like(wz[1])), wz)
    return cap, iy, ix, kz, uv, wz


def _bilinear_inverse_df(corners_p, pu, pv, iters: int = 3):
    """df64 Newton inversion of the bilinear cell map (xi, eta in
    [-1,1]). corners_p: (n, 4, 2) df in order s00, s10, s11, s01."""
    c = lambda k: (corners_p[0][:, k], corners_p[1][:, k])   # (n, 2) df
    c00, c10, c11, c01 = c(0), c(1), c(2), c(3)
    q = np.float32(0.25)
    a0 = df.mul_f(df.add(df.add(c00, c10), df.add(c11, c01)), q)
    ax = df.mul_f(df.add(df.sub(c10, c00), df.sub(c11, c01)), q)
    ay = df.mul_f(df.add(df.sub(c01, c00), df.sub(c11, c10)), q)
    axy = df.mul_f(df.add(df.sub(c00, c10), df.sub(c11, c01)), q)
    p = (jnp.stack([pu[0], pv[0]], 1), jnp.stack([pu[1], pv[1]], 1))
    n = p[0].shape[0]
    xi = (jnp.zeros(n, p[0].dtype), jnp.zeros(n, p[0].dtype))
    eta = (jnp.zeros(n, p[0].dtype), jnp.zeros(n, p[0].dtype))
    e2 = lambda s: (s[0][:, None], s[1][:, None])            # (n,1)
    for _ in range(iters):
        F = df.sub(df.add(df.add(a0, df.mul(e2(xi), ax)),
                          df.add(df.mul(e2(eta), ay),
                                 df.mul(e2(df.mul(xi, eta)), axy))), p)
        Jx = df.add(ax, df.mul(e2(eta), axy))
        Jy = df.add(ay, df.mul(e2(xi), axy))
        det = df.sub(df.mul(_comp(Jx, 0), _comp(Jy, 1)),
                     df.mul(_comp(Jx, 1), _comp(Jy, 0)))
        det = _where(jnp.abs(_hl(det)) > 1e-30, det,
                     (jnp.full_like(det[0], 1e-30),
                      jnp.zeros_like(det[1])))
        dxi = df.div(df.sub(df.mul(_comp(F, 0), _comp(Jy, 1)),
                            df.mul(_comp(F, 1), _comp(Jy, 0))), det)
        deta = df.div(df.sub(df.mul(_comp(Jx, 0), _comp(F, 1)),
                             df.mul(_comp(Jx, 1), _comp(F, 0))), det)
        xi = df.sub(xi, dxi)
        eta = df.sub(eta, deta)

    def clip1(s):
        one = np.float32(1.0)
        s = _where(_sign_df(df.add_f(s, one)) < 0.0,
                   (jnp.full_like(s[0], -1.0), jnp.zeros_like(s[1])), s)
        return _where(_sign_df(df.add_f(s, -one)) > 0.0,
                      (jnp.ones_like(s[0]), jnp.zeros_like(s[1])), s)
    return clip1(xi), clip1(eta)


def interp_weights_full_df(tf: FullTracerDF, pos_p):
    """(node ids (n, 8), df weights list of 8) — the trilinear stencil
    at df Cartesian positions (full_tracers.interp_weights)."""
    cap, iy, ix, kz, uv, wz = locate_full_df(tf, pos_p)
    flat_uv = (tf.uv_nodes_p[0].reshape(-1, 2),
               tf.uv_nodes_p[1].reshape(-1, 2))
    base = (cap * tf.noy + iy) * tf.nox + ix
    ids4 = jnp.stack([base, base + 1, base + tf.nox + 1, base + tf.nox], 1)
    corners = _take(flat_uv, ids4)                            # (n, 4, 2)
    xi, eta = _bilinear_inverse_df(corners, uv[0], uv[1])
    half = np.float32(0.5)
    one = np.float32(1.0)
    wx = (df.mul_f(df.add_f(df.neg(xi), one), half),
          df.mul_f(df.add_f(xi, one), half))
    wy = (df.mul_f(df.add_f(df.neg(eta), one), half),
          df.mul_f(df.add_f(eta, one), half))
    wr = (df.add_f(df.neg(wz), one), wz)
    ids, wts = [], []
    for dy in range(2):
        for dx in range(2):
            sid = jnp.take(tf.surf_inverse,
                           (cap * tf.noy + iy + dy) * tf.nox + ix + dx)
            for dz in range(2):
                ids.append(sid * tf.noz + kz + dz)
                wts.append(df.mul(df.mul(wy[dy], wx[dx]), wr[dz]))
    return jnp.stack(ids, 1), wts


def interp_velocity_full_df(tf: FullTracerDF, V_p, pos_p):
    """df Cartesian velocity at tracer positions: nodal spherical
    components rotated by the static per-node basis, trilinear interp."""
    ids, wts = interp_weights_full_df(tf, pos_p)
    out = None
    for k in range(8):
        nk = ids[:, k]
        bas = _take(tf.basis_p, nk)                           # (n, 3, 3)
        vk = _take(V_p, nk)                                   # (n, 3)
        vc = _tree_sum(df.mul(bas, (vk[0][:, None, :], vk[1][:, None, :])),
                       axis=2)                                # (n, 3)
        w = wts[k]
        term = df.mul((w[0][:, None], w[1][:, None]), vc)
        out = term if out is None else df.add(out, term)
    return out


def clip_radius_df(tf: FullTracerDF, pos_p):
    r = df.sqrt(_tree_sum(df.mul(pos_p, pos_p), axis=1))      # (n,)
    eps = np.float32(1e-9)
    lo = df.add_f(tf.r0_p, eps)
    hi = df.add_f(tf.r1_p, -eps)
    bc = lambda s: (jnp.broadcast_to(s[0], r[0].shape),
                    jnp.broadcast_to(s[1], r[0].shape))
    rc = _where(_sign_df(df.sub(r, bc(lo))) < 0.0, bc(lo), r)
    rc = _where(_sign_df(df.sub(rc, bc(hi))) > 0.0, bc(hi), rc)
    scale = df.div(rc, r)
    return df.mul(pos_p, (scale[0][:, None], scale[1][:, None]))


def advect_tracers_full_df(tf: FullTracerDF, V_p, pos_p, dt_p):
    """Predictor-corrector midpoint step in df Cartesian coordinates
    (full_tracers.advect_tracers)."""
    v1 = interp_velocity_full_df(tf, V_p, pos_p)
    half_dt = df.mul_f(dt_p, np.float32(0.5))
    b = lambda s: (jnp.broadcast_to(s[0], v1[0].shape),
                   jnp.broadcast_to(s[1], v1[0].shape))
    mid = clip_radius_df(tf, df.add(pos_p, df.mul(b(half_dt), v1)))
    v2 = interp_velocity_full_df(tf, V_p, mid)
    return clip_radius_df(tf, df.add(pos_p, df.mul(b(dt_p), v2)))


def element_composition_full_df(tf: FullTracerDF, pos_p, flavors,
                                n_flavors: int = 2):
    """Ratio-method composition per element; element index follows the
    mesh build order (((cap*(noy-1)+iy)*(nox-1)+ix)*(noz-1)+kz). Counts
    are exact; the ratio runs in df."""
    cap, iy, ix, kz, _, _ = locate_full_df(tf, pos_p)
    el = ((cap * (tf.noy - 1) + iy) * (tf.nox - 1) + ix) * (tf.noz - 1) + kz
    nel = 12 * (tf.noy - 1) * (tf.nox - 1) * (tf.noz - 1)
    total = jax.ops.segment_sum(jnp.ones_like(el, jnp.float32), el, nel)
    tot_p = (jnp.maximum(total, 1.0), jnp.zeros_like(total))
    comps = []
    for f in range(n_flavors):
        cnt = jax.ops.segment_sum((flavors == f).astype(jnp.float32),
                                  el, nel)
        comps.append(df.div((cnt, jnp.zeros_like(cnt)), tot_p))
    return comps, total
