"""Full-sphere tracer advection + composition (Full_tracer_advection.c).

The reference's full-sphere tracer subsystem (citcoms/lib/
Full_tracer_advection.c, 3.5 kLoC) does, per tracer per step: find the cap
containing the point (icheck_cap / icheck_all_caps), locate the element
inside the cap through a regular-grid overlay of the gnomonic plane
(make_regular_grid / iget_element), interpolate velocity with cap shape
functions (full_get_velocity), advance with a predictor-corrector step, and
exchange tracers that crossed cap/processor boundaries (lost_souls).

TPU-first redesign — everything is closed-form vectorized math over the
whole tracer array, no per-tracer search loops and no exchange step:

  * tracers live in Cartesian xyz (pole-safe, the reference also advects
    in Cartesian, Full_tracer_advection.c cart_to_sphere paths);
  * cap membership: the gnomonic projection of each cap is evaluated for
    all 12 caps at once as three dot products (u = p.e_u / p.n etc. — no
    trig), and the cap with the largest interior margin wins — this
    replaces icheck_cap's sequential polygon walk;
  * element location: each cap's surface grid lines are STRAIGHT lines in
    its own gnomonic plane (that is how the mesh is constructed,
    full_coord_of_cap), so the (ix, iy) cell indices are sign counts of
    oriented line equations — one small matmul per family instead of the
    reference's regular-grid overlay;
  * local coordinates: 2-3 Newton steps invert the bilinear cell map in
    the gnomonic plane; radial level is closed-form on the uniform r grid;
  * velocity: nodal spherical components are rotated to Cartesian with
    precomputed per-node bases and interpolated bilinearly x linear-in-r;
  * "lost souls": crossing a seam just changes the computed cap index —
    tracers are data-parallel, so the multi-chip version shards the
    tracer axis and needs NO communication (the velocity field is
    replicated, nno << n_tracers).

Composition follows the regional ratio method (Composition_related.c).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.citcoms.full_mesh import (FullSphereMesh, _sph_to_xyz,
                                              cap_corners, cap_surface_nodes,
                                              _xyz_to_sph, _to_uv)


def _cap_frames() -> np.ndarray:
    """(12, 3, 3) rows = (n_hat, e_u, e_v) of each cap's gnomonic frame,
    matching _to_uv's convention: u = p.e_u / p.n, v = p.e_v / p.n."""
    frames = np.zeros((12, 3, 3))
    corners = cap_corners()
    for c in range(12):
        P = _sph_to_xyz(corners[c, :, 0], corners[c, :, 1])
        n = P.mean(axis=0)
        n /= np.linalg.norm(n)
        tf, ff = _xyz_to_sph(n)
        e_u = np.array([-np.sin(ff), np.cos(ff), 0.0])
        e_v = np.array([-np.cos(tf) * np.cos(ff),
                        -np.cos(tf) * np.sin(ff), np.sin(tf)])
        frames[c] = np.stack([n, e_u, e_v])
    return frames


def _grid_lines(uv: np.ndarray):
    """Oriented line equations of both grid families of one cap.

    uv: (noy, nox, 2) node coordinates in the cap's gnomonic plane.
    Returns (lx (nox, 3), ly (noy, 3)) with (a, b, c) normalized and
    oriented so that a point in cell (iy, ix) has positive values on
    lines 0..ix (family x) / 0..iy (family y) and negative beyond.
    """
    noy, nox = uv.shape[:2]

    def fam(p0s, p1s):
        a = p1s[:, 1] - p0s[:, 1]
        b = p0s[:, 0] - p1s[:, 0]
        c = p1s[:, 0] * p0s[:, 1] - p0s[:, 0] * p1s[:, 1]
        norm = np.hypot(a, b)
        a, b, c = a / norm, b / norm, c / norm
        # orient: line i positive toward the LAST line's midpoint
        mids = 0.5 * (p0s + p1s)
        ref_last, ref_first = mids[-1], mids[0]
        for i in range(len(a)):
            ref = ref_last if i < len(a) - 1 else ref_first
            s = a[i] * ref[0] + b[i] * ref[1] + c[i]
            if i == len(a) - 1:
                s = -s      # last line: first line's side is the interior
            if s < 0:
                a[i], b[i], c[i] = -a[i], -b[i], -c[i]
        return np.stack([a, b, c], axis=1)

    lx = fam(uv[0, :, :], uv[-1, :, :])       # lines of constant ix
    ly = fam(uv[:, 0, :], uv[:, -1, :])       # lines of constant iy
    return lx, ly


class FullTracerField(NamedTuple):
    """Static location/interp tables for the 12-cap shell."""
    frames: jax.Array        # (12, 3, 3) gnomonic frames
    lines_x: jax.Array       # (12, nox, 3)
    lines_y: jax.Array       # (12, noy, 3)
    uv_nodes: jax.Array      # (12, noy, nox, 2)
    surf_inverse: jax.Array  # (12, noy, nox) -> global surface node
    sph_basis: jax.Array     # (nno, 3, 3) cols e_theta, e_fi, e_r
    nox: int
    noy: int
    noz: int
    r0: float
    dr: float
    r1: float

    @staticmethod
    def build(mesh: FullSphereMesh) -> "FullTracerField":
        nox, noy, noz = mesh.nodex, mesh.nodey, len(mesh.r)
        frames = _cap_frames()
        lxs, lys, uvs = [], [], []
        for c in range(12):
            s = cap_surface_nodes(c, nox, noy)          # (noy, nox, 2)
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
        basis = np.stack([e_t, e_f, e_r], axis=2)        # (nno, 3, 3)
        r = mesh.r
        # locate() uses the closed form (r - r0)/dr for the radial level,
        # which silently mislocates tracers on a graded radial mesh —
        # guard the assumption explicitly
        if r.size > 2 and not np.allclose(np.diff(r), r[1] - r[0],
                                          rtol=1e-6, atol=0.0):
            raise NotImplementedError(
                "FullTracerField requires a uniform radial grid; graded "
                "meshes need searchsorted-based radial location")
        return FullTracerField(
            jnp.asarray(frames), jnp.asarray(np.stack(lxs)),
            jnp.asarray(np.stack(lys)), jnp.asarray(np.stack(uvs)),
            jnp.asarray(mesh.surf_inverse), jnp.asarray(basis),
            nox, noy, noz, float(r[0]), float(r[1] - r[0]), float(r[-1]))


def locate(tf: FullTracerField, pos):
    """pos (n, 3) Cartesian -> (cap, iy, ix, kz, uv, wz).

    cap by largest interior margin over all 12 gnomonic frames (the
    icheck_all_caps role); (iy, ix) by oriented-line sign counts."""
    n_hat = tf.frames[:, 0]                      # (12, 3)
    pn = pos @ n_hat.T                           # (n, 12)
    pu = pos @ tf.frames[:, 1].T
    pv = pos @ tf.frames[:, 2].T
    safe = jnp.where(pn > 1e-9, pn, 1e-9)
    u = pu / safe                                # (n, 12)
    v = pv / safe

    # signed values on all lines of each family: (n, 12, nox/noy)
    sx = (u[..., None] * tf.lines_x[None, :, :, 0]
          + v[..., None] * tf.lines_x[None, :, :, 1] + tf.lines_x[None, :, :, 2])
    sy = (u[..., None] * tf.lines_y[None, :, :, 0]
          + v[..., None] * tf.lines_y[None, :, :, 1] + tf.lines_y[None, :, :, 2])
    # interior margin per cap: min signed distance to the 4 boundary
    # lines (first lines are positive-inside, LAST lines negative-inside
    # by the orientation convention of _grid_lines); hemisphere guard
    # via pn
    margin = jnp.minimum(
        jnp.minimum(jnp.minimum(sx[:, :, 0], -sx[:, :, -1]),
                    jnp.minimum(sy[:, :, 0], -sy[:, :, -1])),
        pn * 10.0)
    cap = jnp.argmax(margin, axis=1).astype(jnp.int32)          # (n,)

    take = lambda arr: jnp.take_along_axis(arr, cap[:, None, None],
                                           axis=1)[:, 0]
    sxc = take(sx)                                # (n, nox)
    syc = take(sy)                                # (n, noy)
    ix = jnp.clip(jnp.sum(sxc > 0, axis=1) - 1, 0, tf.nox - 2).astype(jnp.int32)
    iy = jnp.clip(jnp.sum(syc > 0, axis=1) - 1, 0, tf.noy - 2).astype(jnp.int32)
    uv = jnp.stack([jnp.take_along_axis(u, cap[:, None], 1)[:, 0],
                    jnp.take_along_axis(v, cap[:, None], 1)[:, 0]], axis=1)

    r = jnp.linalg.norm(pos, axis=1)
    tz = (r - tf.r0) / tf.dr
    kz = jnp.clip(tz.astype(jnp.int32), 0, tf.noz - 2)
    wz = jnp.clip(tz - kz, 0.0, 1.0)
    return cap, iy, ix, kz, uv, wz


def _cell_corners_uv(tf: FullTracerField, cap, iy, ix):
    """(n, 4, 2) cell corner uv in order s00, s10, s11, s01."""
    flat = tf.uv_nodes.reshape(12 * tf.noy * tf.nox, 2)
    base = (cap * tf.noy + iy) * tf.nox + ix
    ids = jnp.stack([base, base + 1, base + tf.nox + 1, base + tf.nox], 1)
    return jnp.take(flat, ids, axis=0)


def _bilinear_inverse(corners, p, iters: int = 3):
    """Local (xi, eta) in [-1,1]^2 with p = sum_k w_k(xi,eta) corners_k.

    Newton on the 2x2 system; cells are near-parallelograms in the
    gnomonic plane so 3 iterations reach machine precision.
    """
    c00, c10, c11, c01 = (corners[:, 0], corners[:, 1],
                          corners[:, 2], corners[:, 3])
    a0 = 0.25 * (c00 + c10 + c11 + c01)
    ax = 0.25 * (-c00 + c10 + c11 - c01)
    ay = 0.25 * (-c00 - c10 + c11 + c01)
    axy = 0.25 * (c00 - c10 + c11 - c01)

    def step(carry, _):
        xi, eta = carry
        F = a0 + ax * xi[:, None] + ay * eta[:, None] \
            + axy * (xi * eta)[:, None] - p
        Jx = ax + axy * eta[:, None]
        Jy = ay + axy * xi[:, None]
        det = Jx[:, 0] * Jy[:, 1] - Jx[:, 1] * Jy[:, 0]
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        dxi = (F[:, 0] * Jy[:, 1] - F[:, 1] * Jy[:, 0]) / det
        deta = (Jx[:, 0] * F[:, 1] - Jx[:, 1] * F[:, 0]) / det
        return (xi - dxi, eta - deta), None

    n = p.shape[0]
    (xi, eta), _ = jax.lax.scan(step, (jnp.zeros(n, p.dtype),
                                       jnp.zeros(n, p.dtype)),
                                None, length=iters)
    return jnp.clip(xi, -1.0, 1.0), jnp.clip(eta, -1.0, 1.0)


def interp_weights(tf: FullTracerField, pos):
    """(node_ids (n, 8), weights (n, 8)) of the trilinear interpolation
    stencil at arbitrary Cartesian positions — the sampling primitive the
    Exchanger coupler also uses (citcoms Exchanger's FEMInterpolator
    role)."""
    cap, iy, ix, kz, uv, wz = locate(tf, pos)
    corners = _cell_corners_uv(tf, cap, iy, ix)
    xi, eta = _bilinear_inverse(corners, uv)
    wx = jnp.stack([0.5 * (1 - xi), 0.5 * (1 + xi)], 1)     # along ix
    wy = jnp.stack([0.5 * (1 - eta), 0.5 * (1 + eta)], 1)   # along iy
    wr = jnp.stack([1 - wz, wz], 1)
    flat_inv = tf.surf_inverse.reshape(-1)
    ids, wts = [], []
    for dy in range(2):
        for dx in range(2):
            sid = jnp.take(flat_inv,
                           (cap * tf.noy + iy + dy) * tf.nox + ix + dx)
            for dz in range(2):
                ids.append(sid * tf.noz + kz + dz)
                wts.append(wy[:, dy] * wx[:, dx] * wr[:, dz])
    return jnp.stack(ids, 1), jnp.stack(wts, 1)


def interp_field(tf: FullTracerField, F, pos):
    """Sample a nodal field F (nno,) or (nno, m) at Cartesian positions."""
    ids, w = interp_weights(tf, pos)
    vals = jnp.take(F, ids, axis=0)                 # (n, 8[, m])
    if vals.ndim == 3:
        return jnp.sum(w[:, :, None] * vals, axis=1)
    return jnp.sum(w * vals, axis=1)


def interp_velocity(tf: FullTracerField, V, pos):
    """Cartesian velocity at tracer positions.

    V (nno, 3) spherical components at nodes -> rotated to Cartesian with
    the static per-node basis, then bilinear (gnomonic cell) x linear (r).
    """
    ids, w = interp_weights(tf, pos)
    vc = jnp.einsum("nkij,nkj->nki",
                    jnp.take(tf.sph_basis, ids, axis=0),
                    jnp.take(V, ids, axis=0))
    return jnp.sum(w[:, :, None] * vc, axis=1)


def clip_radius(tf: FullTracerField, pos):
    r = jnp.linalg.norm(pos, axis=1, keepdims=True)
    eps = 1e-9
    rc = jnp.clip(r, tf.r0 + eps, tf.r1 - eps)
    return pos * (rc / r)


def advect_tracers(tf: FullTracerField, V, pos, dt):
    """Predictor-corrector midpoint step in Cartesian coordinates
    (the reference's predict_tracers/correct_tracers pair)."""
    v1 = interp_velocity(tf, V, pos)
    mid = clip_radius(tf, pos + 0.5 * dt * v1)
    v2 = interp_velocity(tf, V, mid)
    return clip_radius(tf, pos + dt * v2)


def seed_tracers(mesh: FullSphereMesh, tracers_per_element: int,
                 *, seed: int = 0,
                 flavor_boundary_r: Optional[float] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform-in-volume seeding over the shell (make_tracer_array) with
    depth-based two-flavor init (ic_method_for_flavors=0)."""
    rng = np.random.default_rng(seed)
    n = mesh.nel * tracers_per_element
    # uniform on sphere x uniform in r^3 for volume uniformity
    zs = rng.uniform(-1.0, 1.0, n)
    ph = rng.uniform(0.0, 2 * np.pi, n)
    s = np.sqrt(1 - zs ** 2)
    r0, r1 = float(mesh.r[0]), float(mesh.r[-1])
    r = (rng.uniform(r0 ** 3, r1 ** 3, n)) ** (1.0 / 3.0)
    pos = np.stack([s * np.cos(ph), s * np.sin(ph), zs], 1) * r[:, None]
    if flavor_boundary_r is None:
        flavor_boundary_r = 0.5 * (r0 + r1)
    flavors = (r < flavor_boundary_r).astype(np.int32)
    return pos, flavors


def element_composition(tf: FullTracerField, mesh: FullSphereMesh,
                        pos, flavors, n_flavors: int = 2):
    """Ratio-method composition per element (Composition_related.c);
    element index follows the mesh build order
    (((cap*(noy-1)+iy)*(nox-1)+ix)*(noz-1)+kz)."""
    cap, iy, ix, kz, _, _ = locate(tf, pos)
    el = ((cap * (tf.noy - 1) + iy) * (tf.nox - 1) + ix) * (tf.noz - 1) + kz
    nel = mesh.nel
    total = jax.ops.segment_sum(jnp.ones_like(el, jnp.float32), el, nel)
    comps = []
    for f in range(n_flavors):
        cnt = jax.ops.segment_sum((flavors == f).astype(jnp.float32), el, nel)
        comps.append(cnt / jnp.maximum(total, 1.0))
    return jnp.stack(comps), total
