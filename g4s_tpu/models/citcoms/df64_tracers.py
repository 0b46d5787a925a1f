"""Regional tracer advection + ratio-method composition in df64.

Extends the 1e-10 tier (df64_step.py) to the thermochemical envelope:
the CPU-f64 oracle path is CitcomModel.step_tracers (tracers.py — the
Regional_tracer_advection.c predictor-corrector + Composition_related.c
ratio method); this module reproduces it in double-word f32 so the whole
CDEPV/chemical-buoyancy timestep stays on the TPU.

Design notes
- Point location computes t = (pos - x0)/dx in df and floors on the
  combined (hi + lo) value: the cell decision agrees with true f64
  except for tracers within ~2^-49 of a cell face — the same knife-edge
  any two arithmetics disagree on.
- Composition counting is exact (integer counts in f32 hold to 2^24);
  the ratio division and node averaging run in df.
- All gathers index the hi and lo words with the same indices, so a DF
  field gathers as two plain takes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops import df64 as df


class TracerStaticsDF(NamedTuple):
    """df pairs of the uniform-grid constants (TracerField role)."""
    theta0: df.DF
    inv_dtheta: df.DF
    fi0: df.DF
    inv_dfi: df.DF
    r0: df.DF
    inv_dr: df.DF
    lo: df.DF                 # (3,) clip bounds (+eps, as tracers.clip)
    hi: df.DF
    nox: int
    noy: int
    noz: int

    @staticmethod
    def build(tf) -> "TracerStaticsDF":
        """From a tracers.TracerField (whose scalars are python f64)."""
        s = lambda v: df.from_f64(np.float64(v))
        eps = 1e-9
        lo64 = np.array([tf.theta0, tf.fi0, tf.r0]) + eps
        hi64 = np.array([tf.theta0 + (tf.nox - 1) * tf.dtheta,
                         tf.fi0 + (tf.noy - 1) * tf.dfi,
                         tf.r0 + (tf.noz - 1) * tf.dr]) - eps
        return TracerStaticsDF(
            s(tf.theta0), s(1.0 / np.float64(tf.dtheta)),
            s(tf.fi0), s(1.0 / np.float64(tf.dfi)),
            s(tf.r0), s(1.0 / np.float64(tf.dr)),
            df.from_f64(lo64), df.from_f64(hi64),
            tf.nox, tf.noy, tf.noz)

    def node_index(self, iy, jx, kz):
        return (iy * self.nox + jx) * self.noz + kz

    def element_index(self, iy, jx, kz):
        return (iy * (self.nox - 1) + jx) * (self.noz - 1) + kz


def _comp(pos_p, i):
    return pos_p[0][:, i], pos_p[1][:, i]


def _sign_df(x: df.DF):
    """Sign of hi + lo without rounding across zero: |lo| <= ulp(hi)/2
    means hi + lo in f32 keeps the true sign (f32 addition cannot round
    past zero when one operand dominates)."""
    return x[0] + x[1]


def _floor_df(t: df.DF):
    """floor(hi + lo) as int32, correct when the hi word rounds across
    the integer boundary the true value sits on."""
    f = jnp.floor(t[0])
    frac = df.add_f(t, -f)                    # t - floor(hi), in df
    f = jnp.where(_sign_df(frac) < 0.0, f - 1.0, f)
    f = jnp.where(_sign_df(df.add_f(frac, np.float32(-1.0))) >= 0.0,
                  f + 1.0, f)
    return f.astype(jnp.int32)


def locate_df(st: TracerStaticsDF, pos_p):
    """((jx, iy, kz) int32, xi df (n,3)-by-axis tuple) — tracers.locate."""
    tx = df.mul(df.sub(_comp(pos_p, 0), _bcast(st.theta0, pos_p)),
                _bcast(st.inv_dtheta, pos_p))
    ty = df.mul(df.sub(_comp(pos_p, 1), _bcast(st.fi0, pos_p)),
                _bcast(st.inv_dfi, pos_p))
    tz = df.mul(df.sub(_comp(pos_p, 2), _bcast(st.r0, pos_p)),
                _bcast(st.inv_dr, pos_p))
    jx = jnp.clip(_floor_df(tx), 0, st.nox - 2)
    iy = jnp.clip(_floor_df(ty), 0, st.noy - 2)
    kz = jnp.clip(_floor_df(tz), 0, st.noz - 2)
    two = np.float32(2.0)
    xi = tuple(
        df.add_f(df.mul_f(df.add_f(t, -j.astype(jnp.float32)), two),
                 np.float32(-1.0))
        for t, j in ((tx, jx), (ty, iy), (tz, kz)))
    return (jx, iy, kz), xi


def _bcast(s: df.DF, pos_p):
    n = pos_p[0].shape[0]
    return (jnp.broadcast_to(s[0], (n,)), jnp.broadcast_to(s[1], (n,)))


def _take_df(V_p, idx):
    return jnp.take(V_p[0], idx, axis=0), jnp.take(V_p[1], idx, axis=0)


def interp_velocity_df(st: TracerStaticsDF, V_p, pos_p):
    """Trilinear df interpolation of the (nno, 3) df velocity field."""
    (jx, iy, kz), xi = locate_df(st, pos_p)
    half = np.float32(0.5)
    w = []
    for x in xi:
        wm = df.mul_f(df.add_f(df.neg(x), np.float32(1.0)), half)
        wp = df.mul_f(df.add_f(x, np.float32(1.0)), half)
        w.append((wm, wp))
    out = None
    for dy in range(2):
        for dx in range(2):
            for dz in range(2):
                n = st.node_index(iy + dy, jx + dx, kz + dz)
                ww = df.mul(df.mul(w[1][dy], w[0][dx]), w[2][dz])
                v = _take_df(V_p, n)                   # (n, 3) df
                term = df.mul((ww[0][:, None], ww[1][:, None]), v)
                out = term if out is None else df.add(out, term)
    return out


def _rates_df(pos_p, v_p):
    """Spherical components -> coordinate rates (tracers._velocity_to_rates):
    (u_t/r, u_f/(r sin t), u_r)."""
    th = _comp(pos_p, 0)
    r = _comp(pos_p, 2)
    st_ = df.sin(th)
    vt = (v_p[0][:, 0], v_p[1][:, 0])
    vf = (v_p[0][:, 1], v_p[1][:, 1])
    vr = (v_p[0][:, 2], v_p[1][:, 2])
    rt = df.div(vt, r)
    rf = df.div(vf, df.mul(r, st_))
    return (jnp.stack([rt[0], rf[0], vr[0]], axis=1),
            jnp.stack([rt[1], rf[1], vr[1]], axis=1))


def _clip_df(st: TracerStaticsDF, pos_p):
    lo = st.lo
    hi = st.hi
    h, l = pos_p
    for i in range(3):
        c = (h[:, i], l[:, i])
        below = _sign_df(df.sub(c, (lo[0][i], lo[1][i]))) < 0.0
        above = _sign_df(df.sub(c, (hi[0][i], hi[1][i]))) > 0.0
        nh = jnp.where(below, lo[0][i], jnp.where(above, hi[0][i], c[0]))
        nl = jnp.where(below, lo[1][i], jnp.where(above, hi[1][i], c[1]))
        h = h.at[:, i].set(nh)
        l = l.at[:, i].set(nl)
    return h, l


def advect_tracers_df(st: TracerStaticsDF, V_p, pos_p, dt_p):
    """Predictor-corrector midpoint step (tracers.advect_tracers)."""
    v1 = interp_velocity_df(st, V_p, pos_p)
    half_dt = df.mul_f(dt_p, np.float32(0.5))
    r1 = _rates_df(pos_p, v1)
    mid = _clip_df(st, df.add(pos_p, df.mul(
        (jnp.broadcast_to(half_dt[0], r1[0].shape),
         jnp.broadcast_to(half_dt[1], r1[0].shape)), r1)))
    v2 = interp_velocity_df(st, V_p, mid)
    r2 = _rates_df(mid, v2)
    return _clip_df(st, df.add(pos_p, df.mul(
        (jnp.broadcast_to(dt_p[0], r2[0].shape),
         jnp.broadcast_to(dt_p[1], r2[0].shape)), r2)))


def element_composition_df(st: TracerStaticsDF, pos_p, flavors,
                           n_flavors: int = 2):
    """Ratio-method composition per element (Composition_related.c).
    Counts are exact; the ratio runs in df."""
    (jx, iy, kz), _ = locate_df(st, pos_p)
    el = st.element_index(iy, jx, kz)
    nel = (st.nox - 1) * (st.noy - 1) * (st.noz - 1)
    total = jax.ops.segment_sum(jnp.ones_like(el, jnp.float32), el, nel)
    tot_p = (jnp.maximum(total, 1.0), jnp.zeros_like(total))
    comps = []
    for f in range(n_flavors):
        cnt = jax.ops.segment_sum((flavors == f).astype(jnp.float32),
                                  el, nel)
        comps.append(df.div((cnt, jnp.zeros_like(cnt)), tot_p))
    return comps, total


def composition_to_nodes_df(st: TracerStaticsDF, comp_el_p, scat):
    """Element composition -> nodal field via the df-aware PaddedScatter
    (tracers.composition_to_nodes, volume-agnostic averaging)."""
    h = jnp.broadcast_to(comp_el_p[0][:, None], (comp_el_p[0].shape[0], 8)) \
        .reshape(-1)
    l = jnp.broadcast_to(comp_el_p[1][:, None], (comp_el_p[1].shape[0], 8)) \
        .reshape(-1)
    num = scat.apply((h, l))
    den = scat.apply((jnp.ones_like(h), jnp.zeros_like(l)))
    return df.div(num, (jnp.maximum(den[0], 1.0), den[1]))
