"""TPU df64 inner velocity solver — the 1e-10 tier on hardware without f64.

The reference runs Cookbook2 entirely in double (bin/Citcom.c); TPU v5e
has no native f64 and emulated f64 faults this runtime. This module runs
the *inner velocity CG* (conj_grad, General_matrix_functions.c:307-433)
— where ~90% of the per-step time goes — on the TPU in double-word f32
arithmetic (ops/df64.py, ~2^-49 relative), on the 27-point nodal stencil
operator (n_assemble_del2_u:516-577 analog, nodal.py).

Integration: the rest of the timestep (advection, assembly, Uzawa outer)
stays in true f64 on the CPU backend, bit-identical to the blessed
trajectory producer; the inner solve is swapped in through the existing
`inner_solve` seam of uzawa_cg via jax.pure_callback, so the CPU-side
algorithm is untouched. Validated against
benchmarks/cookbook2_blessed_f64.json at the 1e-10 tier (test_citcoms).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops import df64 as df

_OFFSETS = [(dy, dx, dz) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            for dz in (-1, 0, 1)]


def apply_stencil_df(Wp, up):
    """df64 27-point stencil: Au = sum_o W[..., o] @ u(shift o).

    Wp: (W_hi, W_lo) each (noy, nox, noz, 27, 3, 3) f32
    up: (u_hi, u_lo) each (noy, nox, noz, 3) f32
    """
    Wh, Wl = Wp
    uh, ul = up
    noy, nox, noz, _ = uh.shape
    pad = ((1, 1), (1, 1), (1, 1), (0, 0))
    uph = jnp.pad(uh, pad)
    upl = jnp.pad(ul, pad)
    oh = jnp.zeros_like(uh)
    ol = jnp.zeros_like(ul)
    out = (oh, ol)
    for o, (dy, dx, dz) in enumerate(_OFFSETS):
        sh = jax.lax.dynamic_slice(uph, (1 + dy, 1 + dx, 1 + dz, 0),
                                   (noy, nox, noz, 3))
        sl = jax.lax.dynamic_slice(upl, (1 + dy, 1 + dx, 1 + dz, 0),
                                   (noy, nox, noz, 3))
        # block multiply (3x3)@(3,) in df64, unrolled
        for i in range(3):
            acc = None
            for j in range(3):
                w = (Wh[:, :, :, o, i, j], Wl[:, :, :, o, i, j])
                t = df.mul(w, (sh[..., j], sl[..., j]))
                acc = t if acc is None else df.add(acc, t)
            out_i = df.add((out[0][..., i], out[1][..., i]), acc)
            out = (out[0].at[..., i].set(out_i[0]),
                   out[1].at[..., i].set(out_i[1]))
    return out


def nodal_matvec_df(Wp, up_flat, vbc_mask):
    """K u in df64 over flat (nno, 3) pairs, prescribed dofs stripped
    (strip_bcs_from_residual role, Element_calculations.c:506)."""
    noy, nox, noz = Wp[0].shape[:3]
    uh = up_flat[0].reshape(noy, nox, noz, 3)
    ul = up_flat[1].reshape(noy, nox, noz, 3)
    ah, al = apply_stencil_df(Wp, (uh, ul))
    ah = ah.reshape(-1, 3)
    al = al.reshape(-1, 3)
    ah = jnp.where(vbc_mask, 0.0, ah)
    al = jnp.where(vbc_mask, 0.0, al)
    return ah, al


def conj_grad_df(Wp, BIp, Fp, vbc_mask, acc, max_iter: int):
    """Diag-preconditioned CG in df64 (conj_grad:307-433 mirror).

    All vectors are (hi, lo) pairs; dot products and the alpha/beta
    recurrences run in df64 so the iterate tracks the f64 iterate to
    ~2^-49 per op. Returns ((d_hi, d_lo), residual_hi, iterations).
    """
    zero = jnp.zeros_like(Fp[0])
    d = (zero, zero)
    r = Fp
    res0 = df.sqrt(df.dot(r, r))

    def cond(state):
        d, r, p1, dotr0z0, res, count = state
        return jnp.logical_or(
            jnp.logical_and(res[0] > acc, count < max_iter), count == 0)

    def body(state):
        d, r, p1, dotr0z0, res, count = state
        z1 = (df.mul(BIp, r))
        dotr1z1 = df.dot(r, z1)
        beta = df.select(count == 0, df.df(0.0),
                         df.div(dotr1z1,
                                df.select(dotr0z0[0] == 0, df.df(1.0),
                                          dotr0z0)))
        p2 = df.add(z1, df.mul(beta, p1))
        Ap = nodal_matvec_df(Wp, p2, vbc_mask)
        dotprod = df.dot(p2, Ap)
        alpha = df.select(dotprod[0] == 0, df.df(1.0e-3),
                          df.div(dotr1z1,
                                 df.select(dotprod[0] == 0, df.df(1.0),
                                           dotprod)))

        d = df.add(d, df.mul(alpha, p2))
        r = df.add(r, df.mul(df.neg(alpha), Ap))
        res = df.sqrt(df.dot(r, r))
        return (d, r, p2, dotr1z1, res, count + 1)

    init = (d, r, (zero, zero), df.df(1.0), res0,
            jnp.asarray(0, jnp.int32))
    d, r, _, _, res, count = jax.lax.while_loop(cond, body, init)
    dh = jnp.where(vbc_mask, 0.0, d[0])
    dl = jnp.where(vbc_mask, 0.0, d[1])
    return (dh, dl), res[0], count


class DF64InnerSolver:
    """Host-side bridge: f64 (W, BI, F) -> TPU df64 CG -> f64 solution.

    Caches the split stencil on device keyed by a cheap fingerprint (the
    stencil only changes once per viscosity update, but the Uzawa outer
    loop calls the inner solve several times per step)."""

    def __init__(self, vbc_mask, max_iter: int, tpu_device=None):
        self.vbc_mask_np = np.asarray(vbc_mask)
        self.max_iter = int(max_iter)
        if tpu_device is None:
            tpu_device = [d for d in jax.devices()
                          if d.platform != "cpu"][0]
        self.dev = tpu_device
        self.vbc_dev = jax.device_put(self.vbc_mask_np, self.dev)
        self._w_key = None
        self._w_dev = None
        self._bi_dev = None
        # inputs are device_put to the TPU, so the jit runs there
        self._fn = jax.jit(partial(conj_grad_df, max_iter=self.max_iter))

    def _split_put(self, a64):
        hi = a64.astype(np.float32)
        lo = (a64 - hi.astype(np.float64)).astype(np.float32)
        return (jax.device_put(hi, self.dev), jax.device_put(lo, self.dev))

    def __call__(self, W, BI, F, acc):
        W = np.asarray(W, np.float64)
        BI = np.asarray(BI, np.float64)
        F = np.asarray(F, np.float64)
        key = (float(W.reshape(-1)[::65537].sum()), float(W[0, 0, 0, 13, 0, 0]))
        if key != self._w_key:
            self._w_dev = self._split_put(W)
            self._bi_dev = self._split_put(BI)
            self._w_key = key
        Fp = self._split_put(F)
        d, res, count = self._fn(self._w_dev, self._bi_dev, Fp,
                                 self.vbc_dev, np.float32(acc))
        dh, dl = np.asarray(d[0], np.float64), np.asarray(d[1], np.float64)
        return (dh + dl,
                np.float64(res),
                np.int32(count))
