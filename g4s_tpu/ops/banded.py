"""Banded linear algebra for stiff implicit integrators, JAX-native.

The reference's CVODES/IDA use LAPACK's banded factorization for
method-of-lines problems (``CVBand``; `cantera/src/numerics/BandMatrix.cpp`
wraps dgbtrf/dgbtrs) because a 1-D grid with ns species couples only
nearest neighbors: the Jacobian has half-bandwidth ~2*(ns+1), and both
the Jacobian build and the Newton solve drop from O(n^2)/O(n^3) to
O(n*w)/O(n*w^2).  This module provides the same capability inside jitted
JAX solvers (`ops/odeint.bdf_solve(bandwidth=...)`):

- ``banded_jac``: the banded Jacobian by Curtis-Powell-Reid striding —
  w = ml+mu+1 jvp evaluations with comb seed vectors (columns j = c mod w
  share a seed; their row supports within the band are disjoint), vmapped
  so the primal traces once.  This replaces n forward-mode columns.
- ``band_factor`` / ``band_solve``: LU of a row-banded matrix via
  `lax.scan`, WITHOUT partial pivoting.  Newton matrices M = I - c*J are
  the intended inputs: the unit diagonal keeps elimination well scaled
  for moderate c*J, and the BDF driver's own safeguards (convergence
  test, Jacobian refresh, step shrink) catch the rare breakdowns exactly
  as they catch a stale-Jacobian divergence.  This is the same trade
  VODE's no-pivot option and many MOL codes make; scipy.linalg's
  pivoted `solve_banded` remains the host-side oracle in tests.

Row-band layout: ``R[i, q] = M[i, i - ml + q]`` for q in [0, ml+mu],
zero where the column index falls outside [0, n).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def dense_to_band(M, ml: int, mu: int):
    """Row-band layout of a dense (n, n) matrix (host/test helper)."""
    n = M.shape[0]
    w = ml + mu + 1
    R = jnp.zeros((n, w), M.dtype)
    for q in range(w):                      # small static loop
        d = q - ml                          # diagonal offset
        diag = jnp.diagonal(M, offset=d)
        i0 = max(-d, 0)
        R = R.at[i0:i0 + diag.shape[0], q].set(diag)
    return R


def band_to_dense(R, ml: int, mu: int):
    n = R.shape[0]
    M = jnp.zeros((n, n), R.dtype)
    for q in range(ml + mu + 1):
        d = q - ml
        i = jnp.arange(max(-d, 0), min(n, n - d))
        M = M.at[i, i + d].set(R[i, q])
    return M


def banded_jac(f, t, y, ml: int, mu: int):
    """Banded Jacobian of f(t, y) in row-band layout, via w comb seeds.

    Columns with the same residue mod w=ml+mu+1 cannot touch the same
    row inside the band, so one jvp per residue class recovers every
    band entry exactly (Curtis-Powell-Reid, the coloring CVODES's
    difference-quotient banded Jacobian uses)."""
    n = y.shape[0]
    w = ml + mu + 1
    idx = jnp.arange(n)

    def col_class(c):
        seed = jnp.where(idx % w == c, 1.0, 0.0).astype(y.dtype)
        return jax.jvp(lambda yy: f(t, yy), (y,), (seed,))[1]

    cols = jax.vmap(col_class)(jnp.arange(w))        # (w, n): rows = class
    # R[i, q] = dF_i/dy_j at j = i - ml + q = cols[j % w, i]
    j = idx[:, None] - ml + jnp.arange(w)[None, :]   # (n, w) column index
    valid = (j >= 0) & (j < n)
    R = cols[j % w, idx[:, None]]
    return jnp.where(valid, R, 0.0)


@partial(jax.jit, static_argnames=("ml", "mu"))
def band_factor(R, *, ml: int, mu: int):
    """No-pivot LU of a row-banded matrix: returns (U_band, L_factors).

    U_band keeps the layout of R (subdiagonal slots become junk);
    L_factors is (n, ml) with L_factors[k, r-1] = multiplier of row k+r
    against pivot row k."""
    n, w = R.shape
    if w != ml + mu + 1:
        raise ValueError(f"band width {w} != ml+mu+1 = {ml + mu + 1}")
    dtype = R.dtype
    if ml == 0:                              # upper triangular already
        return R, jnp.zeros((n, 0), dtype)
    # pad with ml identity rows so the row window below the last pivot
    # is always full (padded rows produce zero multipliers)
    pad = jnp.zeros((ml, w), dtype).at[:, ml].set(1.0)
    Rp = jnp.concatenate([R, pad], axis=0)
    rr = jnp.arange(ml)
    # shifted-pivot gather: S[r-1, q] = pr_padded[q + r]
    sh = jnp.arange(w)[None, :] + (rr + 1)[:, None]     # (ml, w)

    def step(Rp, k):
        pr = jax.lax.dynamic_slice(Rp, (k, 0), (1, w))[0]
        piv = pr[ml]
        RB = jax.lax.dynamic_slice(Rp, (k + 1, 0), (ml, w))
        l = RB[rr, ml - 1 - rr] / piv
        prp = jnp.concatenate([pr, jnp.zeros((ml,), dtype)])
        S = prp[sh]                                      # (ml, w)
        RBn = RB - l[:, None] * S
        # subdiagonal slots of the eliminated rows are logically zero
        Rp = jax.lax.dynamic_update_slice(Rp, RBn, (k + 1, 0))
        return Rp, l

    Rp, L = jax.lax.scan(step, Rp, jnp.arange(n))
    return Rp[:n], L


@partial(jax.jit, static_argnames=("ml", "mu"))
def band_solve(fac, b, *, ml: int, mu: int):
    """Solve M x = b given ``fac = band_factor(R)``."""
    U, L = fac
    n, w = U.shape
    dtype = U.dtype

    if ml > 0:
        bp = jnp.concatenate([b, jnp.zeros((ml,), dtype)])

        def fwd(bp, k):
            bk = jax.lax.dynamic_slice(bp, (k,), (1,))[0]
            seg = jax.lax.dynamic_slice(bp, (k + 1,), (ml,))
            seg = seg - L[k] * bk
            bp = jax.lax.dynamic_update_slice(bp, seg, (k + 1,))
            return bp, None

        bp, _ = jax.lax.scan(fwd, bp, jnp.arange(n))
        b = bp[:n]

    # back substitution: x[k] = (b[k] - U[k, ml+1:] . x[k+1:k+mu+1]) / U[k, ml]
    xp = jnp.zeros((n + mu,), dtype)

    def bwd(xp, k):
        tail = jax.lax.dynamic_slice(xp, (k + 1,), (mu,)) if mu > 0 \
            else jnp.zeros((0,), dtype)
        bk = b[k]
        xk = (bk - jnp.dot(U[k, ml + 1:], tail)) / U[k, ml]
        xp = jax.lax.dynamic_update_slice(xp, xk[None], (k,))
        return xp, None

    xp, _ = jax.lax.scan(bwd, xp, jnp.arange(n - 1, -1, -1))
    return xp[:n]


def newton_band_factor(J_band, c, *, ml: int, mu: int):
    """Factor M = I - c*J from J in row-band layout."""
    R = -c * J_band
    R = R.at[:, ml].add(1.0)
    return band_factor(R, ml=ml, mu=mu)
