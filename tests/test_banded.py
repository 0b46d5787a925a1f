"""Banded Newton linear algebra + banded-Jacobian BDF (the CVBand role:
cantera/src/numerics/BandMatrix.cpp dgbtrf/dgbtrs wrappers, used by the
reference for method-of-lines problems)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from g4s_tpu.ops.banded import (band_factor, band_solve, band_to_dense,
                                banded_jac, dense_to_band,
                                newton_band_factor)
from g4s_tpu.ops.odeint import bdf_solve


def _rand_banded(n, ml, mu, rng, dom=4.0):
    M = np.zeros((n, n))
    for d in range(-ml, mu + 1):
        diag = rng.standard_normal(n - abs(d))
        M += np.diag(diag, d)
    M += dom * np.eye(n)          # diagonally dominant: no-pivot safe
    return M


@pytest.mark.parametrize("n,ml,mu", [(17, 2, 3), (32, 1, 1), (9, 0, 2),
                                     (9, 3, 0), (64, 5, 5)])
def test_band_factor_solve_vs_scipy(n, ml, mu, rng):
    M = _rand_banded(n, ml, mu, rng)
    b = rng.standard_normal(n)
    R = dense_to_band(jnp.asarray(M), ml, mu)
    assert np.allclose(np.asarray(band_to_dense(R, ml, mu)), M)
    fac = band_factor(R, ml=ml, mu=mu)
    x = band_solve(fac, jnp.asarray(b), ml=ml, mu=mu)
    assert np.allclose(np.asarray(x), np.linalg.solve(M, b),
                       rtol=1e-10, atol=1e-12)


def test_band_solve_matches_scipy_banded(rng):
    n, ml, mu = 40, 3, 2
    M = _rand_banded(n, ml, mu, rng)
    b = rng.standard_normal(n)
    # scipy's ab layout: ab[mu + i - j, j]
    ab = np.zeros((ml + mu + 1, n))
    for j in range(n):
        for i in range(max(0, j - mu), min(n, j + ml + 1)):
            ab[mu + i - j, j] = M[i, j]
    x_sp = scipy.linalg.solve_banded((ml, mu), ab, b)
    fac = band_factor(dense_to_band(jnp.asarray(M), ml, mu), ml=ml, mu=mu)
    x = band_solve(fac, jnp.asarray(b), ml=ml, mu=mu)
    assert np.allclose(np.asarray(x), x_sp, rtol=1e-9, atol=1e-11)


def _brusselator_rhs(n_pts):
    """1-D Brusselator reaction-diffusion MOL: 2 species, nearest-neighbor
    coupling -> half-bandwidth 3 in the interleaved (u0,v0,u1,v1,...)
    ordering (the layout StFlow uses: per-point blocks)."""
    A, B, D = 1.0, 3.0, 0.02
    h2 = (1.0 / (n_pts + 1)) ** 2

    def rhs(t, y):
        u = y[0::2]
        v = y[1::2]
        up = jnp.pad(u, 1, constant_values=A)
        vp = jnp.pad(v, 1, constant_values=B / A)
        lap_u = (up[2:] - 2 * u + up[:-2]) / h2
        lap_v = (vp[2:] - 2 * v + vp[:-2]) / h2
        du = A - (B + 1) * u + u * u * v + D * lap_u
        dv = B * u - u * u * v + D * lap_v
        return jnp.stack([du, dv], axis=1).reshape(-1)
    return rhs


def test_banded_jac_matches_dense():
    rhs = _brusselator_rhs(12)
    y = jnp.asarray(np.linspace(0.5, 1.5, 24))
    ml = mu = 3
    Jd = jax.jacfwd(rhs, argnums=1)(0.0, y)
    Rb = banded_jac(rhs, 0.0, y, ml, mu)
    assert np.allclose(np.asarray(band_to_dense(Rb, ml, mu)),
                       np.asarray(Jd), atol=1e-12)
    # newton factor consistency: (I - c J) x via band == dense
    c = 0.37
    fac = newton_band_factor(Rb, c, ml=ml, mu=mu)
    b = jnp.asarray(np.sin(np.arange(24.0)))
    x = band_solve(fac, b, ml=ml, mu=mu)
    x_d = np.linalg.solve(np.eye(24) - c * np.asarray(Jd), np.asarray(b))
    assert np.allclose(np.asarray(x), x_d, rtol=1e-9, atol=1e-11)


def test_bdf_banded_matches_dense():
    n_pts = 16
    rhs = _brusselator_rhs(n_pts)
    y0 = jnp.asarray(
        np.stack([1.0 + 0.1 * np.sin(np.pi * np.linspace(0, 1, n_pts)),
                  3.0 * np.ones(n_pts)], axis=1).reshape(-1))
    dense = bdf_solve(rhs, y0, 0.0, 2.0, rtol=1e-8, atol=1e-10)
    band = bdf_solve(rhs, y0, 0.0, 2.0, rtol=1e-8, atol=1e-10,
                     bandwidth=(3, 3))
    assert bool(dense.success) and bool(band.success)
    assert np.allclose(np.asarray(band.y), np.asarray(dense.y),
                       rtol=1e-6, atol=1e-8)
    # the banded path must actually integrate stiffly (not one giant step)
    assert int(band.steps) > 10


def test_bdf_banded_vs_scipy():
    import scipy.integrate
    n_pts = 10
    rhs = _brusselator_rhs(n_pts)
    y0 = np.ones(2 * n_pts)
    ref = scipy.integrate.solve_ivp(
        lambda t, y: np.asarray(rhs(t, jnp.asarray(y))), (0.0, 1.0), y0,
        method="BDF", rtol=1e-9, atol=1e-11)
    band = bdf_solve(rhs, jnp.asarray(y0), 0.0, 1.0, rtol=1e-9, atol=1e-11,
                     bandwidth=(3, 3))
    assert np.allclose(np.asarray(band.y), ref.y[:, -1],
                       rtol=1e-6, atol=1e-8)
