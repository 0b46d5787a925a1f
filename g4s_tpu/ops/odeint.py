"""Stiff ODE integration: variable-order BDF in pure JAX.

This is the TPU-native replacement for the reference's SUNDIALS CVODES
backend (cantera/src/numerics/CVodesIntegrator.cpp: BDF method with Newton
iteration and dense Jacobians, driving every reactor solve through
`CVode` at :531,548). The algorithm is the classic variable-order (1-5)
quasi-constant-step BDF in backward-difference form (Shampine & Reichelt,
"The MATLAB ODE Suite" / ode15s family, which CVODES also implements):

  - backward differences D[0..k+2] carry the history; prediction is the
    sum of differences; step-size changes rescale D with the R matrix;
  - modified Newton on (I - h/alpha J); the Jacobian (jax.jacfwd — exact,
    not CVODES's finite differences) is FROZEN across steps and only
    refreshed on Newton failure; the LU refactorizes when c = h/alpha
    changes (the standard CVODES reuse policy);
  - local error control with RMS norms over atol + rtol*|y|; order
    selection from error estimates at orders k-1, k, k+1 after k+1 equal
    steps.

The entire integration is one lax.while_loop -> a single XLA computation;
all shapes are static (D is (MAX_ORDER+3, n)).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_ORDER = 5
NEWTON_MAXITER = 4
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0

_KAPPA = np.array([0.0, -0.1850, -1.0 / 9.0, -0.0823, -0.0415, 0.0])
_GAMMA = np.hstack([0.0, np.cumsum(1.0 / np.arange(1, MAX_ORDER + 1))])
_ALPHA = (1.0 - _KAPPA) * _GAMMA
_ERROR_CONST = _KAPPA * _GAMMA + 1.0 / np.arange(1, MAX_ORDER + 2)


def _rescale_D(D, order, factor):
    """D[:order+1] <- (R(factor) R(1))^T D[:order+1] with dynamic order
    (rows/cols past `order` masked to identity)."""
    m = MAX_ORDER + 1
    I = jnp.arange(1, m)[:, None].astype(D.dtype)
    J = jnp.arange(1, m)[None, :].astype(D.dtype)
    idx = jnp.arange(m)
    keep = (idx[:, None] <= order) & (idx[None, :] <= order)
    eye = jnp.eye(m, dtype=D.dtype)

    def mat(fac):
        M = jnp.zeros((m, m), D.dtype)
        M = M.at[1:, 1:].set((I - 1 - fac * J) / I)
        M = M.at[0].set(1.0)
        return jnp.where(keep, jnp.cumprod(M, axis=0), eye)

    RU = mat(factor) @ mat(jnp.asarray(1.0, D.dtype))
    return D.at[:m].set(RU.T @ D[:m])


class BDFResult(NamedTuple):
    y: jax.Array
    t: jax.Array
    steps: jax.Array
    n_fev: jax.Array
    n_jev: jax.Array
    success: jax.Array
    record: jax.Array | None = None   # (record_size, m) per-accepted-step
    record_t: jax.Array | None = None  # (record_size,) times


class _S(NamedTuple):
    t: jax.Array
    h: jax.Array
    order: jax.Array
    D: jax.Array
    n_eq_steps: jax.Array
    J: jax.Array
    lu: tuple
    c_lu: jax.Array          # the c the current LU was built with
    steps: jax.Array
    n_fev: jax.Array
    n_jev: jax.Array
    fail: jax.Array
    buf: jax.Array           # (record_size, m) per-step observations
    buf_t: jax.Array         # (record_size,)
    rec: jax.Array           # next record slot


def bdf_solve(f: Callable, y0, t0, t1, *, rtol=1e-6, atol=1e-9,
              first_step=None, max_steps=100000, jac=None,
              record_fn: Callable | None = None,
              record_size: int = 0,
              bandwidth: tuple | None = None) -> BDFResult:
    """Integrate dy/dt = f(t, y) from t0 to t1; returns the state at t1.

    With record_fn, every accepted internal step appends
    (t, record_fn(y)) to a fixed-size buffer — the analog of driving
    CVODES in one-step mode (`ReactorNet.step`, zeroD/ReactorNet.cpp:210)
    and capturing a SolutionArray row per step.

    bandwidth=(ml, mu) switches the Newton linear algebra to the banded
    path (the CVBand role, `numerics/BandMatrix.cpp` dgbtrf/dgbtrs):
    the Jacobian is built with ml+mu+1 comb-seeded jvps instead of n
    forward columns and factored/solved in O(n*w^2)/O(n*w)
    (ops/banded.py). The RHS must genuinely have the claimed band
    structure — out-of-band couplings alias into band slots, exactly as
    with CVODES's difference-quotient banded Jacobian. A user `jac`
    must return the row-band layout (n, ml+mu+1) in this mode.
    """
    y0 = jnp.asarray(y0)
    n = y0.shape[0]
    dtype = y0.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    if bandwidth is None:
        if jac is None:
            jac = jax.jacfwd(f, argnums=1)
    else:
        from g4s_tpu.ops.banded import (band_solve, banded_jac,
                                        newton_band_factor)
        ml_, mu_ = int(bandwidth[0]), int(bandwidth[1])
        if jac is None:
            jac = lambda t, y: banded_jac(f, t, y, ml_, mu_)

    gamma = jnp.asarray(_GAMMA, dtype)
    alpha = jnp.asarray(_ALPHA, dtype)
    error_const = jnp.asarray(_ERROR_CONST, dtype)
    eye = jnp.eye(n, dtype=dtype)
    if bandwidth is None:
        _factor = lambda J, c: jax.scipy.linalg.lu_factor(eye - c * J)
        _lsolve = jax.scipy.linalg.lu_solve
    else:
        _factor = lambda J, c: newton_band_factor(J, c, ml=ml_, mu=mu_)
        _lsolve = lambda fac, rhs: band_solve(fac, rhs, ml=ml_, mu=mu_)

    f0 = f(t0, y0)
    if first_step is None:
        scale0 = atol + rtol * jnp.abs(y0)
        d0 = jnp.sqrt(jnp.mean((y0 / scale0) ** 2))
        d1 = jnp.sqrt(jnp.mean((f0 / scale0) ** 2))
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
        h0 = jnp.minimum(h0, jnp.abs(t1 - t0))
    else:
        h0 = jnp.asarray(first_step, dtype)

    D0 = jnp.zeros((MAX_ORDER + 3, n), dtype)
    D0 = D0.at[0].set(y0).at[1].set(f0 * h0)

    if record_fn is None:
        _rec_fn = lambda y: jnp.zeros((1,), dtype)
        rec_size = 1
    else:
        _rec_fn = lambda y: jnp.atleast_1d(jnp.asarray(record_fn(y), dtype))
        rec_size = max(record_size, 1)
    m_rec = int(_rec_fn(y0).shape[0])
    buf0 = jnp.zeros((rec_size, m_rec), dtype)
    buf0 = buf0.at[0].set(_rec_fn(y0))
    buf_t0 = jnp.full((rec_size,), t0, dtype)

    # the Newton matrix only steers the iteration (any nonsingular
    # matrix converges); freezing it under differentiation is exactly
    # CVODES's staggered scheme, where sensitivity systems REUSE the
    # primal's factors instead of differentiating the factorization
    J0 = jax.lax.stop_gradient(jac(t0, y0))
    c0 = h0 / alpha[1]
    lu0 = jax.lax.stop_gradient(_factor(J0, c0))
    st0 = _S(t0, h0, jnp.asarray(1, jnp.int32), D0, jnp.asarray(0, jnp.int32),
             J0, lu0, c0, jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
             jnp.asarray(1, jnp.int32), jnp.asarray(False),
             buf0, buf_t0, jnp.asarray(1, jnp.int32))

    def newton(t_new, y_pred, c, psi, scale, lu):
        def body(carry):
            d, y, dwn_old, it, conv, div, nf = carry
            rhs = c * f(t_new, y) - psi - d
            dw = _lsolve(lu, rhs)
            dwn = jnp.sqrt(jnp.mean((dw / scale) ** 2))
            rate = dwn / jnp.maximum(dwn_old, 1e-300)
            safe_rate = jnp.minimum(rate, 0.999)
            diverged = (it > 0) & (rate >= 1.0)
            d = d + dw
            y = y_pred + d
            conv_now = jnp.where(
                it > 0, safe_rate / (1.0 - safe_rate) * dwn < 1e-3,
                dwn < 1e-12)
            return (d, y, dwn, it + 1, conv | conv_now, div | diverged, nf + 1)

        def cnd(carry):
            _, _, _, it, conv, div, _ = carry
            return (it < NEWTON_MAXITER) & (~conv) & (~div)

        init = (jnp.zeros_like(y_pred), y_pred, jnp.asarray(0.0, dtype),
                jnp.asarray(0, jnp.int32), jnp.asarray(False),
                jnp.asarray(False), jnp.asarray(0, jnp.int32))
        d, y, _, _, conv, div, nf = jax.lax.while_loop(cnd, body, init)
        return d, conv & (~div), nf

    def cond(st):
        return (st.t < t1) & (~st.fail)

    def body(st):
        # clip final step
        h = jnp.minimum(st.h, t1 - st.t)
        D = jax.lax.cond(h < st.h,
                         lambda: _rescale_D(st.D, st.order, h / st.h),
                         lambda: st.D)
        order = st.order
        c = h / alpha[order]
        lu = jax.lax.cond(c != st.c_lu,
                          lambda: jax.lax.stop_gradient(_factor(st.J, c)),
                          lambda: st.lu)
        t_new = st.t + h

        idx = jnp.arange(MAX_ORDER + 3)
        y_pred = jnp.sum(jnp.where((idx <= order)[:, None], D, 0.0), axis=0)
        scale = atol + rtol * jnp.abs(y_pred)
        g = gamma[jnp.clip(idx, 0, MAX_ORDER + 1)][:, None]
        psi = jnp.sum(jnp.where(((idx >= 1) & (idx <= order))[:, None],
                                D * g, 0.0), axis=0) / alpha[order]

        d, conv, nf1 = newton(t_new, y_pred, c, psi, scale, lu)

        # on failure: refresh Jacobian at the prediction and retry once
        def retry():
            Jn = jax.lax.stop_gradient(jac(t_new, y_pred))
            lun = jax.lax.stop_gradient(_factor(Jn, c))
            d2, conv2, nf2 = newton(t_new, y_pred, c, psi, scale, lun)
            return Jn, lun, d2, conv2, nf2, jnp.asarray(1, jnp.int32)

        J, lu, d, conv, nf2, jev = jax.lax.cond(
            conv,
            lambda: (st.J, lu, d, conv, jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32)),
            retry)

        err = error_const[order] * d
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
        accept = conv & (err_norm <= 1.0)

        # rejected: shrink step
        factor_rej = jnp.where(
            conv, jnp.clip(0.9 * err_norm ** (-1.0 / (order + 1)),
                           MIN_FACTOR, 0.9),
            jnp.asarray(0.5, dtype))

        # accepted: update difference array
        def accepted():
            Da = D.at[order + 2].set(d - D[order + 1]).at[order + 1].set(d)

            def casc(i, Dx):
                k = order - i
                return Dx.at[k].add(Dx[k + 1])

            Da = jax.lax.fori_loop(0, order + 1, casc, Da)
            n_eq = st.n_eq_steps + 1

            def adapt(Dx):
                em = jnp.where(
                    order > 1,
                    error_const[order - 1]
                    * jnp.sqrt(jnp.mean((Dx[order] / scale) ** 2)), jnp.inf)
                ep = jnp.where(
                    order < MAX_ORDER,
                    error_const[jnp.minimum(order + 1, MAX_ORDER + 1)]
                    * jnp.sqrt(jnp.mean((Dx[order + 2] / scale) ** 2)), jnp.inf)
                errs = jnp.stack([em, jnp.maximum(err_norm, 1e-300), ep])
                powers = 1.0 / (order + jnp.arange(3, dtype=dtype))
                factors = jnp.power(jnp.maximum(errs, 1e-300), -powers)
                best = jnp.argmax(factors)
                new_order = jnp.clip(order + best - 1, 1,
                                     MAX_ORDER).astype(jnp.int32)
                fac = jnp.clip(0.9 * factors[best], MIN_FACTOR, MAX_FACTOR)
                return new_order, fac, _rescale_D(Dx, new_order, fac), \
                    jnp.asarray(0, jnp.int32)

            def keep(Dx):
                return order, jnp.asarray(1.0, dtype), Dx, n_eq

            new_order, fac, Da2, n_eq2 = jax.lax.cond(
                n_eq >= order + 1, adapt, keep, Da)
            return t_new, h * fac, new_order, Da2, n_eq2

        def rejected():
            Dr = _rescale_D(D, order, factor_rej)
            return st.t, h * factor_rej, order, Dr, jnp.asarray(0, jnp.int32)

        t_nxt, h_nxt, ord_nxt, D_nxt, neq_nxt = jax.lax.cond(
            accept, accepted, rejected)
        fail = (h_nxt <= jnp.abs(t1 - t0) * 1e-14) | \
               (st.steps + 1 >= max_steps)
        # Always write one masked row: a lax.cond over the whole buffer
        # would force XLA to copy the (rec_size, m) carry every step
        # (measured 6x the entire step cost); the row-wise
        # dynamic-update-slice is updated in place inside the while_loop.
        slot = jnp.minimum(st.rec, rec_size - 1)
        row = jnp.where(accept, _rec_fn(y_pred + d), st.buf[slot])
        buf = st.buf.at[slot].set(row)
        buf_t = st.buf_t.at[slot].set(jnp.where(accept, t_new,
                                                st.buf_t[slot]))
        rec = st.rec + jnp.where(accept, 1, 0)
        return _S(t_nxt, h_nxt, ord_nxt, D_nxt, neq_nxt, J, lu, c,
                  st.steps + 1, st.n_fev + nf1 + nf2 + 1,
                  st.n_jev + jev, fail, buf, buf_t, rec)

    out = jax.lax.while_loop(cond, body, st0)
    rec_out = out.buf if record_fn is not None else None
    rec_t_out = out.buf_t if record_fn is not None else None
    return BDFResult(out.D[0], out.t, out.steps, out.n_fev, out.n_jev,
                     (~out.fail) | (out.t >= t1), rec_out, rec_t_out)


def bdf_solve_with_sensitivities(f_params, params, y0, t0, t1, *,
                                 rtol=1e-6, atol=1e-9, **kw):
    """STAGGERED forward sensitivity analysis (CVodeSensInit,
    cantera/src/numerics/CVodesIntegrator.cpp sensitivity interface).

    f_params(params, t, y) -> dy/dt. Returns (BDFResult, dy1/dparams).

    All parameter tangents propagate in ONE pass: jax.vmap over jvp
    batches every tangent through a single adaptive integration. The
    while_loop predicate and primal carry stay unbatched (the primal is
    shared), so each BDF step advances the primal once and all n_p
    tangent columns against the SAME step sizes, orders, and factored
    Newton matrices — exactly CVODES's staggered scheme, where the
    sensitivity systems reuse the primal's linear solver. Cost is
    primal + O(n_p) back-substitutions per step, not n_p full
    re-integrations (the round-2 implementation's behavior).
    """
    from jax.flatten_util import ravel_pytree
    params_flat, unravel = ravel_pytree(params)

    def solve_y(pf):
        p = unravel(pf)
        res = bdf_solve(lambda t, y: f_params(p, t, y), y0, t0, t1,
                        rtol=rtol, atol=atol, **kw)
        return res.y, res

    n_p = params_flat.shape[0]
    basis = jnp.eye(n_p, dtype=params_flat.dtype)
    y1, res = solve_y(params_flat)

    def tangent(v):
        _, (dy, _) = jax.jvp(solve_y, (params_flat,), (v,))
        return dy

    sens = jax.vmap(tangent)(basis)          # (n_params, n_states)
    return res, sens.T                       # (n_states, n_params)


def dae_solve(F, y0, ydot0, t0, t1, *, rtol=1e-6, atol=1e-9,
              first_step=None, max_steps=100000) -> BDFResult:
    """Implicit DAE integration: variable-order BDF on F(t, y, y') = 0.

    The IDA_Solver role (cantera/src/numerics/IDA_Solver.cpp — SUNDIALS
    IDA is BDF applied to the implicit residual). Reuses bdf_solve's
    backward-difference machinery; the corrector solves
        F(t_new, y_pred + d, (psi + d) / c) = 0
    by modified Newton with the iteration matrix M = dF/dy + (1/c) dF/dy'
    (IDA's cj = 1/c), frozen across steps like the ODE path. For the
    special case F = y' - f(t, y) this reduces exactly to bdf_solve's
    corrector. `ydot0` must be consistent: F(t0, y0, ydot0) = 0 (as IDA
    requires; no IC calculation pass yet).

    Index-1 DAEs with nonsingular M are supported; the local error test
    is applied to all components (IDA's default, suppressalg off).
    """
    y0 = jnp.asarray(y0)
    ydot0 = jnp.asarray(ydot0)
    n = y0.shape[0]
    dtype = y0.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    jac_y = jax.jacfwd(F, argnums=1)
    jac_yp = jax.jacfwd(F, argnums=2)

    gamma = jnp.asarray(_GAMMA, dtype)
    alpha = jnp.asarray(_ALPHA, dtype)
    error_const = jnp.asarray(_ERROR_CONST, dtype)

    if first_step is None:
        scale0 = atol + rtol * jnp.abs(y0)
        d0 = jnp.sqrt(jnp.mean((y0 / scale0) ** 2))
        d1 = jnp.sqrt(jnp.mean((ydot0 / scale0) ** 2))
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
        h0 = jnp.minimum(h0, jnp.abs(t1 - t0))
    else:
        h0 = jnp.asarray(first_step, dtype)

    D0 = jnp.zeros((MAX_ORDER + 3, n), dtype)
    D0 = D0.at[0].set(y0).at[1].set(ydot0 * h0)

    def build_M(t, y, yp, c):
        return jax.lax.stop_gradient(jax.scipy.linalg.lu_factor(
            jac_y(t, y, yp) + jac_yp(t, y, yp) / c))

    c0 = h0 / alpha[1]
    lu0 = build_M(t0, y0, ydot0, c0)
    buf0 = jnp.zeros((1, 1), dtype)
    buf_t0 = jnp.full((1,), t0, dtype)
    st0 = _S(t0, h0, jnp.asarray(1, jnp.int32), D0,
             jnp.asarray(0, jnp.int32), jnp.zeros((n, n), dtype), lu0, c0,
             jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
             jnp.asarray(1, jnp.int32), jnp.asarray(False),
             buf0, buf_t0, jnp.asarray(1, jnp.int32))

    def newton(t_new, y_pred, c, psi, scale, lu):
        def body(carry):
            d, y, dwn_old, it, conv, div, nf = carry
            yp = (psi + d) / c
            res = F(t_new, y, yp)
            dw = -jax.scipy.linalg.lu_solve(lu, res)
            dwn = jnp.sqrt(jnp.mean((dw / scale) ** 2))
            rate = dwn / jnp.maximum(dwn_old, 1e-300)
            safe_rate = jnp.minimum(rate, 0.999)
            diverged = (it > 0) & (rate >= 1.0)
            d = d + dw
            y = y_pred + d
            conv_now = jnp.where(
                it > 0, safe_rate / (1.0 - safe_rate) * dwn < 1e-3,
                dwn < 1e-12)
            return (d, y, dwn, it + 1, conv | conv_now, div | diverged,
                    nf + 1)

        def cnd(carry):
            _, _, _, it, conv, div, _ = carry
            return (it < NEWTON_MAXITER) & (~conv) & (~div)

        init = (jnp.zeros_like(y_pred), y_pred, jnp.asarray(0.0, dtype),
                jnp.asarray(0, jnp.int32), jnp.asarray(False),
                jnp.asarray(False), jnp.asarray(0, jnp.int32))
        d, y, _, _, conv, div, nf = jax.lax.while_loop(cnd, body, init)
        return d, conv & (~div), nf

    def cond(st):
        return (st.t < t1) & (~st.fail)

    def body(st):
        h = jnp.minimum(st.h, t1 - st.t)
        D = jax.lax.cond(h < st.h,
                         lambda: _rescale_D(st.D, st.order, h / st.h),
                         lambda: st.D)
        order = st.order
        c = h / alpha[order]
        t_new = st.t + h
        idx = jnp.arange(MAX_ORDER + 3)
        y_pred = jnp.sum(jnp.where((idx <= order)[:, None], D, 0.0), axis=0)
        scale = atol + rtol * jnp.abs(y_pred)
        g = gamma[jnp.clip(idx, 0, MAX_ORDER + 1)][:, None]
        psi = jnp.sum(jnp.where(((idx >= 1) & (idx <= order))[:, None],
                                D * g, 0.0), axis=0) / alpha[order]
        yp_pred = (psi) / c
        # refresh the iteration matrix when c changed (cj dependence is
        # structural for DAEs, unlike the ODE (I - cJ) shift)
        lu = jax.lax.cond(
            c != st.c_lu,
            lambda: build_M(t_new, y_pred, yp_pred, c),
            lambda: st.lu)
        d, conv, nf1 = newton(t_new, y_pred, c, psi, scale, lu)

        def retry():
            lun = build_M(t_new, y_pred, yp_pred, c)
            d2, conv2, nf2 = newton(t_new, y_pred, c, psi, scale, lun)
            return lun, d2, conv2, nf2, jnp.asarray(1, jnp.int32)

        lu, d, conv, nf2, jev = jax.lax.cond(
            conv,
            lambda: (lu, d, conv, jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32)),
            retry)

        err = error_const[order] * d
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
        accept = conv & (err_norm <= 1.0)

        def accepted():
            Da = D.at[order + 2].set(d - D[order + 1]).at[order + 1].set(d)

            def casc(i, Dx):
                k = order - i
                return Dx.at[k].add(Dx[k + 1])

            Da = jax.lax.fori_loop(0, order + 1, casc, Da)
            n_eq = st.n_eq_steps + 1

            def adapt(Dx):
                em = jnp.where(
                    order > 1,
                    error_const[order - 1]
                    * jnp.sqrt(jnp.mean((Dx[order] / scale) ** 2)), jnp.inf)
                ep = jnp.where(
                    order < MAX_ORDER,
                    error_const[jnp.minimum(order + 1, MAX_ORDER + 1)]
                    * jnp.sqrt(jnp.mean((Dx[order + 2] / scale) ** 2)),
                    jnp.inf)
                errs = jnp.stack([em, jnp.maximum(err_norm, 1e-300), ep])
                powers = 1.0 / (order + jnp.arange(3, dtype=dtype))
                factors = jnp.power(jnp.maximum(errs, 1e-300), -powers)
                best = jnp.argmax(factors)
                new_order = jnp.clip(order + best - 1, 1,
                                     MAX_ORDER).astype(jnp.int32)
                fac = jnp.clip(0.9 * factors[best], MIN_FACTOR, MAX_FACTOR)
                return new_order, fac, _rescale_D(Dx, new_order, fac), \
                    jnp.asarray(0, jnp.int32)

            def keep(Dx):
                return order, jnp.asarray(1.0, dtype), Dx, n_eq

            new_order, fac, Da2, n_eq2 = jax.lax.cond(
                n_eq >= order + 1, adapt, keep, Da)
            return t_new, h * fac, new_order, Da2, n_eq2

        def rejected():
            factor_rej = jnp.clip(
                0.9 * err_norm ** (-1.0 / (order + 1)), MIN_FACTOR, 1.0)
            factor_rej = jnp.where(conv, factor_rej, 0.5)
            Dr = _rescale_D(D, order, factor_rej)
            return st.t, h * factor_rej, order, Dr, jnp.asarray(0, jnp.int32)

        t_nxt, h_nxt, ord_nxt, D_nxt, neq_nxt = jax.lax.cond(
            accept, accepted, rejected)
        fail = (h_nxt <= jnp.abs(t1 - t0) * 1e-14) | \
               (st.steps + 1 >= max_steps)
        return _S(t_nxt, h_nxt, ord_nxt, D_nxt, neq_nxt, st.J, lu, c,
                  st.steps + 1, st.n_fev + nf1 + nf2 + 1,
                  st.n_jev + jev, fail, st.buf, st.buf_t, st.rec)

    out = jax.lax.while_loop(cond, body, st0)
    return BDFResult(out.D[0], out.t, out.steps, out.n_fev, out.n_jev,
                     (~out.fail) | (out.t >= t1), None, None)
