"""Chemical equilibrium by Gibbs minimization.

Reference capability: cantera/src/equil (ChemEquil — element-potential
method; VCS multiphase). Used by Solution.equilibrate and the
set_equivalence_ratio setup paths.

Element-potential formulation (same as ChemEquil): at constant T, P the
equilibrium mole fractions satisfy

    x_k = exp( -g_k(T)/RT + sum_e A_ke lambda_e + ln(P0/P) * 0 ... )

with A the element-composition matrix and lambda the element potentials.
We solve for (lambda, log n_tot) with damped Newton on the element
conservation equations, all in f64 numpy (host-side setup path, like the
reference's use)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from g4s_tpu.models.cantera.mech import Mechanism, P_REF
from g4s_tpu.models.cantera.thermo import h0_RT, s0_R


def element_matrix(mech: Mechanism) -> Tuple[np.ndarray, list]:
    els = sorted({e for c in mech.compositions for e in c})
    A = np.zeros((mech.nspec, len(els)))
    for k, comp in enumerate(mech.compositions):
        for e, n in comp.items():
            A[k, els.index(e)] = n
    return A, els


def equilibrate_tp(mech: Mechanism, T: float, P: float, x0: np.ndarray,
                   *, max_iter: int = 200, tol: float = 1e-12
                   ) -> np.ndarray:
    """Equilibrium mole fractions at fixed (T, P) from initial composition
    x0 (which fixes the element abundances)."""
    import jax.numpy as jnp
    A, els = element_matrix(mech)
    ne = len(els)
    x0 = np.asarray(x0, np.float64)
    x0 = x0 / x0.sum()
    b = A.T @ x0                       # element moles per mole of mixture
    keep = b > 0
    A = A[:, keep]
    b = b[keep]
    ne = b.size

    # dimensionless standard chemical potential at (T, P): mu/RT
    g_RT = np.asarray(h0_RT(mech, jnp.asarray(float(T)))
                      - s0_R(mech, jnp.asarray(float(T))))
    g_RT = g_RT + np.log(P / P_REF)

    # exclude species containing elements absent from the mixture
    feasible = (np.asarray([sum(c.values()) for c in mech.compositions]) > 0)
    full_A, _ = element_matrix(mech)
    absent = full_A[:, ~keep].sum(axis=1) > 0
    feasible &= ~absent

    # Element-potential system (ChemEquil formulation):
    #   stationarity:  ln x_k = (A lam)_k - g_k(T,P)
    #   constraints :  N * A^T x = b   (ne eqs)   and   sum x = 1
    # unknowns: lam (ne) and ln N.
    lam = np.zeros(ne)
    lnN = 0.0

    def fractions(lam):
        expo = A @ lam - g_RT
        expo = np.where(feasible, np.clip(expo, -300, 300), -np.inf)
        return np.exp(expo)

    # initialize lambda from a least-squares fit through the initial comp
    mask = x0 > 1e-20
    if mask.sum() >= 1:
        rhs = g_RT[mask] + np.log(np.maximum(x0[mask], 1e-30))
        lam, *_ = np.linalg.lstsq(A[mask], rhs, rcond=None)

    for it in range(max_iter):
        x = fractions(lam)
        N = np.exp(lnN)
        Atx = A.T @ x
        res = np.concatenate([N * Atx - b, [x.sum() - 1.0]])
        if np.abs(res).max() < tol:
            break
        J = np.zeros((ne + 1, ne + 1))
        J[:ne, :ne] = N * (A.T @ (x[:, None] * A))
        J[:ne, ne] = N * Atx
        J[ne, :ne] = Atx
        try:
            step = np.linalg.solve(J + 1e-14 * np.eye(ne + 1), -res)
        except np.linalg.LinAlgError:
            step = np.linalg.lstsq(J, -res, rcond=None)[0]
        scale = min(1.0, 3.0 / (np.abs(step).max() + 1e-30))
        lam = lam + scale * step[:ne]
        lnN = lnN + scale * step[ne]
    x = fractions(lam)
    return x / x.sum()


def equilibrium_temperature_uv(reactor, y, *, tol=1e-10):
    """Adiabatic constant-UV equilibrium of a reactor state (the final
    state an ignition integrates to) — iterate (T from U conservation,
    composition from TP-equilibrium at the evolving T)."""
    import jax.numpy as jnp
    mech = reactor.mech
    T = float(y[0])
    conc = np.maximum(np.asarray(y[1:]), 0.0)
    U0 = float(reactor._U_vol(jnp.asarray(T), jnp.asarray(conc)))
    ctot = conc.sum()
    for _ in range(60):
        P = float(reactor.gas.pressure(jnp.asarray(T), jnp.asarray(conc)))
        x = equilibrate_tp(mech, T, P, conc / ctot)
        conc_eq = x * ctot
        # adjust T so U matches
        for _ in range(30):
            U = float(reactor._U_vol(jnp.asarray(T), jnp.asarray(conc_eq)))
            cv = float(reactor.gas.cv_mole(jnp.asarray(T),
                                           jnp.asarray(conc_eq))) * ctot
            dT = (U0 - U) / cv
            T += dT
            if abs(dT) < 1e-10 * T:
                break
        if np.abs(conc - conc_eq).max() < tol * ctot:
            conc = conc_eq
            break
        conc = conc_eq
    return T, conc
