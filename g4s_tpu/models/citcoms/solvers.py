"""Stokes solvers: Jacobi-preconditioned CG (inner velocity solve) and the
Uzawa pressure-correction CG (outer saddle-point loop).

Algorithms follow the reference exactly, re-expressed as lax.while_loop so
the whole solve is one XLA computation:
  - conj_grad:      citcoms/lib/General_matrix_functions.c:307-433
  - Uzawa CG:       citcoms/lib/Stokes_flow_Incomp.c:188-451
  - initial_vel_residual: Stokes_flow_Incomp.c:53-143 (F - grad P - K V)
Convergence monitors (volume-weighted norms) follow
Global_operations.c:496-607 (global_v_norm2 / p_norm2 / div_norm2).

The solvers are written against an abstract `StokesProblem` bundle of
operator closures, so the SAME code drives the single-chip path (local
assembly) and the multi-chip path (assembly + additive halo exchange inside
shard_map, ownership-weighted psum dots — the exchange_id_d/global_vdot
split of the reference, Regional_parallel_related.c:744 +
Global_operations.c:496).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from g4s_tpu.models.citcoms.assembly import (
    StokesOperators, assemble_del2_u, assemble_div_u, assemble_grad_p,
    strip_bcs,
)


class StokesProblem(NamedTuple):
    """Operator closures for one Stokes solve (all jit-traceable)."""

    A: Callable            # u (nno,3) -> K u, stripped (+ halo in SPMD)
    grad_p: Callable       # p (nel,)  -> G p, stripped (+ halo)
    div: Callable          # u -> G^T u (nel,)
    dot_v: Callable        # <a, b> over velocity dofs (global in SPMD)
    dot_p: Callable        # <a, b> over pressure dofs
    BI: jax.Array          # (nno, 3) 1/diag(K)
    BPI: jax.Array         # (nel,)
    strip: Callable        # u -> u with prescribed dofs zeroed
    v_norm2: Callable      # volume-weighted mean-square of velocity
    p_norm2: Callable
    div_norm2: Callable


def local_problem(ops: StokesOperators, nmass, e_area,
                  total_volume) -> StokesProblem:
    """Single-device problem from assembled operators."""
    return StokesProblem(
        A=lambda u: assemble_del2_u(ops, u, strip=True),
        grad_p=lambda p: assemble_grad_p(ops, p, strip=True),
        div=lambda u: assemble_div_u(ops, u),
        dot_v=lambda a, b: jnp.vdot(a, b),
        dot_p=lambda a, b: jnp.vdot(a, b),
        BI=ops.BI, BPI=ops.BPI,
        strip=lambda u: strip_bcs(u, ops.vbc_mask),
        v_norm2=lambda v: jnp.sum(v * v * nmass[:, None]) / total_volume,
        p_norm2=lambda p: jnp.sum(p * p * e_area) / total_volume,
        div_norm2=lambda p: jnp.sum(p * p / e_area) / total_volume,
    )


class CGResult(NamedTuple):
    x: jax.Array
    residual: jax.Array
    iterations: jax.Array


def conj_grad(prob: StokesProblem, F, acc, max_iter: int) -> CGResult:
    """Solve K d = F with diag-preconditioned CG (conj_grad:307-433)."""
    d0 = jnp.zeros_like(F)
    r1 = F
    res0 = jnp.sqrt(prob.dot_v(r1, r1))

    def cond(state):
        d, r, p, dotr0z0, res, count = state
        return jnp.logical_or(
            jnp.logical_and(res > acc, count < max_iter), count == 0)

    def body(state):
        d, r, p1, dotr0z0, res, count = state
        z1 = prob.BI * r
        dotr1z1 = prob.dot_v(r, z1)
        beta = jnp.where(count == 0, 0.0,
                         dotr1z1 / jnp.where(dotr0z0 == 0, 1.0, dotr0z0))
        p2 = z1 + beta * p1
        Ap = prob.A(p2)
        dotprod = prob.dot_v(p2, Ap)
        alpha = jnp.where(dotprod == 0.0, 1.0e-3,
                          dotr1z1 / jnp.where(dotprod == 0, 1.0, dotprod))
        d = d + alpha * p2
        r = r - alpha * Ap
        res = jnp.sqrt(prob.dot_v(r, r))
        return (d, r, p2, dotr1z1, res, count + 1)

    init = (d0, r1, jnp.zeros_like(F), jnp.asarray(1.0, F.dtype), res0,
            jnp.asarray(0, jnp.int32))
    d, r, _, _, res, count = lax.while_loop(cond, body, init)
    return CGResult(prob.strip(d), res, count)


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class UzawaMonitor:
    v_norm: jax.Array
    p_norm: jax.Array
    dvelocity: jax.Array
    dpressure: jax.Array
    incompressibility: jax.Array
    outer_iterations: jax.Array
    inner_iterations: jax.Array   # total inner CG iterations


class UzawaParams(NamedTuple):
    accuracy: float
    inner_accuracy_scale: float
    max_outer: int            # p_iterations (Instructions.c:676 default 100)
    max_inner: int            # vlowstep (default 250)
    check_pressure_convergence: bool


def uzawa_cg(prob: StokesProblem, V, P, F, fdotf, params: UzawaParams,
             inner_solve=None):
    """Uzawa pressure CG (solve_Ahat_p_fhat_CG).

    V: (nno,3) initial velocity (BC values imposed); P: (nel,) pressure;
    F: (nno,3) momentum RHS (stripped); fdotf: ||F||.
    `inner_solve(F, acc) -> CGResult` overrides the inner velocity solver
    (the solve_del2_u dispatch: CG by default, multigrid when
    Solver=multigrid, General_matrix_functions.c:91-120).
    Returns (V, P, UzawaMonitor).
    """
    imp = params.accuracy
    inner_imp = imp * params.inner_accuracy_scale
    inner_acc = inner_imp * fdotf
    if inner_solve is None:
        inner_solve = lambda F_, acc_: conj_grad(prob, F_, acc_,
                                                 params.max_inner)

    # --- initial velocity residual: solve K u1 = F - G P - K V ---
    F1 = prob.strip(F - prob.grad_p(P) - prob.A(V))
    cg0 = inner_solve(F1, inner_acc)
    V = V + cg0.x

    r1 = prob.div(V)
    vdotv = prob.v_norm2(V)
    incomp0 = jnp.sqrt(prob.div_norm2(r1) / (1e-32 + vdotv))

    def cond(state):
        V, P, r1, s1, r0dotz0, count, converging, mon_inner, dv, dp, inc = state
        return jnp.logical_and(count < params.max_outer, converging < 2)

    def body(state):
        V, P, r1, s1, r0dotz0, count, converging, mon_inner, dv, dp, inc = state
        z1 = prob.BPI * r1
        r1dotz1 = prob.dot_p(r1, z1)
        delta = jnp.where(count == 0, 0.0,
                          r1dotz1 / jnp.where(r0dotz0 == 0, 1.0, r0dotz0))
        s2 = z1 + delta * s1
        F2 = prob.grad_p(s2)
        cg = inner_solve(F2, inner_acc)
        u1 = cg.x
        F3 = prob.div(u1)
        alpha = r1dotz1 / prob.dot_p(s2, F3)
        r2 = r1 - alpha * F3
        P = P + alpha * s2
        V = V - alpha * u1

        vdotv = prob.v_norm2(V)
        pdotp = prob.p_norm2(P)
        dvel = alpha * jnp.sqrt(prob.v_norm2(u1) / (1e-32 + vdotv))
        dpre = alpha * jnp.sqrt(prob.p_norm2(s2) / (1e-32 + pdotp))
        div = prob.div(V)
        inc = jnp.sqrt(prob.div_norm2(div) / (1e-32 + vdotv))

        if params.check_pressure_convergence:
            conv_now = jnp.logical_and(dvel < imp, dpre < imp)
        else:
            conv_now = dvel < imp
        converging = jnp.where(conv_now, converging + 1, 0)
        return (V, P, r2, s2, r1dotz1, count + 1, converging,
                mon_inner + cg.iterations, dvel, dpre, inc)

    init = (V, P, r1, jnp.zeros_like(r1), jnp.asarray(1.0, F.dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            cg0.iterations, jnp.asarray(1.0, F.dtype),
            jnp.asarray(1.0, F.dtype), incomp0)
    (V, P, r1, _, _, count, _, inner_total, dv, dp, inc) = lax.while_loop(
        cond, body, init)

    mon = UzawaMonitor(jnp.sqrt(prob.v_norm2(V)), jnp.sqrt(prob.p_norm2(P)),
                       dv, dp, inc, count, inner_total)
    return V, P, mon


def uzawa_bicgstab(prob: StokesProblem, V, P, F, fdotf,
                   params: UzawaParams):
    """BiCGstab pressure solver (the reference's compressible-capable
    variant, solve_Ahat_p_fhat_BiCG, Stokes_flow_Incomp.c:453+).

    Solves the pressure Schur system S p = div(K^-1 F) with
    S p = div(K^-1 G p); every operator application is one inner CG
    velocity solve. Preconditioner: BPI (same as the CG path).
    Returns (V, P, UzawaMonitor).
    """
    imp = params.accuracy
    inner_acc = imp * params.inner_accuracy_scale * fdotf

    def schur(p, inner_count):
        cg = conj_grad(prob, prob.grad_p(p), inner_acc, params.max_inner)
        return prob.div(cg.x), cg.x, inner_count + cg.iterations

    # initial velocity: K u = F - G P - K V
    F1 = prob.strip(F - prob.grad_p(P) - prob.A(V))
    cg0 = conj_grad(prob, F1, inner_acc, params.max_inner)
    V = V + cg0.x
    r0 = prob.div(V)

    def cond(st):
        (P, V, r, rhat, p_dir, v_dir, rho, alpha, omega, it, inner, done,
         dvel, dpre) = st
        return jnp.logical_and(it < params.max_outer, ~done)

    def body(st):
        (P, V, r, rhat, p_dir, v_dir, rho, alpha, omega, it, inner, done,
         dvel, dpre) = st
        rho_new = prob.dot_p(rhat, r)
        beta = jnp.where(it == 0, 0.0,
                         (rho_new / jnp.where(rho == 0, 1.0, rho))
                         * (alpha / jnp.where(omega == 0, 1.0, omega)))
        p_dir = r + beta * (p_dir - omega * v_dir)
        z = prob.BPI * p_dir
        v_new, u_v, inner = schur(z, inner)
        alpha_new = rho_new / jnp.where(prob.dot_p(rhat, v_new) == 0, 1.0,
                                        prob.dot_p(rhat, v_new))
        s = r - alpha_new * v_new
        zs = prob.BPI * s
        t, u_t, inner = schur(zs, inner)
        tt = prob.dot_p(t, t)
        omega_new = jnp.where(tt == 0, 0.0, prob.dot_p(t, s) / tt)
        dP = alpha_new * z + omega_new * zs
        dV = alpha_new * u_v + omega_new * u_t
        P = P + dP
        V = V - dV
        r_new = s - omega_new * t
        # honest convergence monitors (the reference's dvelocity/dpressure,
        # Stokes_flow_Incomp.c:497-520)
        dvel = jnp.sqrt(prob.v_norm2(dV) / (1e-32 + prob.v_norm2(V)))
        dpre = jnp.sqrt(prob.p_norm2(dP) / (1e-32 + prob.p_norm2(P)))
        res = jnp.sqrt(prob.div_norm2(r_new)
                       / (1e-32 + prob.v_norm2(V)))
        done = res < imp
        return (P, V, r_new, rhat, p_dir, v_new, rho_new, alpha_new,
                omega_new, it + 1, inner, done, dvel, dpre)

    zero_p = jnp.zeros_like(r0)
    st0 = (P, V, r0, r0, zero_p, zero_p, jnp.asarray(1.0, F.dtype),
           jnp.asarray(1.0, F.dtype), jnp.asarray(1.0, F.dtype),
           jnp.asarray(0, jnp.int32), cg0.iterations, jnp.asarray(False),
           jnp.asarray(1.0, F.dtype), jnp.asarray(1.0, F.dtype))
    (P, V, r, _, _, _, _, _, _, it, inner, done, dvel, dpre) = \
        lax.while_loop(cond, body, st0)
    div = prob.div(V)
    inc = jnp.sqrt(prob.div_norm2(div) / (1e-32 + prob.v_norm2(V)))
    mon = UzawaMonitor(jnp.sqrt(prob.v_norm2(V)), jnp.sqrt(prob.p_norm2(P)),
                       dvel, dpre, inc, it, inner)
    return V, P, mon
