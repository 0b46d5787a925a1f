"""Mixture-averaged transport properties.

Capability match for cantera/src/transport (MixTransport): species
viscosity / thermal conductivity from Chapman-Enskog theory with
Lennard-Jones collision integrals, Wilke mixture rule for viscosity,
and mixture-averaged binary diffusion coefficients. Transport data comes
from the mechanism YAML `transport:` blocks (geometry, well-depth [K],
diameter [A], dipole, polarizability, rotational-relaxation).

Collision integrals use the Neufeld et al. (1972) analytic fits — the
same fits Cantera's MMCollisionInt tabulates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.cantera.mech import Mechanism, R_GAS

KB = 1.380649e-23       # J/K
AVOGADRO = 6.02214076e23


class TransportData(NamedTuple):
    geometry: np.ndarray       # 0=atom, 1=linear, 2=nonlinear
    well_depth: np.ndarray     # K
    diameter: np.ndarray       # m
    dipole: np.ndarray         # Debye
    polarizability: np.ndarray  # A^3
    rot_relax: np.ndarray


def load_transport(path, mech: Mechanism) -> TransportData:
    from g4s_tpu.models.cantera.mech import _yaml_load
    doc = _yaml_load(path)
    by_name = {s["name"]: s for s in doc["species"]}
    n = mech.nspec
    geom = np.zeros(n)
    eps = np.full(n, 100.0)
    sig = np.full(n, 3.0e-10)
    dip = np.zeros(n)
    pol = np.zeros(n)
    rot = np.ones(n)
    gmap = {"atom": 0, "linear": 1, "nonlinear": 2}
    for name, i in ((s, mech.species_index(s)) for s in mech.species_names):
        tr = by_name.get(name, {}).get("transport")
        if not tr:
            continue
        geom[i] = gmap.get(tr.get("geometry", "linear"), 1)
        eps[i] = float(tr.get("well-depth", 100.0))
        sig[i] = float(tr.get("diameter", 3.0)) * 1e-10
        dip[i] = float(tr.get("dipole", 0.0))
        pol[i] = float(tr.get("polarizability", 0.0))
        rot[i] = float(tr.get("rotational-relaxation", 1.0))
    return TransportData(geom, eps, sig, dip, pol, rot)


def _omega22(t_star):
    """Neufeld fit for the (2,2) reduced collision integral."""
    return (1.16145 * t_star ** -0.14874 + 0.52487 * jnp.exp(-0.7732 * t_star)
            + 2.16178 * jnp.exp(-2.43787 * t_star))


def _omega11(t_star):
    """Neufeld fit for the (1,1) reduced collision integral."""
    return (1.06036 * t_star ** -0.15610 + 0.19300 * jnp.exp(-0.47635 * t_star)
            + 1.03587 * jnp.exp(-1.52996 * t_star)
            + 1.76474 * jnp.exp(-3.89411 * t_star))


def species_viscosities(mech: Mechanism, tr: TransportData, T):
    """mu_k = 5/16 sqrt(pi m k T) / (pi sigma^2 Omega22)  [Pa s]."""
    m = jnp.asarray(mech.mol_weights) / AVOGADRO
    eps = jnp.asarray(tr.well_depth)
    sig = jnp.asarray(tr.diameter)
    om22 = _omega22(T / eps)
    return (5.0 / 16.0) * jnp.sqrt(np.pi * m * KB * T) \
        / (np.pi * sig ** 2 * om22)


def mixture_viscosity(mech: Mechanism, tr: TransportData, T, x):
    """Wilke mixing rule (MixTransport::viscosity)."""
    mu = species_viscosities(mech, tr, T)
    W = jnp.asarray(mech.mol_weights)
    ratio_mu = mu[:, None] / mu[None, :]
    ratio_w = W[None, :] / W[:, None]
    phi = (1.0 + jnp.sqrt(ratio_mu) * ratio_w ** 0.25) ** 2 \
        / jnp.sqrt(8.0 * (1.0 + 1.0 / ratio_w))
    denom = phi @ x
    return jnp.sum(x * mu / denom)


def binary_diffusion(mech: Mechanism, tr: TransportData, T, P):
    """D_jk matrix (m^2/s) from Chapman-Enskog."""
    m = jnp.asarray(mech.mol_weights) / AVOGADRO
    mu_jk = m[:, None] * m[None, :] / (m[:, None] + m[None, :])
    eps = jnp.sqrt(jnp.asarray(tr.well_depth)[:, None]
                   * jnp.asarray(tr.well_depth)[None, :])
    sig = 0.5 * (jnp.asarray(tr.diameter)[:, None]
                 + jnp.asarray(tr.diameter)[None, :])
    om11 = _omega11(T / eps)
    return (3.0 / 16.0) * jnp.sqrt(2.0 * np.pi * (KB * T) ** 3 / mu_jk) \
        / (np.pi * sig ** 2 * om11 * P)


def mixture_diffusion_coeffs(mech: Mechanism, tr: TransportData, T, P, x):
    """Mixture-averaged D_km (MixTransport::getMixDiffCoeffs)."""
    D = binary_diffusion(mech, tr, T, P)
    x = jnp.maximum(x, 1e-30)
    W = jnp.asarray(mech.mol_weights)
    Wmix = jnp.sum(x * W)
    sum_term = jnp.sum(jnp.where(jnp.eye(mech.nspec, dtype=bool),
                                 0.0, x[None, :] / D), axis=1)
    return (1.0 - x * W / Wmix) / jnp.maximum(sum_term, 1e-30)


def thermal_conductivity(mech: Mechanism, tr: TransportData, T, x, cp_R):
    """Mixture thermal conductivity, modified Eucken per species +
    (sum x_k lam_k + 1/sum(x_k/lam_k))/2 combining rule
    (MixTransport::thermalConductivity)."""
    mu = species_viscosities(mech, tr, T)
    W = jnp.asarray(mech.mol_weights)
    cv_R = cp_R - 1.0
    geom = jnp.asarray(tr.geometry)
    cv_trans = 1.5
    cv_rot = jnp.where(geom == 0, 0.0, jnp.where(geom == 1, 1.0, 1.5))
    cv_vib = jnp.maximum(cv_R - cv_trans - cv_rot, 0.0)
    f_trans = 5.0 / 2.0
    f_rot = 1.0
    f_vib = 1.0
    lam_k = mu * R_GAS / W * (f_trans * cv_trans + f_rot * cv_rot
                              + f_vib * cv_vib)
    lam_mix = 0.5 * (jnp.sum(x * lam_k)
                     + 1.0 / jnp.sum(x / jnp.maximum(lam_k, 1e-30)))
    return lam_mix


def stefan_maxwell_velocities(mech: Mechanism, tr: TransportData, T, P,
                              x, grad_x):
    """Exact multicomponent diffusion velocities (the MultiTransport
    role, src/transport/MultiTransport.cpp): solve the Stefan-Maxwell
    system

        grad X_i = sum_{j != i} X_i X_j / D_ij (V_j - V_i),
        sum_k Y_k V_k = 0   (mass-flux closure, replacing one row)

    for the species diffusion velocities V_k [m/s]. Reduces exactly to
    Fick's law with the binary D for a two-species mixture; the
    mixture-averaged formula (mixture_diffusion_coeffs) is its dilute
    approximation. Thermal diffusion (Soret) lives in
    `multi_transport.py` (the Dixon-Lewis L-matrix tier).
    """
    K = mech.nspec
    D = binary_diffusion(mech, tr, T, P)
    x = jnp.maximum(x, 1e-16)
    x = x / jnp.sum(x)
    W = jnp.asarray(mech.mol_weights)
    Y = x * W / jnp.sum(x * W)
    G = jnp.where(jnp.eye(K, dtype=bool), 0.0,
                  x[:, None] * x[None, :] / D)         # (K, K)
    # row i of A: sum_j G_ij V_j - (sum_j G_ij) V_i = grad X_i
    A = G - jnp.diag(jnp.sum(G, axis=1))
    b = grad_x
    # replace the last row by the closure sum Y_k V_k = 0 (the system is
    # singular: rows sum to zero, like the reference's L-matrix)
    A = A.at[-1, :].set(Y)
    b = b.at[-1].set(0.0)
    return jnp.linalg.solve(A, b)


def multi_diff_coeffs(mech: Mechanism, tr: TransportData, T, P, x):
    """Multicomponent diffusion coefficient matrix D_km such that the
    species flux is j_k = rho Y_k V_k with V from unit composition
    gradients (getMultiDiffCoeffs role): column m holds the velocities
    response to grad X_m = e_m - X (projected to sum-zero)."""
    K = mech.nspec
    eye = jnp.eye(K)
    basis = eye - x[None, :]                    # sum-zero gradient probes
    V = jax.vmap(lambda g: stefan_maxwell_velocities(
        mech, tr, T, P, x, g))(basis)           # (K probes, K species)
    return V.T                                  # response matrix
