"""Temperature-dependent viscosity assembly for the df64 (1e-10) tier.

Extends the df64 Cookbook2 envelope (df64_step.py, constant viscosity) to
the TDEPV rheologies of Cookbook3/4/7 (rheol=4) and Cookbook8 (rheol=1):
per step, viscosity at the Gauss points is evaluated in double-word f32
(visc_from_T, Viscosity_structures.c:390-540 laws 0-4), the element
stiffness is re-contracted against precomputed geometry blocks, and the
27-point nodal stencil plus its Jacobi/pressure preconditioners are
re-assembled on device in error-free df64 arithmetic — the role
construct_stiffness_B_matrix (Construct_arrays.c:740) plays after every
viscosity update in the reference.

The trick that keeps this XLA-friendly: elt_k is LINEAR in the per-Gauss
viscosity,

  elt_k[e] = sum_g eta[e,g] * M[e,g],   M[e,g] = w_g |J|_eg B^T D B|_eg,

so the geometry blocks M are computed ONCE in true f64 on the CPU model
(constant across steps) and the per-step device work is an 8-term df64
contraction plus one additive scatter — no 48-term strain einsum in df64
(which sends XLA compile time through the roof, see df64_step.py notes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops import df64 as df
from g4s_tpu.models.citcoms.df64_step import (PaddedScatter, _take,
                                              _tree_sum, _where, split64)


class TDepDF(NamedTuple):
    """Static (step-invariant) data for df64 T-dependent re-assembly."""

    M_p: df.DF            # (nel, 8g, 64ab, 3, 3) geometry blocks, pairs
    scat: PaddedScatter   # (nel*64ab,) -> (nno*27,) additive map
    N_p: df.DF            # (8a, 8g) shape functions at vpts
    n0_p: df.DF           # (nel,) per-element material prefactor
    eE_p: df.DF           # (nel,) viscE
    tT_p: df.DF           # (nel,) viscT
    zZ_p: df.DF           # (nel,) viscZ
    rheol: int
    vmin: float | None
    vmax: float | None
    grid: tuple           # (noy, nox, noz)
    tdepv: bool = True
    # strain-rate dependence (SDEPV power law + PDEPV plasticity)
    B_p: df.DF | None = None       # (nel, 8g, 6s, 8a, 3i) pairs
    sdepv_c_p: df.DF | None = None  # (nel,) (n-1)/n exponents, pairs
    pdepv: tuple | None = None     # (a_p, b_p, y_p, rg_p, eff: bool)
    cdepv_ln_ff: tuple | None = None  # (ln ff0, ln ff1) df scalars


def build_tdep(model) -> TDepDF:
    """Precompute the f64 geometry blocks + scatter map from a CPU-f64
    CitcomModel (get_elt_k per-Gauss factorization,
    Element_calculations.c:282-419 with eta held out)."""
    from g4s_tpu.models.citcoms.nodal import _LOCAL
    cfg = model.cfg
    m = model.mesh
    B = np.asarray(model.B, np.float64)            # (nel, 8g, 6s, 8a, 3i)
    gda = np.asarray(model.gda, np.float64)        # (nel, 8g)
    gw = np.asarray(model.gweight, np.float64)     # (8g,)
    W = gw[None, :] * gda                          # (nel, 8g)
    # M[e,g,a,i,b,j] = W[e,g] * sum_s,t B[e,g,s,a,i] D[s,t] B[e,g,t,b,j]
    # — elt_k is linear in eta for the full 6x6 constitutive family too
    # (build_elt_k_aniso), so anisotropic viscosity reuses the same
    # per-Gauss geometry-block precompute with D_aniso folded in
    if cfg.ANIVISC and cfg.ani_vis2_factor != 0.0:
        from g4s_tpu.models.citcoms.anisotropic import (
            constitutive_orthotropic, constitutive_ti)
        n_dir = np.array([0.0, 0.0, 1.0])
        if cfg.anivisc_mode == "ti":
            D66 = np.asarray(constitutive_ti(cfg.ani_vis2_factor,
                                             cfg.anivisc_gamma, n_dir),
                             np.float64)
        else:
            D66 = np.asarray(constitutive_orthotropic(
                cfg.ani_vis2_factor, n_dir), np.float64)
        BD = np.einsum("st,egtai->egsai", D66, B, optimize=True)
    else:
        D = np.array([2.0, 2.0, 2.0, 1.0, 1.0, 1.0])
        BD = B * D[None, None, :, None, None]
    M = np.einsum("egsai,egsbj->egaibj", BD, B, optimize=True) \
        * W[:, :, None, None, None, None]
    nel = B.shape[0]
    M = M.reshape(nel, 8, 8, 3, 8, 3).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(nel, 8, 64, 3, 3)                 # ab-major blocks

    # scatter targets: node(e,a)*27 + slot(a,b), identical to
    # StencilPlan.build (nodal.py) but kept ab-major to match M
    noy, nox, noz = cfg.nodey, cfg.nodex, cfg.nodez
    ey, ex, ez = noy - 1, nox - 1, noz - 1
    iy, ix, iz = np.meshgrid(np.arange(ey), np.arange(ex), np.arange(ez),
                             indexing="ij")
    origin = np.stack([iy.ravel(), ix.ravel(), iz.ravel()], 1)
    targets = np.empty((nel, 64), np.int64)
    for a in range(8):
        na = origin + _LOCAL[a]
        node_flat = (na[:, 0] * nox + na[:, 1]) * noz + na[:, 2]
        for b in range(8):
            d = _LOCAL[b] - _LOCAL[a]
            slot = (d[0] + 1) * 9 + (d[1] + 1) * 3 + (d[2] + 1)
            targets[:, a * 8 + b] = node_flat * 27 + slot
    scat = PaddedScatter.build(targets.reshape(-1), noy * nox * noz * 27)

    mat = np.asarray(model.mat)
    # clamp like jnp's out-of-bounds gather: material vectors may be
    # shorter than num_mat when built directly (the config reader pads)
    pick = lambda v: np.asarray(v, np.float64)[
        np.minimum(mat, len(np.atleast_1d(v)) - 1)]
    B_p = sdepv_c_p = pdepv = None
    if cfg.SDEPV or cfg.PDEPV:
        B_p = split64(B)
    if cfg.SDEPV:
        n = pick(cfg.sdepv_expt)
        sdepv_c_p = split64((n - 1.0) / n)
    if cfg.PDEPV:
        # depth at the Gauss points is static geometry
        r_nodes = np.asarray(model.mesh.sx[:, 2], np.float64)
        Nm = np.asarray(model.N, np.float64)
        r_g = np.take(r_nodes, np.asarray(m.ien), axis=0) @ Nm  # (nel, 8g)
        pdepv = (split64(pick(cfg.pdepv_a)), split64(pick(cfg.pdepv_b)),
                 split64(pick(cfg.pdepv_y)),
                 split64(np.float64(cfg.radius_outer) - r_g),
                 bool(cfg.pdepv_eff))
    cdepv_ln_ff = None
    if getattr(cfg, "CDEPV", False):
        ff = [np.float64(x) for x in cfg.cdepv_ff[:2]]
        cdepv_ln_ff = (split64(np.log(ff[0])), split64(np.log(ff[1])))
    return TDepDF(
        split64(M), scat, split64(np.asarray(model.N, np.float64)),
        split64(pick(cfg.visc0)), split64(pick(cfg.viscE)),
        split64(pick(cfg.viscT)), split64(pick(cfg.viscZ)),
        int(cfg.rheol),
        float(cfg.visc_min) if cfg.VMIN else None,
        float(cfg.visc_max) if cfg.VMAX else None,
        (noy, nox, noz),
        bool(cfg.TDEPV and any(e != 0.0 for e in cfg.viscE)),
        B_p, sdepv_c_p, pdepv, cdepv_ln_ff)


def strain_rate_df(td: TDepDF, V_p: df.DF, ien) -> df.DF:
    """sqrt of the gauss-averaged strain-rate second invariant per
    element, (nel,) pairs (strain_rate_2inv in df64)."""
    u_el = _take(V_p, ien, axis=0)                        # (nel, 8a, 3)
    Bh, Bl = td.B_p                                       # (nel,8g,6,8a,3)
    t = df.mul((Bh, Bl), (u_el[0][:, None, None], u_el[1][:, None, None]))
    nel = Bh.shape[0]
    eps = _tree_sum((t[0].reshape(nel, 8, 6, 24),
                     t[1].reshape(nel, 8, 6, 24)), axis=3)  # (nel, 8g, 6)
    sq = df.mul(eps, eps)
    en = _tree_sum((sq[0][..., 0:3], sq[1][..., 0:3]), axis=2)  # normal
    es = _tree_sum((sq[0][..., 3:6], sq[1][..., 3:6]), axis=2)
    ee = df.add(en, df.mul_f(es, np.float32(0.5)))        # (nel, 8g)
    val = df.mul_f(_tree_sum(ee, axis=1), np.float32(1.0 / 8.0))
    return df.sqrt(val)                                   # (nel,)


def evisc_df(td: TDepDF, T_p: df.DF, ien, srII_p: df.DF | None = None,
             C_p: df.DF | None = None) -> df.DF:
    """eta at (nel, 8g) in df64 (viscosity_at_vpts: TDEPV laws 0-4, then
    the SDEPV power law, the CDEPV geometric-mean compositional prefactor
    (visc_from_C, Viscosity_structures.c:1110-1155) and PDEPV yield
    plasticity, then VMIN/VMAX). C_p: nodal composition pairs."""
    T_el = _take(T_p, ien, axis=0)                        # (nel, 8a)
    T_el = _where(T_el[0] < 0.0, (jnp.zeros_like(T_el[0]),) * 2, T_el)
    T_el = _where(T_el[0] > 1.0,
                  (jnp.ones_like(T_el[0]), jnp.zeros_like(T_el[1])), T_el)
    t = df.mul((T_el[0][:, :, None], T_el[1][:, :, None]),
               (td.N_p[0][None], td.N_p[1][None]))        # (nel, 8a, 8g)
    T_g = _tree_sum(t, axis=1)                            # (nel, 8g)
    bc = lambda p: (jnp.broadcast_to(p[0][:, None], T_g[0].shape),
                    jnp.broadcast_to(p[1][:, None], T_g[0].shape))
    n0, eE, tT, zZ = bc(td.n0_p), bc(td.eE_p), bc(td.tT_p), bc(td.zZ_p)
    zero = (jnp.zeros_like(T_g[0]), jnp.zeros_like(T_g[1]))
    if td.rheol == 0:
        arg = df.mul(eE, df.sub((jnp.ones_like(T_g[0]),
                                 jnp.zeros_like(T_g[1])), T_g))
    elif td.rheol == 1:
        arg = _where(eE[0] == 0.0, zero,
                     df.div(eE, df.add(T_g, tT)))
    elif td.rheol == 2:
        arg = df.neg(df.mul(T_g, eE))
    elif td.rheol == 4:
        ez = df.add(eE, zZ)
        arg = _where(ez[0] == 0.0, zero,
                     df.sub(df.div(ez, df.add(T_g, tT)),
                            df.div(ez, df.add_f(tT, np.float32(1.0)))))
    else:   # rheol 3 (default)
        arg = _where(eE[0] == 0.0, zero,
                     df.sub(df.div(eE, df.add(T_g, tT)),
                            df.div(eE, df.add_f(tT, np.float32(1.0)))))
    if td.tdepv:
        eta = df.mul(n0, df.exp(arg))
    else:
        eta = n0
    if td.sdepv_c_p is not None and srII_p is not None:
        # eta *= (eta / max(srII, 1e-32))^((n-1)/n)
        sr = _where(srII_p[0] < 1e-32,
                    (jnp.full_like(srII_p[0], 1e-32),
                     jnp.zeros_like(srII_p[1])), srII_p)
        ratio = df.div(eta, (jnp.broadcast_to(sr[0][:, None], eta[0].shape),
                             jnp.broadcast_to(sr[1][:, None], eta[0].shape)))
        cb = (jnp.broadcast_to(td.sdepv_c_p[0][:, None], eta[0].shape),
              jnp.broadcast_to(td.sdepv_c_p[1][:, None], eta[0].shape))
        eta = df.mul(eta, df.pow_df(ratio, cb))
    if td.cdepv_ln_ff is not None and C_p is not None:
        # vmean = exp((1-C) ln ff0 + C ln ff1) at the vpts
        C_el = _take(C_p, ien, axis=0)                    # (nel, 8a)
        cg = df.mul((C_el[0][:, :, None], C_el[1][:, :, None]),
                    (td.N_p[0][None], td.N_p[1][None]))
        C_g = _tree_sum(cg, axis=1)                       # (nel, 8g)
        C_g = _where(C_g[0] < 0.0, (jnp.zeros_like(C_g[0]),) * 2, C_g)
        C_g = _where(C_g[0] > 1.0,
                     (jnp.ones_like(C_g[0]), jnp.zeros_like(C_g[1])), C_g)
        lf0, lf1 = td.cdepv_ln_ff
        b0 = (jnp.broadcast_to(lf0[0], C_g[0].shape),
              jnp.broadcast_to(lf0[1], C_g[0].shape))
        b1 = (jnp.broadcast_to(lf1[0], C_g[0].shape),
              jnp.broadcast_to(lf1[1], C_g[0].shape))
        arg_c = df.add(b0, df.mul(C_g, df.sub(b1, b0)))
        eta = df.mul(eta, df.exp(arg_c))
    if td.pdepv is not None and srII_p is not None:
        a_p, b_p, y_p, depth, eff = td.pdepv
        bcg = lambda p: (jnp.broadcast_to(p[0][:, None], eta[0].shape),
                         jnp.broadcast_to(p[1][:, None], eta[0].shape))
        a_b, b_b, y_b = bcg(a_p), bcg(b_p), bcg(y_p)
        # sigma_y = min(a + b*(radius_outer - r_g), y) at the vpts
        sy = df.add(a_b, df.mul(b_b, depth))
        sy = _where(sy[0] > y_b[0], y_b, sy)
        sr2 = df.mul_f(srII_p, np.float32(2.0))
        sr2 = _where(sr2[0] < 1e-32,
                     (jnp.full_like(sr2[0], 1e-32),
                      jnp.zeros_like(sr2[1])), sr2)
        eta_y = df.div(sy, (jnp.broadcast_to(sr2[0][:, None],
                                             eta[0].shape),
                            jnp.broadcast_to(sr2[1][:, None],
                                             eta[0].shape)))
        if eff:
            # harmonic mean as eta * (eta_y / (eta + eta_y)): the naive
            # eta*eta_y numerator overflows f32 when both factors are
            # huge (unyielded elements at near-zero strain rate)
            eta = df.mul(eta, df.div(eta_y, df.add(eta, eta_y)))
        else:
            eta = _where(eta[0] > eta_y[0], eta_y, eta)
    if td.vmin is not None:
        vp = df.from_f64(np.float64(td.vmin))
        vp = (jnp.broadcast_to(vp[0], eta[0].shape),
              jnp.broadcast_to(vp[1], eta[0].shape))
        eta = _where(eta[0] < vp[0], vp, eta)
    if td.vmax is not None:
        vp = df.from_f64(np.float64(td.vmax))
        vp = (jnp.broadcast_to(vp[0], eta[0].shape),
              jnp.broadcast_to(vp[1], eta[0].shape))
        eta = _where(eta[0] > vp[0], vp, eta)
    return eta


def stencil_df(td: TDepDF, eta_p: df.DF):
    """W (noy,nox,noz,27,3,3) pairs from per-Gauss viscosity: 8 df64
    multiply-adds against the geometry blocks, then one error-free
    additive scatter (build_stencil in df64)."""
    nel = eta_p[0].shape[0]
    acc = None
    for g in range(8):
        Mg = (td.M_p[0][:, g], td.M_p[1][:, g])           # (nel, 64, 3, 3)
        eg = (eta_p[0][:, g, None, None, None],
              eta_p[1][:, g, None, None, None])
        term = df.mul((jnp.broadcast_to(eg[0], Mg[0].shape),
                       jnp.broadcast_to(eg[1], Mg[0].shape)), Mg)
        acc = term if acc is None else df.add(acc, term)
    flat = (acc[0].reshape(nel * 64, 3, 3), acc[1].reshape(nel * 64, 3, 3))
    W = td.scat.apply(flat)                               # (nno*27, 3, 3)
    noy, nox, noz = td.grid
    return (W[0].reshape(noy, nox, noz, 27, 3, 3),
            W[1].reshape(noy, nox, noz, 27, 3, 3))


def bi_from_stencil_df(W_p: df.DF) -> df.DF:
    """Jacobi preconditioner 1/diag(K) from the stencil's center slot
    (build_diag_K role — slot 13 is offset (0,0,0), whose 3x3 block
    diagonal accumulates exactly the assembled diagonal)."""
    dh = jnp.diagonal(W_p[0][:, :, :, 13], axis1=-2, axis2=-1)
    dl = jnp.diagonal(W_p[1][:, :, :, 13], axis1=-2, axis2=-1)
    dh = dh.reshape(-1, 3)
    dl = dl.reshape(-1, 3)
    ones = (jnp.ones_like(dh), jnp.zeros_like(dl))
    inv = df.div(ones, _where(dh != 0.0, (dh, dl), ones))
    return _where(dh != 0.0, inv, ones)


def bpi_df(G_p: df.DF, BI_p: df.DF, ien, vbc_mask) -> df.DF:
    """Pressure preconditioner BPI[e] = 1/(G_e^T diag(K)^-1 G_e)
    (build_bpi / assemble_dAhatp_entry in df64)."""
    bi = (jnp.where(vbc_mask, 0.0, BI_p[0]),
          jnp.where(vbc_mask, 0.0, BI_p[1]))
    bi_el = _take(bi, ien, axis=0)                        # (nel, 8a, 3)
    g2 = df.mul(G_p, G_p)
    t = df.mul(g2, bi_el)
    bu = _tree_sum((t[0].reshape(t[0].shape[0], 24),
                    t[1].reshape(t[1].shape[0], 24)), axis=1)   # (nel,)
    ones = (jnp.ones_like(bu[0]), jnp.zeros_like(bu[1]))
    inv = df.div(ones, _where(bu[0] != 0.0, bu, ones))
    return _where(bu[0] != 0.0, inv, ones)
