"""Batched FE assembly and operator application (the Stokes hot path).

The reference applies the element stiffness through the G4S graph engine:
`e_assemble_del2_u` gathers per-element dofs, multiplies by the dense 24x24
elt_k blocks and scatter-adds (Element_calculations.c:475-509 via the
spmm_dense engine call at :500). On TPU this whole pattern is:

    u_el  = u[ien]                       (one XLA gather)
    Au_el = einsum('eab,eb->ea', K, u_el) (batched 24x24 matmuls -> MXU)
    Au    = segment_sum(Au_el)           (sorted scatter-add)

All functions are jit-safe; element tensors come from shapes.build_geometry.
elt_k itself is one einsum over the B tensors (get_elt_k:282-419 isotropic
branch: contraction weights diag(2,2,2,1,1,1)).
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops.segment import sorted_segment_sum


def _static():
    return field(metadata=dict(static=True))


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class ScatterPlan:
    """Host-precomputed sorted scatter-add plan: (nel*8) element-node slots
    -> nno nodes. Sorting once lets every assembly use the fast
    sorted-segment-sum path (the TPU analog of the reference's ordered
    node-assembly loops)."""

    order: jax.Array      # (nel*8,) permutation sorting slots by node id
    seg_ids: jax.Array    # (nel*8,) node id per sorted slot
    nno: int = _static()

    @staticmethod
    def build(ien: np.ndarray, nno: int) -> "ScatterPlan":
        flat = np.asarray(ien).ravel()
        order = np.argsort(flat, kind="stable").astype(np.int32)
        return ScatterPlan(jnp.asarray(order),
                           jnp.asarray(flat[order].astype(np.int32)), nno)

    def scatter(self, contrib):
        """contrib: (nel, 8, ...) -> (nno, ...) additive assembly."""
        flat = contrib.reshape((-1,) + contrib.shape[2:])
        return sorted_segment_sum(jnp.take(flat, self.order, axis=0),
                                  self.seg_ids, self.nno)


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class StokesOperators:
    """Device-resident FE tensors for one viscosity state."""

    ien: jax.Array        # (nel, 8)
    elt_k: jax.Array      # (nel, 24, 24)
    G: jax.Array          # (nel, 8, 3) element gradient operator
    vbc_mask: jax.Array   # (nno, 3) bool
    vbc_val: jax.Array    # (nno, 3)
    BI: jax.Array         # (nno, 3) 1/diag(K)
    BPI: jax.Array        # (nel,)   pressure preconditioner
    plan: ScatterPlan
    elt_c: object = None  # (nel, 8, 3) anelastic continuity, or None


def build_elt_k(B, gda, gweight, evisc):
    """elt_k[e,(a i),(b j)] = sum_g W[e,g] B^T D B   with
    W = w_g * |J|_g * eta_g and D = diag(2,2,2,1,1,1)."""
    W = gweight[None, :] * gda * evisc                        # (nel, g)
    D = jnp.asarray([2.0, 2.0, 2.0, 1.0, 1.0, 1.0], B.dtype)
    BW = B * (W[:, :, None, None, None] * D[None, None, :, None, None])
    K = jnp.einsum("egsai,egsbj->eaibj", BW, B)
    nel = B.shape[0]
    return K.reshape(nel, 24, 24)


def strip_bcs(u, vbc_mask):
    """Zero residual/search components at prescribed dofs
    (strip_bcs_from_residual semantics)."""
    return jnp.where(vbc_mask, 0.0, u)


def apply_vbc(u, vbc_mask, vbc_val):
    """Impose prescribed velocity values (velocities_conform_bcs)."""
    return jnp.where(vbc_mask, vbc_val, u)


def assemble_del2_u(ops: StokesOperators, u, *, strip: bool = True):
    """Au = K u element-by-element (e_assemble_del2_u). u: (nno, 3)."""
    u_el = jnp.take(u, ops.ien, axis=0).reshape(-1, 24)        # (nel, 24)
    au_el = jnp.einsum("eab,eb->ea", ops.elt_k, u_el)
    au = ops.plan.scatter(au_el.reshape(-1, 8, 3))
    if strip:
        au = strip_bcs(au, ops.vbc_mask)
    return au


def assemble_grad_p(ops: StokesOperators, p, *, strip: bool = True):
    """F = G p: scatter element-pressure gradients to nodes
    (assemble_grad_p, Element_calculations.c:737-783)."""
    contrib = ops.G * p[:, None, None]                        # (nel, 8, 3)
    f = ops.plan.scatter(contrib)
    if strip:
        f = strip_bcs(f, ops.vbc_mask)
    return f


def assemble_div_u(ops: StokesOperators, u):
    """r_e = G_e^T u_el (assemble_div_u, Element_calculations.c:701-730).
    With elt_c present this is the ANELASTIC divergence
    div(rho_ref u)/rho_ref = div u + (dln rho/dr) u_r
    (assemble_div_rho_u, Element_calculations.c:682-693)."""
    u_el = jnp.take(u, ops.ien, axis=0)                       # (nel, 8, 3)
    d = jnp.einsum("eai,eai->e", ops.G, u_el)
    if ops.elt_c is not None:
        d = d + jnp.einsum("eai,eai->e", ops.elt_c, u_el)
    return d


def build_elt_c(cc, volume, beta):
    """Element operator for (dln rho/dr) u_r at the pressure point
    (get_elt_c, Element_calculations.c:840-880, refstate choice 1:
    rho = exp((1-r) Di/gamma) so beta = dln(rho)/dr = -Di/gamma).

    elt_c[e, a, i] = -beta * V_e * N_a(center) * cc_r[e, i, a] where cc_r
    is the radial row of the node->gauss frame rotation (center mean);
    the minus matches the reference's divergence sign convention
    (elt_c[p][0] = -x * temp * beta, Element_calculations.c:870-872).
    """
    cc_r = cc.mean(axis=1)[:, 2]            # (nel, 3i, 8a)
    return -beta * volume[:, None, None] / 8.0 \
        * jnp.transpose(cc_r, (0, 2, 1))    # (nel, 8a, 3i)


def build_diag_K(elt_k, plan: ScatterPlan):
    """1/diag(K) Jacobi preconditioner (build_diagonal_of_K)."""
    d = jnp.einsum("eaa->ea", elt_k).reshape(-1, 8, 3)
    diag = plan.scatter(d)
    return jnp.where(diag != 0.0, 1.0 / diag, 1.0)


def build_bpi(G, BI, ien, vbc_mask):
    """Pressure preconditioner BPI[e] = 1/(G_e^T diag(K)^-1 G_e)
    (assemble_dAhatp_entry, Element_calculations.c:785-833). Prescribed dofs
    carry no inverse-diagonal weight (their residuals are stripped)."""
    bi_el = jnp.take(jnp.where(vbc_mask, 0.0, BI), ien, axis=0)  # (nel, 8, 3)
    bu = jnp.einsum("eai,eai,eai->e", G, G, bi_el)
    return jnp.where(bu != 0.0, 1.0 / bu, 1.0)


def assemble_forces(ops: StokesOperators, geo_N, gda, gweight, cc, buoy):
    """Momentum RHS from nodal buoyancy + Dirichlet lifting
    (assemble_forces / get_elt_f, Element_calculations.c:80-143, 1015-1092).

    geo_N: (8a, 8g); gda: (nel, 8g); cc: (nel, 8g, 3p, 3n, 8a);
    buoy: (nno,) radial buoyancy per node.
    """
    f_nodes = jnp.take(buoy, ops.ien, axis=0)                 # (nel, 8)
    f_gs = jnp.einsum("ea,ag->eg", f_nodes, geo_N)            # (nel, 8g)
    w = f_gs * gda * gweight[None, :]
    # radial (gauss-frame e_r) component projected on node-frame dir i
    contrib = jnp.einsum("eg,ag,egia->eai", w, geo_N, cc[:, :, 2])
    f = ops.plan.scatter(contrib)

    # Dirichlet lifting: F -= K * vb  (get_elt_f bcs branch)
    vb = jnp.where(ops.vbc_mask, ops.vbc_val, 0.0)
    f = f - assemble_del2_u(ops, vb, strip=False)
    return strip_bcs(f, ops.vbc_mask)


def build_tmass(plan: ScatterPlan, geo_N, gda, gweight):
    """Inverse lumped mass for the energy equation (mass_matrix,
    Size_does_matter.c:1123-1147)."""
    contrib = jnp.einsum("ag,eg,g->ea", geo_N, gda, gweight)  # (nel, 8a)
    mass = plan.scatter(contrib)
    return 1.0 / mass
