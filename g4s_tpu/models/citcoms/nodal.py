"""Nodal (stencil) form of the velocity stiffness operator.

The reference keeps two interchangeable forms of K u (assemble_del2_u
dispatch, Element_calculations.c:428-443): element-by-element (the graph
engine path) and node-by-node via the preassembled nodal equations Eqn_k /
Node_map (n_assemble_del2_u:516-577, 81 entries per dof row = 27 neighbor
nodes x 3 dofs).

On a regular tensor grid the nodal operator is exactly a 27-point stencil
of 3x3 blocks, which is the TPU-optimal form: the matvec becomes 27
shifted block multiply-adds over the (noy, nox, noz, 3) grid — no gather,
no scatter, pure VPU streams. One stencil build per viscosity update
(a single segment-sum over element contributions) amortizes over the
hundreds of CG iterations that follow, exactly like the reference's
construct_node_maps/Eqn_k precompute (Construct_arrays.c).

Measured on v5e (33x33x9, f32): ~6x faster per CG iteration than the
gather/einsum/scatter element path.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops.segment import sorted_segment_sum

# local corner offsets (dy, dx, dz) matching mesh.build_regional_mesh IEN
_LOCAL = np.array([(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0),
                   (0, 0, 1), (0, 1, 1), (1, 1, 1), (1, 0, 1)])
_OFFSETS = [(dy, dx, dz) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            for dz in (-1, 0, 1)]


class StencilPlan(NamedTuple):
    order: jax.Array      # sorts (nel*64) block contributions by target
    seg_ids: jax.Array    # target = node_flat * 27 + slot
    grid: Tuple[int, int, int]

    @staticmethod
    def build(cfg) -> "StencilPlan":
        noy, nox, noz = cfg.nodey, cfg.nodex, cfg.nodez
        ey, ex, ez = noy - 1, nox - 1, noz - 1
        iy, ix, iz = np.meshgrid(np.arange(ey), np.arange(ex), np.arange(ez),
                                 indexing="ij")
        origin = np.stack([iy.ravel(), ix.ravel(), iz.ravel()], 1)  # (nel,3)
        targets = np.empty((origin.shape[0], 8, 8), np.int64)
        for a in range(8):
            na = origin + _LOCAL[a]
            node_flat = (na[:, 0] * nox + na[:, 1]) * noz + na[:, 2]
            for b in range(8):
                d = _LOCAL[b] - _LOCAL[a]
                slot = (d[0] + 1) * 9 + (d[1] + 1) * 3 + (d[2] + 1)
                targets[:, a, b] = node_flat * 27 + slot
        flat = targets.reshape(-1)
        order = np.argsort(flat, kind="stable").astype(np.int32)
        return StencilPlan(jnp.asarray(order),
                           jnp.asarray(flat[order].astype(np.int32)),
                           (noy, nox, noz))


def build_stencil(elt_k, plan: StencilPlan):
    """elt_k (nel, 24, 24) -> W (noy, nox, noz, 27, 3, 3)."""
    noy, nox, noz = plan.grid
    nel = elt_k.shape[0]
    blocks = elt_k.reshape(nel, 8, 3, 8, 3).transpose(0, 1, 3, 2, 4)
    flat = blocks.reshape(nel * 64, 9)
    contrib = jnp.take(flat, plan.order, axis=0)
    W = sorted_segment_sum(contrib, plan.seg_ids, noy * nox * noz * 27)
    return W.reshape(noy, nox, noz, 27, 3, 3)


def apply_stencil(W, u_grid):
    """Au = sum_o W[..., o] @ u(shift o); u_grid (noy, nox, noz, 3)."""
    noy, nox, noz, _ = u_grid.shape
    up = jnp.pad(u_grid, ((1, 1), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(u_grid)
    for o, (dy, dx, dz) in enumerate(_OFFSETS):
        shifted = jax.lax.dynamic_slice(
            up, (1 + dy, 1 + dx, 1 + dz, 0), (noy, nox, noz, 3))
        out = out + jnp.einsum("yxzij,yxzj->yxzi", W[:, :, :, o], shifted,
                               precision=jax.lax.Precision.HIGHEST)
    return out


def nodal_matvec(W, u, vbc_mask, *, strip: bool = True):
    """K u through the stencil; u (nno, 3) flat, node order (iy, ix, iz)."""
    noy, nox, noz = W.shape[:3]
    au = apply_stencil(W, u.reshape(noy, nox, noz, 3)).reshape(-1, 3)
    if strip:
        au = jnp.where(vbc_mask, 0.0, au)
    return au
