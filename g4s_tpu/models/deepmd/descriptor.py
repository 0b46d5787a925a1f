"""se_e2_a environment-matrix descriptor, TPU-native.

Rebuilds the semantics of the reference's native pipeline
(deepmd/source/lib/src/{neighbor_list,fmt_nlist,env_mat}.cc driven by the
ProdEnvMatA op, deepmd/source/op/prod_env_mat_multi_device.cc:9):

  - neighbor list: all-pairs minimum-image distances (for the O(100)-atom
    training systems a dense (N, N) distance matrix is MXU/VPU-friendly and
    beats cell lists; cell lists only pay off at much larger N),
  - per-type sorted truncation to sel[t] slots (fmt_nlist.cc: neighbors
    sorted by (type, distance), padded),
  - smoothed env matrix rows s(r) * (1, x/r, y/r, z/r) with the quintic
    switch between rcut_smth and rcut (env_mat.cc:7-80, switcher spline5).

Derivatives (prod_force/prod_virial, hand-written adjoints in the
reference) come free via jax.grad through this whole function.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DescriptorSpec(NamedTuple):
    rcut: float
    rcut_smth: float
    sel: Tuple[int, ...]      # neighbors kept per type
    ntypes: int

    @property
    def nnei(self) -> int:
        return int(sum(self.sel))


def min_image_displacements(coords, box):
    """Pairwise displacement r_j - r_i with periodic minimum image.

    coords: (N, 3); box: (3, 3) row-vector cell. Returns (N, N, 3).
    Exact for orthorhombic cells and cells with small skew (one-image
    wrap), matching the training-system regime of the reference's
    region.cc diffNearestNeighbor.
    """
    disp = coords[None, :, :] - coords[:, None, :]
    inv = jnp.linalg.inv(box)
    frac = disp @ inv
    frac = frac - jnp.round(frac)
    return frac @ box


def switch_fn(r, rmin, rmax):
    """DeePMD quintic switching: 1 for r<rmin, ->0 at rmax
    (source/lib/include/switcher.h spline5_switch)."""
    u = (r - rmin) / (rmax - rmin)
    sw = 1.0 + u * u * u * (-10.0 + u * (15.0 - 6.0 * u))
    return jnp.where(r < rmin, 1.0, jnp.where(r > rmax, 0.0, sw))


def env_mat(coords, box, types, spec: DescriptorSpec, *,
            efield=None, ef_mode: str = "none"):
    """Environment matrix for one frame.

    coords: (N, 3) Angstrom; types: (N,) int; box: (3, 3).
    Returns R: (N, nnei, 4) and nlist: (N, nnei) neighbor indices (-1 pad).
    Slots are laid out per type section (sel[0] slots of type 0, ...),
    each section sorted by distance — exactly fmt_nlist's layout.

    efield/ef_mode implement the se_a_ef variants (ComputeDescriptor.h
    compute_descriptor_se_a_ef_para/_vert): the vector channels use the
    component of r parallel ("para") or perpendicular ("vert") to the
    per-atom unit field, while channel 0 keeps 1/r of the FULL distance.
    """
    n = coords.shape[0]
    disp = min_image_displacements(coords, box)          # (N, N, 3)
    r2 = jnp.sum(disp * disp, axis=-1)
    big = jnp.asarray(1e10, r2.dtype)
    r2 = r2 + big * jnp.eye(n, dtype=r2.dtype)           # exclude self

    R_secs, nl_secs = [], []
    for t in range(spec.ntypes):
        k = spec.sel[t]
        r2_t = jnp.where(types[None, :] == t, r2, big)
        if r2_t.shape[1] < k:
            # fewer atoms than sel slots (tiny systems): pad candidates
            # with far-away dummies; they fail the rcut test and mask out
            r2_t = jnp.pad(r2_t, ((0, 0), (0, k - r2_t.shape[1])),
                           constant_values=1e10)
        neg, idx = jax.lax.top_k(-r2_t, k)               # (N, k) ascending r2
        d2 = -neg
        valid = d2 < spec.rcut ** 2
        d = jnp.sqrt(jnp.where(valid, d2, 1.0))
        # clamp pad indices before the gather: out-of-bounds
        # take_along_axis fills NaN (eager mode), and 0 * NaN = NaN
        idx_g = jnp.where(valid, idx, 0)
        vec = jnp.take_along_axis(disp, idx_g[:, :, None], axis=1)  # (N,k,3)
        sw = switch_fn(d, spec.rcut_smth, spec.rcut)
        s = jnp.where(valid, sw / d, 0.0)
        row0 = s
        if efield is not None and ef_mode != "none":
            ef = efield / jnp.linalg.norm(efield, axis=-1,
                                          keepdims=True)     # (N, 3)
            dot = jnp.sum(vec * ef[:, None, :], axis=-1,
                          keepdims=True)
            para = dot * ef[:, None, :]
            vec_eff = para if ef_mode == "para" else vec - para
        else:
            vec_eff = vec
        rows = s[:, :, None] * vec_eff \
            / jnp.where(valid, d, 1.0)[:, :, None]
        R_secs.append(jnp.concatenate([row0[:, :, None], rows], axis=-1)
                      * valid[:, :, None])
        nl_secs.append(jnp.where(valid, idx, -1))
    R = jnp.concatenate(R_secs, axis=1)                  # (N, nnei, 4)
    nlist = jnp.concatenate(nl_secs, axis=1)
    return R, nlist


def normalize_env_mat(R, types, davg, dstd):
    """Per-center-type standardization (the trained davg/dstd constants of
    DescrptSeA, se_a.py:227-253)."""
    avg = jnp.take(davg, types, axis=0)                  # (N, nnei, 4)
    std = jnp.take(dstd, types, axis=0)
    return (R - avg) / std


def compute_stats(frames_R: Sequence[np.ndarray], frames_types,
                  ntypes: int, nnei: int) -> Tuple[np.ndarray, np.ndarray]:
    """compute_input_stats (se_a.py:304-420): davg=(r̄,0,0,0), dstd from
    radial/angular second moments, broadcast over neighbor slots."""
    sumr = np.zeros(ntypes); sumr2 = np.zeros(ntypes)
    suma = np.zeros(ntypes); suma2 = np.zeros(ntypes)
    sumn = np.zeros(ntypes)
    for R, types in zip(frames_R, frames_types):
        R = np.asarray(R); types = np.asarray(types)
        for t in range(ntypes):
            sub = R[types == t]                           # (nt, nnei, 4)
            sumr[t] += sub[..., 0].sum()
            sumr2[t] += (sub[..., 0] ** 2).sum()
            suma[t] += sub[..., 1:].sum()
            suma2[t] += (sub[..., 1:] ** 2).sum()
            sumn[t] += sub.shape[0] * sub.shape[1]
    davg = np.zeros((ntypes, nnei, 4))
    dstd = np.ones((ntypes, nnei, 4))
    for t in range(ntypes):
        if sumn[t] == 0:
            continue
        r_avg = sumr[t] / sumn[t]
        std_r = np.sqrt(max(sumr2[t] / sumn[t] - r_avg ** 2, 0.0))
        std_a = np.sqrt(max(suma2[t] / (3 * sumn[t]), 0.0))
        davg[t, :, 0] = r_avg
        dstd[t, :, 0] = max(std_r, 1e-2)
        dstd[t, :, 1:] = max(std_a, 1e-2)
    return davg, dstd


def neighbor_stat(frames_coord, frames_box, types, rcut: float,
                  ntypes: int):
    """Max neighbor count per type over sample frames — the auto-`sel`
    helper (deepmd/deepmd/utils/neighbor_stat.py + source/op/
    neighbor_stat.cc). Returns (max_per_type, suggested_sel)."""
    import numpy as np
    types = np.asarray(types)
    max_nbor = np.zeros(ntypes, dtype=np.int64)
    for coord, box in zip(frames_coord, frames_box):
        c = np.asarray(coord).reshape(-1, 3)
        b = np.asarray(box).reshape(3, 3)
        d = c[None] - c[:, None]
        f = d @ np.linalg.inv(b)
        f -= np.round(f)
        r = np.linalg.norm(f @ b, axis=-1)
        np.fill_diagonal(r, np.inf)
        within = r < rcut
        for t in range(ntypes):
            cnt = within[:, types == t].sum(axis=1)
            max_nbor[t] = max(max_nbor[t], int(cnt.max()))
    # suggested sel: ~10% headroom rounded up to a multiple of 4
    sel = (np.ceil(max_nbor * 1.1 / 4) * 4).astype(int)
    return max_nbor, tuple(int(s) for s in sel)


def env_mat_celllist(coords, box, types, spec: DescriptorSpec,
                     *, max_per_cell: int = 64):
    """Cell-list variant of env_mat for large N (the role of the
    reference's cell-list build, source/lib/src/neighbor_list.cc).

    Atoms are binned into cells with side >= rcut (static cell count from
    the box); each atom's candidates come from its 27 surrounding cells
    (fixed max occupancy, padded) instead of all N atoms — O(N) work.
    Orthorhombic boxes only. Returns the same (R, nlist) as env_mat.
    """
    import numpy as np
    n = coords.shape[0]
    box_d = np.diag(np.asarray(box))
    n_cells = np.maximum((box_d / spec.rcut).astype(int), 1)
    ncx, ncy, ncz = int(n_cells[0]), int(n_cells[1]), int(n_cells[2])
    n_cell_total = ncx * ncy * ncz

    frac = coords / jnp.asarray(box_d)
    frac = frac - jnp.floor(frac)
    ci = jnp.minimum((frac * jnp.asarray([ncx, ncy, ncz])).astype(jnp.int32),
                     jnp.asarray([ncx - 1, ncy - 1, ncz - 1]))
    cell_id = (ci[:, 0] * ncy + ci[:, 1]) * ncz + ci[:, 2]

    # bucket atoms per cell (static max occupancy): sort by cell, then
    # rank within each run of equal cell ids
    order = jnp.argsort(cell_id)
    sorted_cells = jnp.take(cell_id, order)
    run_first = jax.ops.segment_min(jnp.arange(n, dtype=jnp.int32),
                                    sorted_cells, num_segments=n_cell_total)
    rank = jnp.arange(n, dtype=jnp.int32) - jnp.take(run_first, sorted_cells)
    buckets = jnp.full((n_cell_total, max_per_cell), -1, jnp.int32)
    buckets = buckets.at[sorted_cells,
                         jnp.minimum(rank, max_per_cell - 1)].set(
        order.astype(jnp.int32))

    # 27-cell candidate lists per atom
    offs = jnp.asarray([(dx, dy, dz) for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
                       dtype=jnp.int32)
    nb_cells = (jnp.mod(ci[:, None, 0] + offs[None, :, 0], ncx) * ncy
                + jnp.mod(ci[:, None, 1] + offs[None, :, 1], ncy)) * ncz \
        + jnp.mod(ci[:, None, 2] + offs[None, :, 2], ncz)
    cand = jnp.take(buckets, nb_cells, axis=0).reshape(n, -1)  # (N, 27*occ)

    # distances to candidates with minimum image
    cc = jnp.take(coords, jnp.maximum(cand, 0), axis=0)
    disp = cc - coords[:, None, :]
    disp = disp - jnp.round(disp / jnp.asarray(box_d)) * jnp.asarray(box_d)
    r2 = jnp.sum(disp * disp, axis=-1)
    invalid = (cand < 0) | (cand == jnp.arange(n)[:, None])
    big = jnp.asarray(1e10, r2.dtype)
    r2 = jnp.where(invalid, big, r2)

    cand_type = jnp.where(cand >= 0, jnp.take(types, jnp.maximum(cand, 0)),
                          -1)
    R_secs, nl_secs = [], []
    for t in range(spec.ntypes):
        k = spec.sel[t]
        r2_t = jnp.where(cand_type == t, r2, big)
        if r2_t.shape[1] < k:
            r2_t = jnp.pad(r2_t, ((0, 0), (0, k - r2_t.shape[1])),
                           constant_values=1e10)
        neg, idx = jax.lax.top_k(-r2_t, k)
        d2 = -neg
        valid = d2 < spec.rcut ** 2
        d = jnp.sqrt(jnp.where(valid, d2, 1.0))
        idx_g = jnp.where(valid, idx, 0)
        vec = jnp.take_along_axis(disp, idx_g[:, :, None], axis=1)
        sw = switch_fn(d, spec.rcut_smth, spec.rcut)
        s = jnp.where(valid, sw / d, 0.0)
        rows = s[:, :, None] * vec / jnp.where(valid, d, 1.0)[:, :, None]
        R_secs.append(jnp.concatenate([s[:, :, None], rows], axis=-1)
                      * valid[:, :, None])
        glob = jnp.take_along_axis(cand, idx, axis=1)
        nl_secs.append(jnp.where(valid, glob, -1))
    return (jnp.concatenate(R_secs, axis=1),
            jnp.concatenate(nl_secs, axis=1))


def env_mat_nopbc(coords, types, spec: DescriptorSpec, *, atom_mask=None):
    """Environment matrix for a FINITE (non-periodic) system, with an
    optional real-atom mask (DescrptSeAMask, deepmd/descriptor/
    se_a_mask.py: aparam marks real vs virtual atoms so one graph serves
    variable-size molecules).

    No minimum image; masked-out (virtual) atoms are excluded both as
    centers' neighbors and produce zero rows. The reference's se_a_mask
    also drops the rcut smoothing (mask IS the cutoff); here the same
    switch_fn machinery is kept with the declared rcut so the descriptor
    stays continuous if real atoms leave the radius.
    """
    n = coords.shape[0]
    disp = coords[None, :, :] - coords[:, None, :]       # (N, N, 3), no PBC
    r2 = jnp.sum(disp * disp, axis=-1)
    big = jnp.asarray(1e10, r2.dtype)
    r2 = r2 + big * jnp.eye(n, dtype=r2.dtype)
    if atom_mask is not None:
        am = jnp.asarray(atom_mask, bool)
        r2 = jnp.where(am[None, :], r2, big)             # exclude virtuals

    R_secs, nl_secs = [], []
    for t in range(spec.ntypes):
        k = spec.sel[t]
        r2_t = jnp.where(types[None, :] == t, r2, big)
        if r2_t.shape[1] < k:
            r2_t = jnp.pad(r2_t, ((0, 0), (0, k - r2_t.shape[1])),
                           constant_values=1e10)
        neg, idx = jax.lax.top_k(-r2_t, k)
        d2 = -neg
        valid = d2 < spec.rcut ** 2
        d = jnp.sqrt(jnp.where(valid, d2, 1.0))
        idx_g = jnp.where(valid, idx, 0)
        vec = jnp.take_along_axis(disp, idx_g[:, :, None], axis=1)
        sw = switch_fn(d, spec.rcut_smth, spec.rcut)
        s = jnp.where(valid, sw / d, 0.0)
        rows = s[:, :, None] * vec / jnp.where(valid, d, 1.0)[:, :, None]
        R_secs.append(jnp.concatenate([s[:, :, None], rows], axis=-1)
                      * valid[:, :, None])
        nl_secs.append(jnp.where(valid, idx, -1))
    R = jnp.concatenate(R_secs, axis=1)
    nlist = jnp.concatenate(nl_secs, axis=1)
    if atom_mask is not None:
        am = jnp.asarray(atom_mask, bool)
        R = R * am[:, None, None]                        # virtual centers
        nlist = jnp.where(am[:, None], nlist, -1)
    return R, nlist


def atomic_descriptor_ef(params_para, params_vert, spec, coords, box,
                         types, efield):
    """se_a_ef descriptor (deepmd/descriptor/se_a_ef.py DescrptSeAEf):
    two DescrptSeA-style sub-descriptors over the field-parallel and
    field-perpendicular environment matrices, concatenated per atom.
    `efield` is (N, 3) per-atom field vectors (normalized internally).
    Each sub-descriptor carries its own embedding nets and stats."""
    from g4s_tpu.models.deepmd.model import atomic_descriptor
    outs = []
    for prm, mode in ((params_para, "para"), (params_vert, "vert")):
        R, _ = env_mat(coords, box, types, spec.descriptor,
                       efield=efield, ef_mode=mode)
        outs.append(atomic_descriptor(prm, spec, R, types))
    return jnp.concatenate(outs, axis=-1)
