"""Pallas TPU SpMV kernel over the packed windowed-ELL (BWELL) layout.

Why: XLA lowers large-table gathers on TPU to a serial path (~7M elem/s
measured), making jnp.take-based SpMV latency-bound. The TPU's native
vector gather works within one 128-lane vreg, so this kernel re-blocks the
matrix until every gather is a (8,128)-shaped take_along_axis against a
128-wide window of x held in VMEM:

  - rows are processed in PACKS of 8*(128/W) consecutive rows (W = padded
    entries/row, W | 128). One pack = one (8,128) slab of (lane, value)
    pairs: gather row s holds rows pack*R + s*(128/W) .. +127/W, each
    owning W lanes.
  - every pack has a 256-wide x window made of TWO 128-aligned blocks
    (Mosaic requires lane-dim slices to start at multiples of 128); the
    pack's columns must span < 128 so they always fit in two consecutive
    aligned blocks (host-verified; infeasible packs -> XLA fallback).
  - the kernel walks packs with a fori_loop: two aligned slices of x, two
    full-width take_along_axis (low/high block, selected by lane >= 128),
    one multiply, one in-lane segmented sum
    (reshape (8, 128/W, W) -> sum over W).

Memory traffic = 8 bytes/nnz (4B lane idx + 4B value) + x/y — the same
bytes a CSR SpMV moves, so the HBM roofline is the honest ceiling.

This is the TPU analog of the reference's cache-blocked row/col "blockers"
in the outer-product SpGEMM (mm/inc/outer_mult.h:315-353) applied to SpMV,
replacing AVX gathers (mm/inc/hash_mult.h:111-492) with vreg lane gathers.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from g4s_tpu.sparse.containers import CSR


def _static():
    return field(metadata=dict(static=True))


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class BWELL:
    """Packed windowed-ELL operator."""

    starts: jax.Array    # aligned block index b0: (n_packs,) for mode
                         # "pack", (n_packs*8,) for mode "row"
    lanes: jax.Array     # (n_tiles, PPT, 8, 128) int32 lane offsets
    vals: jax.Array      # (n_tiles, PPT, 8, 128) f32
    width: int = _static()        # W, entries per row (padded, divides 128)
    n_rows: int = _static()       # true row count
    n_cols: int = _static()
    ppt: int = _static()          # packs per tile
    shape: Tuple[int, int] = _static()
    mode: str = _static()         # "pack" (one window/pack) | "row"
                                  # (one window per 8-sublane gather row)

    @property
    def rows_per_pack(self) -> int:
        return 8 * (128 // self.width)


def pack_bwell(a: CSR, *, width: Optional[int] = None,
               packs_per_tile: int = 64, dtype=jnp.float32,
               mode: str = "auto") -> BWELL:
    """Host-side packer.

    mode "pack": one 256-lane aligned window per pack of 8*(128/W) rows
    (fastest staging: two slab broadcasts per pack).
    mode "row": one window per GATHER ROW (128/W consecutive matrix
    rows) — 8 windows per pack, admitting matrices whose local column
    span fits 128 lanes per few rows but not per whole pack.
    mode "auto" tries "pack" then "row".
    Raises ValueError if no mode fits (caller falls back to XLA spmv)."""
    if mode == "auto":
        try:
            return pack_bwell(a, width=width, packs_per_tile=packs_per_tile,
                              dtype=dtype, mode="pack")
        except ValueError:
            return pack_bwell(a, width=width, packs_per_tile=packs_per_tile,
                              dtype=dtype, mode="row")
    from g4s_tpu.sparse.convert import csr_to_ell

    indptr = np.asarray(a.indptr)
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if deg.size else 1
    if width is None:
        width = 1
        while width < max_deg:
            width *= 2
        width = min(width, 128)
    if 128 % width or max_deg > width:
        raise ValueError(f"width {width} invalid for max degree {max_deg}")

    rpp = 8 * (128 // width)            # rows per pack
    n_rows, n_cols = a.shape
    n_packs = -(-n_rows // rpp)
    n_tiles = -(-n_packs // packs_per_tile)
    n_packs_pad = n_tiles * packs_per_tile
    rows_pad = n_packs_pad * rpp

    ell = csr_to_ell(a, width=width, pad_to=width)
    cols = np.zeros((rows_pad, width), np.int64)
    vals = np.zeros((rows_pad, width), np.float64)
    cols[: n_rows] = ell.cols
    vals[: n_rows] = ell.vals

    colsP = cols.reshape(n_packs_pad, rpp, width)
    valsP = vals.reshape(n_packs_pad, rpp, width)
    mask = valsP != 0
    rpr_ = 128 // width
    if mode == "row":
        # window per gather row: group rpr_ consecutive rows
        colsG = colsP.reshape(n_packs_pad, 8, rpr_ * width)
        maskG = mask.reshape(n_packs_pad, 8, rpr_ * width)
        cm = np.where(maskG, colsG, np.iinfo(np.int64).max)
        min_col = cm.min(axis=2)
        min_col[min_col == np.iinfo(np.int64).max] = 0
        b0 = min_col // 128                              # (n_packs, 8)
        lanes = np.where(maskG, colsG, b0[:, :, None] * 128) \
            - b0[:, :, None] * 128
        if lanes.max(initial=0) >= 256 or lanes.min(initial=0) < 0:
            bad = int((lanes.reshape(n_packs_pad, -1).max(axis=1)
                       >= 256).sum())
            raise ValueError(
                f"{bad}/{n_packs_pad} packs exceed the 256-lane window "
                "even per gather row; use the XLA spmv fallback")
        lanes = lanes.reshape(n_packs_pad, rpp, width)
        starts = b0.reshape(-1)
    else:
        cm = np.where(mask, colsP, np.iinfo(np.int64).max)
        min_col = cm.reshape(n_packs_pad, -1).min(axis=1)
        min_col[min_col == np.iinfo(np.int64).max] = 0
        b0 = min_col // 128                      # aligned block index
        lanes = np.where(mask, colsP, b0[:, None, None] * 128) \
            - b0[:, None, None] * 128
        if lanes.max(initial=0) >= 256 or lanes.min(initial=0) < 0:
            bad = int((lanes.reshape(n_packs_pad, -1).max(axis=1)
                       >= 256).sum())
            raise ValueError(
                f"{bad}/{n_packs_pad} packs exceed the 256-lane aligned "
                "window; reorder/renumber rows or use the XLA spmv fallback")
        starts = b0

    # (pack, rpp, W) -> (pack, 8, 128): gather row s = rows s*(128/W)..
    rpr = 128 // width                   # rows per gather row
    lanes8 = lanes.reshape(n_packs_pad, 8, rpr, width) \
        .reshape(n_packs_pad, 8, 128).astype(np.int32)
    vals8 = valsP.reshape(n_packs_pad, 8, rpr, width) \
        .reshape(n_packs_pad, 8, 128)

    return BWELL(
        jnp.asarray(starts.astype(np.int32)),
        jnp.asarray(lanes8.reshape(n_tiles, packs_per_tile, 8, 128)),
        jnp.asarray(vals8.reshape(n_tiles, packs_per_tile, 8, 128), dtype),
        width, n_rows, n_cols, packs_per_tile, a.shape, mode)


def _segment_matrix(width: int) -> np.ndarray:
    """seg[l, j] = 1 if lane l belongs to sub-row j (lane-segment reduction
    expressed as a one-hot MXU matmul)."""
    rpr = 128 // width
    seg = np.zeros((128, rpr), np.float32)
    for j in range(rpr):
        seg[j * width:(j + 1) * width, j] = 1.0
    return seg


def _kernel(ppt: int, width: int, pb: int, mode: str = "pack"):
    rpr = 128 // width

    def kernel(starts_ref, lanes_ref, vals_ref, x_ref, seg_ref, y_ref,
               oplo, ophi):
        i = pl.program_id(0)

        def body(b, _):
            # stage PB packs' (lo, hi) x windows into (PB*8, 128) operands
            def fill(q, _):
                if mode == "row":
                    # 8 windows per pack, one per gather row; assemble the
                    # (8,128) slabs in registers and store once at an
                    # 8-sublane-aligned offset (single-sublane dynamic
                    # stores mis-lower on Mosaic)
                    base = (i * ppt + b * pb + q) * 8
                    los, his = [], []
                    for s_ in range(8):
                        w0 = pl.multiple_of(starts_ref[base + s_] * 128,
                                            128)
                        los.append(x_ref[0, pl.ds(w0, 128)])
                        his.append(x_ref[0, pl.ds(w0 + 128, 128)])
                    oplo[pl.ds(q * 8, 8), :] = jnp.stack(los, axis=0)
                    ophi[pl.ds(q * 8, 8), :] = jnp.stack(his, axis=0)
                    return 0
                w0 = pl.multiple_of(
                    starts_ref[i * ppt + b * pb + q] * 128, 128)
                oplo[pl.ds(q * 8, 8), :] = jnp.broadcast_to(
                    x_ref[0, pl.ds(w0, 128)][None, :], (8, 128))
                ophi[pl.ds(q * 8, 8), :] = jnp.broadcast_to(
                    x_ref[0, pl.ds(w0 + 128, 128)][None, :], (8, 128))
                return 0

            jax.lax.fori_loop(0, pb, fill, 0)
            lanes = lanes_ref[0, pl.ds(b * pb, pb)].reshape(pb * 8, 128)
            vals = vals_ref[0, pl.ds(b * pb, pb)].reshape(pb * 8, 128)
            lo = lanes < 128
            g0 = jnp.take_along_axis(oplo[:], jnp.where(lo, lanes, 0), axis=1)
            g1 = jnp.take_along_axis(ophi[:], jnp.where(lo, 0, lanes - 128),
                                     axis=1)
            prod = vals * jnp.where(lo, g0, g1)
            # HIGHEST precision: the MXU's default bf16 input rounding
            # would corrupt f32 values (measured 2e-3 rel err)
            y = jax.lax.dot_general(
                prod, seg_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=prod.dtype)
            y_ref[0, pl.ds(b * pb, pb)] = y.reshape(pb, 8, rpr)
            return 0

        jax.lax.fori_loop(0, ppt // pb, body, 0)

    return kernel


def spmv_bwell(packed: BWELL, x, *, packs_per_batch: int | None = None):
    """y = A @ x with the Pallas kernel. x: (n_cols,) f32.

    Measured on TPU v5e (1M rows, f32, packs_per_batch=64, full-f32
    matmul precision): 269 GB/s effective on a 16-diag band (mode
    "pack"), 149 GB/s on a clustered-window general matrix (mode "row")
    — vs ~0.2 GB/s for the XLA gather path on the same matrices.
    """
    n_tiles = packed.lanes.shape[0]
    ppt = packed.ppt
    rpr = 128 // packed.width
    pb = packs_per_batch or ppt
    if ppt % pb:
        raise ValueError(f"packs_per_batch {pb} must divide ppt {ppt}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, ppt, 8, 128), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, ppt, 8, 128), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, packed.n_cols + 256), lambda i, *_: (0, 0)),
            pl.BlockSpec((128, rpr), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ppt, 8, rpr), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((pb * 8, 128), x.dtype),
                        pltpu.VMEM((pb * 8, 128), x.dtype)],
    )
    # pad x by two aligned blocks so the high-window load is always in range
    n_pad = packed.n_cols + 256
    x_pad = jnp.zeros((n_pad,), x.dtype).at[: packed.n_cols].set(x)
    y = pl.pallas_call(
        _kernel(ppt, packed.width, pb, packed.mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, ppt, 8, rpr), x.dtype),
    )(packed.starts, packed.lanes, packed.vals, x_pad[None, :],
      jnp.asarray(_segment_matrix(packed.width), x.dtype))
    return y.reshape(-1)[: packed.n_rows]


# ---------------------------------------------------------------------------
# WSELL-K: the GENERAL-matrix Pallas SpMV.
#
# BWELL above requires every pack's columns to fit ONE 256-lane aligned
# window — true for narrow bands, false for real mesh matrices (an
# RCM-ordered 3D stencil has bandwidth ~n^(2/3): its 7 neighbor clusters
# per row pack land in ~10-30 distinct 128-aligned blocks of x). WSELL-K
# generalizes the trick: each pack of 8*(128/W) rows carries K dynamic
# window slots (128-aligned blocks of x chosen by the host packer), and
# every entry's lane index encodes slot*128 + offset. The kernel loops
# over the K slots: one dynamic 128-slice of x (VMEM-resident), one
# sublane broadcast, one full-width take_along_axis, one masked
# multiply-accumulate — all register-resident, no scratch staging. This
# is the TPU replacement for the reference's AVX2/512 gather loops
# (mm/inc/hash_mult.h:111-492) on patterns with no single-window
# structure.
#
# v2 (measured on the chip, RCM-shuffled 3D 7-point stencil at n=1M):
#   - lane indices are int16 (slot*128+offset <= k_max*128-1 < 2^15),
#     cutting index traffic in half: 6 bytes per stored lane + x/y;
#   - tiles are GROUPED by their max per-pack window count and each
#     group runs its own kernel unrolled to exactly that K — the
#     kernel is window-loop compute-bound (~20 us per window sweep at
#     n=1M; the DMA floor is ~70 us), so skipping dead window steps is
#     a direct win. build_graph sorts packs by window count with a
#     128-block-granular symmetric permutation (window counts are
#     invariant under it) to make tiles K-homogeneous;
#   - spmv_wsell_chain evaluates padded-in/padded-out so iterative
#     solvers chain matvecs with no per-call pad/slice copies.
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class WSELL:
    """Packed K-windowed ELL operator."""

    starts: jax.Array    # (n_packs_pad*K,) int32 aligned block ids, flat
                         # (2-D SMEM operands are lane-padded to 128 —
                         # flat 1-D keeps the prefetch under the 1 MiB SMEM)
    lanes: jax.Array     # (n_tiles, PPT, 8, 128) int16: slot*128 + offset
    vals: jax.Array      # (n_tiles, PPT, 8, 128) dtype
    width: int = _static()        # W, padded entries/row, divides 128
    n_rows: int = _static()
    n_cols: int = _static()
    ppt: int = _static()          # packs per tile
    k: int = _static()            # window slots per pack (max over packs)
    shape: Tuple[int, int] = _static()
    # consecutive tile groups (tile_count, K_g): group g's tiles need at
    # most K_g windows per pack, its kernel unrolls exactly K_g steps
    groups: Tuple[Tuple[int, int], ...] = _static()

    @property
    def rows_per_pack(self) -> int:
        return 8 * (128 // self.width)

    @property
    def rows_padded(self) -> int:
        """Length of the padded result spmv_wsell_chain returns."""
        return self.lanes.shape[0] * self.ppt * self.rows_per_pack


def wsell_block_sort_perm(a: CSR, *, width: Optional[int] = None,
                          packs_per_tile: int = 64):
    """Row permutation sorting WSELL packs by their window count, at
    128-block granularity (returns None when packs aren't block-sized).

    Window counts are invariant under a 128-block-granular symmetric
    permutation — blocks map to blocks, within-block offsets are
    unchanged — so applying this before pack_wsell makes tiles
    K-homogeneous without altering any pack's cost. The tail partial
    block stays fixed (moving it would break block alignment)."""
    indptr = np.asarray(a.indptr)
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if deg.size else 1
    if width is None:
        width = 1
        while width < max_deg:
            width *= 2
        width = min(width, 128)
    rpp = 8 * (128 // width)
    n_rows = a.shape[0]
    if rpp % 128 or n_rows < 2 * rpp:
        return None
    n_full = (n_rows // rpp) * rpp           # rows in full packs
    # per-pack distinct 128-block count, vectorized
    cols = np.asarray(a.indices, np.int64)
    rows_of = np.repeat(np.arange(n_rows, dtype=np.int64), deg)
    sel = rows_of < n_full
    key = (rows_of[sel] // rpp) * (1 << 40) + (cols[sel] >> 7)
    uniq = np.unique(key)
    counts = np.bincount((uniq >> 40).astype(np.int64),
                         minlength=n_full // rpp)
    order = np.argsort(counts, kind="stable")
    if (order == np.arange(order.size)).all():
        return None
    perm = np.concatenate(
        [(order[:, None] * rpp + np.arange(rpp)).reshape(-1),
         np.arange(n_full, n_rows, dtype=np.int64)])
    return perm.astype(np.int64)


def pack_wsell(a: CSR, *, width: Optional[int] = None,
               packs_per_tile: int = 128, k_max: int = 32,
               dtype=jnp.float32) -> WSELL:
    """Host-side packer: choose W from the max degree, group rows into
    packs of 8*(128/W), and assign each pack the sorted set of distinct
    128-aligned x-blocks its columns touch. Raises ValueError when any
    pack needs more than k_max windows (caller falls back)."""
    from g4s_tpu.sparse.convert import csr_to_ell

    if k_max > 255:
        raise ValueError("k_max > 255 overflows the int16 lane encoding")
    indptr = np.asarray(a.indptr)
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if deg.size else 1
    if width is None:
        width = 1
        while width < max_deg:
            width *= 2
        width = min(width, 128)
    if 128 % width or max_deg > width:
        raise ValueError(f"width {width} invalid for max degree {max_deg}")

    rpp = 8 * (128 // width)
    n_rows, n_cols = a.shape
    n_packs = -(-n_rows // rpp)
    n_tiles = -(-n_packs // packs_per_tile)
    if n_rows == n_cols:
        # chain mode needs the padded result to double as the next padded
        # input: rows_pad >= roundup(n_cols, 128) + 128 guard block
        need = -(-n_cols // 128) * 128 + 128
        while n_tiles * packs_per_tile * rpp < need:
            n_tiles += 1
    n_packs_pad = n_tiles * packs_per_tile
    rows_pad = n_packs_pad * rpp

    ell = csr_to_ell(a, width=width, pad_to=width)
    cols = np.zeros((rows_pad, width), np.int64)
    vals = np.zeros((rows_pad, width), np.float64)
    cols[: n_rows] = ell.cols
    vals[: n_rows] = ell.vals
    mask = vals != 0

    colsP = cols.reshape(n_packs_pad, rpp * width)
    maskP = mask.reshape(n_packs_pad, rpp * width)
    blocksP = colsP >> 7                       # 128-aligned block id

    # vectorized per-pack distinct-block discovery: unique (pack, block)
    # pairs, segmented by pack (the BIN.h-style host symbolic pass)
    epp = rpp * width
    pack_of = np.repeat(np.arange(n_packs_pad, dtype=np.int64), epp)
    nb = int(blocksP.max(initial=0)) + 2
    key = pack_of * nb + np.where(maskP.reshape(-1), blocksP.reshape(-1), -1)
    uniq = np.unique(key[key >= (pack_of * nb)])     # masked-out dropped
    u_pack = uniq // nb
    u_block = uniq % nb
    seg_start = np.searchsorted(u_pack, np.arange(n_packs_pad))
    seg_end = np.searchsorted(u_pack, np.arange(n_packs_pad), side="right")
    counts = seg_end - seg_start
    K = max(int(counts.max(initial=1)), 1)
    if K > k_max:
        worst = int(counts.argmax())
        raise ValueError(
            f"pack {worst} touches {counts.max()} x-blocks > k_max={k_max}; "
            "use the XLA fallback or reorder rows")
    # starts[p, j] = j-th distinct block of pack p (repeat block 0 in
    # unused slots so the kernel's dynamic slice stays in range)
    starts = np.zeros((n_packs_pad, K), np.int64)
    slot_j = np.arange(len(uniq)) - seg_start[u_pack]
    starts[u_pack, slot_j] = u_block
    first = np.where(counts > 0, starts[:, 0], 0)
    pad_cols = np.arange(K)[None, :] >= counts[:, None]
    starts = np.where(pad_cols, first[:, None], starts)
    # per-entry slot = searchsorted within its pack's sorted block list
    fill_block = np.where(maskP, blocksP, first[:, None])
    flat_key = pack_of * nb + fill_block.reshape(-1)
    slot = (np.searchsorted(uniq, flat_key) - seg_start[pack_of]) \
        .astype(np.int32).reshape(n_packs_pad, epp)

    loc = slot * 128 + (colsP & 127).astype(np.int32)
    loc = np.where(maskP, loc, 0)

    lanes8 = loc.reshape(n_packs_pad, 8, 128).astype(np.int16)
    vals8 = vals.reshape(n_packs_pad, 8, 128)

    # tile groups: consecutive tiles sharing the same max per-pack window
    # count run one kernel unrolled to exactly that K (callers sort packs
    # with wsell_block_sort_perm first to make these groups long)
    kc_pack = np.zeros(n_packs_pad, np.int64)
    np.maximum.at(kc_pack, np.nonzero(maskP)[0], slot[maskP] + 1)
    kc_tile = np.maximum(
        kc_pack.reshape(n_tiles, packs_per_tile).max(axis=1), 1)
    groups = []
    t = 0
    while t < n_tiles:
        t1 = t
        while t1 < n_tiles and kc_tile[t1] == kc_tile[t]:
            t1 += 1
        groups.append([t1 - t, int(kc_tile[t])])
        t = t1
    # bound the kernel count: merge the shortest run into a neighbor
    # (max K wins) until few groups remain — with block-sorted packs
    # kc_tile is monotone and this loop never fires
    while len(groups) > 4:
        j = min(range(len(groups)), key=lambda q: groups[q][0])
        nb = j + 1 if j + 1 < len(groups) else j - 1
        lo_, hi_ = min(j, nb), max(j, nb)
        groups[lo_] = [groups[lo_][0] + groups[hi_][0],
                       max(groups[lo_][1], groups[hi_][1])]
        del groups[hi_]
    groups = [(c, k) for c, k in groups]

    return WSELL(
        jnp.asarray(starts.astype(np.int32).reshape(-1)),
        jnp.asarray(lanes8.reshape(n_tiles, packs_per_tile, 8, 128)),
        jnp.asarray(vals8.reshape(n_tiles, packs_per_tile, 8, 128), dtype),
        width, n_rows, n_cols, packs_per_tile, K, a.shape, tuple(groups))


def _wsell_kernel(pb: int, width: int, K: int, k_stride: int, t0: int):
    rpr = 128 // width

    def kernel(starts_ref, lanes_ref, vals_ref, x_ref, seg_ref, y_ref):
        i = pl.program_id(0) + t0
        lanes = lanes_ref[0].reshape(pb * 8, 128).astype(jnp.int32)
        vals = vals_ref[0].reshape(pb * 8, 128)
        hi = jax.lax.shift_right_logical(lanes, jnp.int32(7))   # slot id
        lo = jnp.bitwise_and(lanes, jnp.int32(127))         # window lane
        # NOTE on the kernel shape: Mosaic's gather lowering accepts
        # take_along_axis ONLY when indices.shape == operand.shape (a
        # same-shape 128-lane crossbar; _gather_lowering_rule asserts
        # this). A "single K*128-wide gather per row group" variant was
        # tried and cannot lower on real TPUs — the K separate
        # 128-wide gathers + masked multiply-adds below are the
        # hardware-supported formulation, and K itself is structural
        # (a 7-point stencil row touches ~5-7 distinct 128-aligned
        # x-blocks no matter how rows are packed).
        rows = []
        for qq in range(pb):
            hi_q = hi[qq * 8:(qq + 1) * 8]
            lo_q = lo[qq * 8:(qq + 1) * 8]
            vq = vals[qq * 8:(qq + 1) * 8]
            # select the gathered x into one accumulator (every lane
            # belongs to exactly one slot), multiply by vals ONCE after
            # the loop: the window sweep is VPU-op bound, and this drops
            # its per-window cost from cmp+sel+mul+add to cmp+sel
            xsel = None
            for k in range(K):
                w0 = pl.multiple_of(
                    starts_ref[(i * pb + qq) * k_stride + k] * 128, 128)
                win = x_ref[0, pl.ds(w0, 128)]
                op = jnp.broadcast_to(win[None, :], (8, 128))
                g = jnp.take_along_axis(op, lo_q, axis=1)
                xsel = g if xsel is None else jnp.where(hi_q == k, g, xsel)
            rows.append(vq * xsel)
        prod = jnp.concatenate(rows, axis=0)
        # one batched in-lane segmented reduce (HIGHEST: bf16 input
        # rounding would corrupt f32 values)
        y = jax.lax.dot_general(
            prod, seg_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=prod.dtype)
        y_ref[0] = y.reshape(pb, 8, rpr)

    return kernel


def _chain_pad(packed: WSELL) -> int:
    """Padded vector length of spmv_wsell_chain (input and output)."""
    return max(packed.rows_padded, -(-packed.n_cols // 128) * 128 + 128)


def spmv_wsell_chain(packed: WSELL, x_pad):
    """y_pad = A @ x_pad with no per-call pad/slice copies.

    x_pad: (_chain_pad(packed),) with x in [0, n_cols) and ZEROS beyond;
    returns the padded y of the same length (rows beyond n_rows are 0 by
    construction: their vals are 0), so iterative solvers can chain
    matvecs directly. One grid step = one tile of `ppt` packs, one
    pallas_call per K-group, each fully unrolled so Mosaic
    double-buffers the entry DMA against the gather compute."""
    pb = packed.ppt
    rpr = 128 // packed.width
    n_pad = _chain_pad(packed)
    seg = jnp.asarray(_segment_matrix(packed.width), x_pad.dtype)
    pieces = []
    t0 = 0
    for (cnt, K_g) in packed.groups:
        base = t0

        def mk(base):
            return lambda i, *_: (i + base, 0, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cnt,),
            in_specs=[
                pl.BlockSpec((1, pb, 8, 128), mk(base)),
                pl.BlockSpec((1, pb, 8, 128), mk(base)),
                pl.BlockSpec((1, n_pad), lambda i, *_: (0, 0)),
                pl.BlockSpec((128, rpr), lambda i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, pb, 8, rpr),
                                   lambda i, *_: (i, 0, 0, 0)),
        )
        pieces.append(pl.pallas_call(
            _wsell_kernel(pb, packed.width, K_g, packed.k, base),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cnt, pb, 8, rpr), x_pad.dtype),
        )(packed.starts, packed.lanes, packed.vals, x_pad[None, :],
          seg).reshape(-1))
        t0 += cnt
    y = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    if n_pad > packed.rows_padded:        # rectangular: keep lengths equal
        y = jnp.concatenate(
            [y, jnp.zeros((n_pad - packed.rows_padded,), y.dtype)])
    return y


def spmv_wsell(packed: WSELL, x):
    """y = A @ x with the general WSELL-K Pallas kernel. x: (n_cols,)."""
    n_pad = _chain_pad(packed)
    x_pad = jnp.zeros((n_pad,), x.dtype).at[: packed.n_cols].set(x)
    return spmv_wsell_chain(packed, x_pad)[: packed.n_rows]
