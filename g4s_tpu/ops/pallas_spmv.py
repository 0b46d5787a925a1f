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
# sublane broadcast, one full-width take_along_axis, one select-add —
# all register-resident, no scratch staging. This is the TPU replacement
# for the reference's AVX2/512 gather loops (mm/inc/hash_mult.h:111-492)
# on patterns with no single-window structure.
#
# Memory traffic stays 8 bytes per stored lane (4B loc + 4B value) + x/y.
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class WSELL:
    """Packed K-windowed ELL operator."""

    starts: jax.Array    # (n_packs_pad*K,) int32 aligned block ids, flat
                         # (2-D SMEM operands are lane-padded to 128 —
                         # flat 1-D keeps the prefetch under the 1 MiB SMEM)
    lanes: jax.Array     # (n_tiles, PPT, 8, 128) int32: slot*128 + offset
    vals: jax.Array      # (n_tiles, PPT, 8, 128) dtype
    width: int = _static()        # W, padded entries/row, divides 128
    n_rows: int = _static()
    n_cols: int = _static()
    ppt: int = _static()          # packs per tile
    k: int = _static()            # window slots per pack
    shape: Tuple[int, int] = _static()

    @property
    def rows_per_pack(self) -> int:
        return 8 * (128 // self.width)


def pack_wsell(a: CSR, *, width: Optional[int] = None,
               packs_per_tile: int = 64, k_max: int = 32,
               dtype=jnp.float32) -> WSELL:
    """Host-side packer: choose W from the max degree, group rows into
    packs of 8*(128/W), and assign each pack the sorted set of distinct
    128-aligned x-blocks its columns touch. Raises ValueError when any
    pack needs more than k_max windows (caller falls back)."""
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

    rpp = 8 * (128 // width)
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

    lanes8 = loc.reshape(n_packs_pad, 8, 128).astype(np.int32)
    vals8 = vals.reshape(n_packs_pad, 8, 128)
    return WSELL(
        jnp.asarray(starts.astype(np.int32).reshape(-1)),
        jnp.asarray(lanes8.reshape(n_tiles, packs_per_tile, 8, 128)),
        jnp.asarray(vals8.reshape(n_tiles, packs_per_tile, 8, 128), dtype),
        width, n_rows, n_cols, packs_per_tile, K, a.shape)


def _wsell_kernel(pb: int, width: int, K: int):
    rpr = 128 // width

    def kernel(starts_ref, lanes_ref, vals_ref, x_ref, seg_ref, y_ref):
        i = pl.program_id(0)
        lanes = lanes_ref[0].reshape(pb * 8, 128)
        vals = vals_ref[0].reshape(pb * 8, 128)
        hi = jax.lax.shift_right_logical(lanes, jnp.int32(7))   # slot id
        lo = jnp.bitwise_and(lanes, jnp.int32(127))         # window lane
        # NOTE on the kernel shape: Mosaic's gather lowering accepts
        # take_along_axis ONLY when indices.shape == operand.shape (a
        # same-shape 128-lane crossbar; _gather_lowering_rule asserts
        # this). A "single K*128-wide gather per row group" variant was
        # tried and cannot lower on real TPUs — the K separate
        # 128-wide gathers + overwrite-selects below are the
        # hardware-supported formulation, and K itself is structural
        # (a 7-point stencil row touches ~5-7 distinct 128-aligned
        # x-blocks no matter how rows are packed).
        rows = []
        for qq in range(pb):
            hi_q = hi[qq * 8:(qq + 1) * 8]
            lo_q = lo[qq * 8:(qq + 1) * 8]
            acc = jnp.zeros((8, 128), vals.dtype)
            for k in range(K):
                w0 = pl.multiple_of(
                    starts_ref[(i * pb + qq) * K + k] * 128, 128)
                win = x_ref[0, pl.ds(w0, 128)]
                op = jnp.broadcast_to(win[None, :], (8, 128))
                g = jnp.take_along_axis(op, lo_q, axis=1)
                # overwrite-select: every lane belongs to exactly one slot
                acc = jnp.where(hi_q == k, g, acc)
            rows.append(vals[qq * 8:(qq + 1) * 8] * acc)
        prod = jnp.concatenate(rows, axis=0)
        # one batched in-lane segmented reduce (HIGHEST: bf16 input
        # rounding would corrupt f32 values)
        y = jax.lax.dot_general(
            prod, seg_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=prod.dtype)
        y_ref[0] = y.reshape(pb, 8, rpr)

    return kernel


def spmv_wsell(packed: WSELL, x):
    """y = A @ x with the general WSELL-K Pallas kernel. x: (n_cols,).

    One grid step = one tile of `ppt` packs, fully unrolled in the kernel
    so Mosaic double-buffers the entry DMA against the gather compute."""
    n_tiles = packed.lanes.shape[0]
    pb = packed.ppt
    rpr = 128 // packed.width
    # pad x to a multiple of 128 plus one guard block
    n_pad = -(-packed.n_cols // 128) * 128 + 128
    x_pad = jnp.zeros((n_pad,), x.dtype).at[: packed.n_cols].set(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, pb, 8, 128), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, pb, 8, 128), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, n_pad), lambda i, *_: (0, 0)),
            pl.BlockSpec((128, rpr), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pb, 8, rpr), lambda i, *_: (i, 0, 0, 0)),
    )
    y = pl.pallas_call(
        _wsell_kernel(pb, packed.width, packed.k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, pb, 8, rpr), x.dtype),
    )(packed.starts, packed.lanes, packed.vals, x_pad[None, :],
      jnp.asarray(_segment_matrix(packed.width), x.dtype))
    return y.reshape(-1)[: packed.n_rows]
