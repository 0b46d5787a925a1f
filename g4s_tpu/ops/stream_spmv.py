"""Streaming SpMV for unstructured patterns: expand -> route -> reduce.

y = A @ x for patterns with no usable structure (uniform random, RMAT
power-law skew) — the shapes where gather-based layouts collapse: XLA's
serial gather runs ~0.5 GB/s and the WSELL window kernel needs more
distinct x windows per pack than fit (ops/pallas_spmv.py raises).

The TPU answer is to do the SpMV with *no gathers at all*:

  1. expand  columns are grouped by width class (degree rounded up a
             geometric ladder) at plan-build time. x is routed once by a
             SMALL static permutation (ops/route.py, length n_cols) into
             class-compact order; each class's values then broadcast to
             their entry slots as a lane-aligned (1, c) * (L, c)
             elementwise multiply with the values pre-laid-out
             COLUMN-MAJOR per class — no big permute, no log-doubling
             fill stages, no ragged-width lane relayouts.
  2. route   the one irreducible data movement: the product stream moves
             from column-grouped to row-grouped order through a single
             static Clos/Benes routing plan over the padded stream.
  3. reduce  per-slice (width, rows) COLUMN-MAJOR sums — w-1 contiguous
             vector adds per slice, no lane shuffles (rows sorted by
             degree, ladder widths — the BIN.h:100-122 balancing idea
             applied to slots), then a small static permutation un-sorts
             the rows.

Everything data-dependent was compiled offline into the routing plans
and the class layout; the device executes only butterfly stages,
transposes, elementwise ops and sums. Role parity: the reference handles
these matrices with hash tables + AVX gathers (mm/inc/hash_mult.h:
111-492, radix re-bucketing radix_sort.h); on TPU the static-schedule
equivalent wins because dynamic gathers don't vectorize.

Power-law skew (RMAT/G500) adds a hub split: columns/rows whose degree
exceeds ~8x the mean leave the stream and run as small dense MXU
matmuls (y += A[:, hubc] @ x[hubc]; y[hubr] += A_nohubc[hubr, :] @ x).
The effective cost of a stream slot is far above its 16 raw bytes —
every slot rides ~13 butterfly stages of the Clos route plus the
ladder-class padding that heavy hubs inflate for everyone else — so
extraction pays well below the naive d > n/4 dense break-even: measured
on a scale-17 RMAT (max_deg 9945 ~ n/13), splitting the top 128
columns + 128 rows made the whole SpMV 3.4x faster (4.78 -> 1.42 ms)
and the plan build 6x faster (smaller padded stream, fewer classes).

(The first version of this module placed x into run-head slots with a
second full-size permute and broadcast it down runs with ceil(log2(max
col degree)) masked rolls over the whole stream; the class-compact
layout removes both, roughly halving device time and plan-build time.)
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops.route import (MAX_M, TILE, PermutePlan, apply_permute,
                               apply_permute_np, build_permute_plan)


def _static():
    return field(metadata=dict(static=True))


def _ladder_up(deg: np.ndarray) -> np.ndarray:
    """Round degrees up to the next rung of a geometric ladder
    {1, 2, 3, 4, 6, 8, 12, 16, ...} (pow2 and 1.5*pow2): padding waste
    <= 4/3 instead of pow2's 2x, at ~2x the class count."""
    deg = np.maximum(deg, 1)
    p = 2 ** np.ceil(np.log2(deg)).astype(np.int64)          # pow2 >= deg
    three_q = (3 * p) // 4                                   # 1.5 * p/2
    return np.where((deg <= three_q) & (p > 2), three_q, p)


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class StreamPlan:
    """Static schedule for one matrix; apply with spmv_stream(plan, x)."""

    xplan: PermutePlan        # x (padded) -> class-compact column order
    vals_e: jax.Array         # (m,) values in expand-space order (0 pads)
    route2: PermutePlan       # expand-space slots -> row-binned slots
    rowplan: PermutePlan      # sorted-row order -> original row order
    # hub split (None when the pattern has no heavy hubs)
    hub_cols: jax.Array | None      # (n_hub_c,) int32 column ids
    hub_dense_c: jax.Array | None   # (n_rows, n_hub_c) A[:, hub_cols]
    hub_rows: jax.Array | None      # (n_hub_r,) int32 row ids
    hub_dense_r: jax.Array | None   # (n_hub_r, n_cols) minus hub cols
    col_classes: Tuple[Tuple[int, int, int, int], ...] = _static()
    # each (n_cols_in_class, width L, expand offset, compact-x offset)
    slices: Tuple[Tuple[int, int, int], ...] = _static()  # (rows, w, off)
    n_rows: int = _static()
    n_cols: int = _static()
    m: int = _static()        # padded stream length (route2 space)
    nc_pad: int = _static()   # xplan length (n_cols padded)
    nr_pad: int = _static()   # rowplan length (n_rows padded)


def _identity_fill(sigma: np.ndarray, used_src: np.ndarray) -> np.ndarray:
    """Complete a partial permutation: dests marked -1 receive the unused
    sources in order (any bijection works; these lanes carry pads)."""
    free_dst = np.nonzero(sigma < 0)[0]
    sigma[free_dst] = np.nonzero(~used_src)[0][: free_dst.size]
    return sigma


def _extract_hubs(sp_a, n_rows, n_cols):
    """Pull heavy hub columns/rows out of the matrix for the dense MXU
    path. Returns (remainder_csr, hub_cols, Dc, hub_rows, Dr), hubs None
    when no degree exceeds 8x the mean (or 256). Dense blocks are capped
    at 64 MB each (at most 512 hubs per side)."""
    import scipy.sparse as sps
    coo = sp_a.tocoo()
    r = coo.row.astype(np.int64)
    c = coo.col.astype(np.int64)
    v = coo.data
    nnz = r.size
    hub_cols = Dc = hub_rows = Dr = None
    if nnz == 0:
        return sp_a, hub_cols, Dc, hub_rows, Dr
    keep = np.ones(nnz, bool)
    esize = max(int(np.dtype(v.dtype).itemsize), 4)
    col_deg = np.bincount(c, minlength=n_cols)
    thr_c = max(256, (8 * nnz) // max(n_cols, 1))
    cap_c = min(512, max(1, (64 << 20) // (esize * max(n_rows, 1))))
    cand = np.nonzero(col_deg >= thr_c)[0]
    if cand.size:
        cand = cand[np.argsort(-col_deg[cand], kind="stable")][:cap_c]
        hub_cols = np.sort(cand)
        in_hc = np.zeros(n_cols, bool)
        in_hc[hub_cols] = True
        sel = in_hc[c]
        pos = np.zeros(n_cols, np.int64)
        pos[hub_cols] = np.arange(hub_cols.size)
        # bincount on a flat index is ~10x np.add.at (no per-element
        # fancy-index dispatch); the temp is <= 2x the capped dense block
        Dc = np.bincount(r[sel] * hub_cols.size + pos[c[sel]],
                         weights=v[sel],
                         minlength=n_rows * hub_cols.size) \
            .reshape(n_rows, hub_cols.size).astype(v.dtype)
        keep &= ~sel
    row_deg = np.bincount(r[keep], minlength=n_rows)
    thr_r = max(256, (8 * nnz) // max(n_rows, 1))
    cap_r = min(512, max(1, (64 << 20) // (esize * max(n_cols, 1))))
    cand = np.nonzero(row_deg >= thr_r)[0]
    if cand.size:
        cand = cand[np.argsort(-row_deg[cand], kind="stable")][:cap_r]
        hub_rows = np.sort(cand)
        in_hr = np.zeros(n_rows, bool)
        in_hr[hub_rows] = True
        sel = in_hr[r] & keep
        pos = np.zeros(n_rows, np.int64)
        pos[hub_rows] = np.arange(hub_rows.size)
        Dr = np.bincount(pos[r[sel]] * n_cols + c[sel], weights=v[sel],
                         minlength=hub_rows.size * n_cols) \
            .reshape(hub_rows.size, n_cols).astype(v.dtype)
        keep &= ~sel
    if hub_cols is None and hub_rows is None:
        return sp_a, None, None, None, None
    rem = sps.csr_matrix((v[keep], (r[keep], c[keep])),
                         shape=(n_rows, n_cols))
    return rem, hub_cols, Dc, hub_rows, Dr


def build_stream_plan(a, *, hub_split: bool = True) -> StreamPlan:
    """Compile the streaming schedule for a CSR matrix (host-side, once
    per pattern — the analog of the reference's symbolic phase)."""
    sp_a = a.to_scipy().tocsr() if hasattr(a, "to_scipy") else a.tocsr()
    n_rows, n_cols = sp_a.shape
    hub_cols = Dc = hub_rows = Dr = None
    if hub_split:
        sp_a, hub_cols, Dc, hub_rows, Dr = _extract_hubs(
            sp_a, n_rows, n_cols)
    csc = sp_a.tocsc()
    csc.sort_indices()
    nnz = csc.nnz
    col_deg = np.diff(csc.indptr).astype(np.int64)

    # ---- expand side: columns grouped by ladder width class ----------
    live = np.nonzero(col_deg > 0)[0]
    Lc = _ladder_up(col_deg[live])
    order_c = np.argsort(Lc, kind="stable")          # class-major columns
    cols_sorted = live[order_c]
    L_sorted = Lc[order_c]

    col_classes = []
    # per original column: its expand-block start and compact-x slot.
    # Class blocks are laid out COLUMN-MAJOR, (L, c): entry rank j of the
    # class's i-th column sits at eoff + j*c + i. The expand broadcast is
    # then a lane-aligned (1, c) * (L, c) multiply and the row-side
    # reduce a sum over contiguous rows — no ragged-width lane relayouts
    # (the row-major (c, L) layout cost ~1.25 ms of the 1.83 ms RMAT
    # SpMV in XLA relayout copies).
    col_eoff = np.zeros(n_cols, np.int64)
    col_cls_c = np.ones(n_cols, np.int64)    # class width c per column
    pos_e = 0
    pos_x = 0
    i = 0
    while i < cols_sorted.size:
        L = int(L_sorted[i])
        j = i
        while j < cols_sorted.size and L_sorted[j] == L:
            j += 1
        c = j - i
        col_classes.append((c, L, pos_e, pos_x))
        col_eoff[cols_sorted[i:j]] = pos_e + np.arange(c)
        col_cls_c[cols_sorted[i:j]] = c
        pos_e += c * L
        pos_x += c
        i = j
    m_e = pos_e
    n_live = pos_x

    # ---- row-binned destination layout -------------------------------
    row_deg = np.diff(sp_a.indptr).astype(np.int64)
    row_sort = np.argsort(-row_deg, kind="stable")
    widths = _ladder_up(row_deg[row_sort])
    slices = []
    # column-major slice layout (w, nr): rank j of slice-row i sits at
    # pos + j*nr + i, so the reduce is a sum over contiguous rows
    slot_of_row = np.empty(n_rows, np.int64)   # first slot of each row
    row_slice_nr = np.ones(n_rows, np.int64)   # slice height nr per row
    pos = 0
    i = 0
    while i < n_rows:
        w = int(widths[i])
        j = i
        while j < n_rows and widths[j] == w:
            j += 1
        slices.append((j - i, w, pos))
        slot_of_row[row_sort[i:j]] = pos + np.arange(j - i)
        row_slice_nr[row_sort[i:j]] = j - i
        pos += (j - i) * w
        i = j
    m_r = pos

    m = -(-max(m_e, m_r, 1) // TILE) * TILE
    if m > MAX_M:
        raise NotImplementedError(
            f"padded stream {m} exceeds the routing-plan limit {MAX_M}")

    # ---- expand-space values + entry positions -----------------------
    # entry k (column-sorted order) of column j, rank r in the column,
    # sits at col_eoff[j] + r
    rank_c = (np.arange(nnz, dtype=np.int64)
              - np.repeat(csc.indptr[:-1].astype(np.int64), col_deg))
    cols_of = np.repeat(np.arange(n_cols, dtype=np.int64), col_deg)
    epos = col_eoff[cols_of] + rank_c * col_cls_c[cols_of]
    vals_e = np.zeros(m, sp_a.dtype)
    vals_e[epos] = csc.data

    # ---- xplan: original x -> class-compact order ---------------------
    nc_pad = -(-max(n_cols, 1) // TILE) * TILE
    sigma_x = np.full(nc_pad, -1, np.int64)
    sigma_x[:n_live] = cols_sorted           # compact slot i <- column
    used = np.zeros(nc_pad, bool)
    used[cols_sorted] = True
    sigma_x = _identity_fill(sigma_x, used)

    # ---- route2: expand-space slot -> row-binned slot ------------------
    rows_cs = csc.indices.astype(np.int64)   # row of each col-sorted entry
    order_r = np.argsort(rows_cs, kind="stable")
    rank_r = np.empty(nnz, np.int64)
    rank_r[order_r] = (np.arange(nnz, dtype=np.int64)
                       - np.repeat(sp_a.indptr[:-1].astype(np.int64),
                                   row_deg))
    dest = slot_of_row[rows_cs] + rank_r * row_slice_nr[rows_cs]
    sigma2 = np.full(m, -1, np.int64)
    sigma2[dest] = epos
    used2 = np.zeros(m, bool)
    used2[epos] = True
    sigma2 = _identity_fill(sigma2, used2)

    # ---- rowplan: sorted-row y -> original row order -------------------
    nr_pad = -(-max(n_rows, 1) // TILE) * TILE
    inv_sort = np.empty(n_rows, np.int64)
    inv_sort[row_sort] = np.arange(n_rows, dtype=np.int64)
    sigma_r = np.concatenate(
        [inv_sort, np.arange(n_rows, nr_pad, dtype=np.int64)])

    return StreamPlan(
        build_permute_plan(sigma_x), jnp.asarray(vals_e),
        build_permute_plan(sigma2), build_permute_plan(sigma_r),
        None if hub_cols is None else jnp.asarray(hub_cols, jnp.int32),
        None if Dc is None else jnp.asarray(Dc),
        None if hub_rows is None else jnp.asarray(hub_rows, jnp.int32),
        None if Dr is None else jnp.asarray(Dr),
        tuple(col_classes), tuple(slices), n_rows, n_cols, m,
        nc_pad, nr_pad)


def _expand(plan: StreamPlan, xc, xp):
    """Products in expand-space order: per class, broadcast the compact
    x values over the class's (c, L) value block. `xp` is the backend's
    zeros/pad constructor (jnp or np)."""
    parts = []
    for c, L, eoff, xoff in plan.col_classes:
        seg = xc[xoff: xoff + c]
        blk = plan.vals_e[eoff: eoff + c * L].reshape(L, c)
        parts.append((seg[None, :] * blk).reshape(-1))
    m_e = (plan.col_classes[-1][2]
           + plan.col_classes[-1][0] * plan.col_classes[-1][1]) \
        if plan.col_classes else 0
    prod = xp.concatenate(parts) if parts else xp.zeros((0,), xc.dtype)
    if m_e < plan.m:
        prod = xp.concatenate(
            [prod, xp.zeros((plan.m - m_e,), prod.dtype)])
    return prod


def spmv_stream(plan: StreamPlan, x):
    """y = A @ x through the gather-free streaming schedule."""
    xpad = jnp.zeros((plan.nc_pad,), x.dtype).at[: plan.n_cols].set(x)
    xc = apply_permute(plan.xplan, xpad)
    t = apply_permute(plan.route2, _expand(plan, xc, jnp))
    parts = []
    for nr, w, o in plan.slices:
        parts.append(t[o: o + nr * w].reshape(w, nr).sum(axis=0))
    y_sorted = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    ypad = jnp.zeros((plan.nr_pad,), y_sorted.dtype) \
        .at[: plan.n_rows].set(y_sorted)
    y = apply_permute(plan.rowplan, ypad)[: plan.n_rows]
    if plan.hub_cols is not None:
        y = y + plan.hub_dense_c.astype(y.dtype) \
            @ jnp.take(x, plan.hub_cols, axis=0)
    if plan.hub_rows is not None:
        y = y.at[plan.hub_rows].add(plan.hub_dense_r.astype(y.dtype) @ x)
    return y


def spmv_stream_np(plan: StreamPlan, x: np.ndarray) -> np.ndarray:
    """Numpy oracle for the staged schedule (tests)."""
    class _NP:
        concatenate = staticmethod(np.concatenate)

        @staticmethod
        def zeros(shape, dtype):
            return np.zeros(shape, dtype)

    xpad = np.zeros(plan.nc_pad, x.dtype)
    xpad[: plan.n_cols] = x
    xc = apply_permute_np(plan.xplan, xpad)
    plan_np = dataclasses.replace(plan, vals_e=np.asarray(plan.vals_e))
    t = apply_permute_np(plan.route2, _expand(plan_np, xc, _NP))
    parts = [t[o: o + nr * w].reshape(w, nr).sum(axis=0)
             for nr, w, o in plan.slices]
    y_sorted = np.concatenate(parts)
    ypad = np.zeros(plan.nr_pad, y_sorted.dtype)
    ypad[: plan.n_rows] = y_sorted
    y = apply_permute_np(plan.rowplan, ypad)[: plan.n_rows]
    if plan.hub_cols is not None:
        hc = np.asarray(plan.hub_cols)
        y = y + np.asarray(plan.hub_dense_c, y.dtype) @ x[hc]
    if plan.hub_rows is not None:
        hr = np.asarray(plan.hub_rows)
        y[hr] += np.asarray(plan.hub_dense_r, y.dtype) @ x
    return y
