"""Streaming SpMV for unstructured patterns: expand -> route -> reduce.

y = A @ x for patterns with no usable structure (uniform random, RMAT
power-law skew) — the shapes where gather-based layouts collapse: XLA's
serial gather runs ~0.5 GB/s and the WSELL window kernel needs more
distinct x windows per pack than fit (ops/pallas_spmv.py raises).

The TPU answer is to do the SpMV with *no gathers at all*:

  1. expand  x is routed (ops/route.py Clos/Benes plan) to the run-head
             slot of every column's entry run in the column-sorted entry
             stream, then a log-doubling segmented fill broadcasts each
             head down its run: s_fill = ceil(log2(max col degree))
             masked static rolls.
  2. multiply elementwise by the values, pre-permuted into column-sorted
             slot order at plan build (pads hold 0).
  3. route   the product stream through a second static plan into a
             row-binned padded layout (rows sorted by degree, geometric
             widths — the BIN.h:100-122 balancing idea applied to slots).
  4. reduce  per-slice (rows, width) lane sums + one small un-permute.

Everything data-dependent was compiled offline into the two routing
plans and the fill offsets; the device executes only butterfly stages,
transposes, elementwise ops and sums. Role parity: the reference handles
these matrices with hash tables + AVX gathers (mm/inc/hash_mult.h:
111-492, radix re-bucketing radix_sort.h); on TPU the static-schedule
equivalent wins because dynamic gathers don't vectorize.
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
                               build_permute_plan)


def _static():
    return field(metadata=dict(static=True))


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class StreamPlan:
    """Static schedule for one matrix; apply with spmv_stream(plan, x)."""

    place: PermutePlan        # x (padded to M) -> column run-head slots
    off: jax.Array            # (M,) int32: offset within the entry run
    vals_cs: jax.Array        # (M,) values in column-sorted order (0 pads)
    route2: PermutePlan       # column-sorted slots -> row-binned slots
    row_sort: jax.Array       # (n_rows,) sorted-row index -> original row
    slices: Tuple[Tuple[int, int, int], ...] = _static()  # (rows, w, off)
    n_rows: int = _static()
    n_cols: int = _static()
    m: int = _static()        # padded stream length (both spaces)
    s_fill: int = _static()   # fill stages = ceil(log2(max col degree))


def build_stream_plan(a) -> StreamPlan:
    """Compile the streaming schedule for a CSR matrix (host-side, once
    per pattern — the analog of the reference's symbolic phase)."""
    sp_a = a.to_scipy().tocsr() if hasattr(a, "to_scipy") else a.tocsr()
    n_rows, n_cols = sp_a.shape
    csc = sp_a.tocsc()
    csc.sort_indices()
    nnz = csc.nnz
    col_deg = np.diff(csc.indptr).astype(np.int64)
    rows_cs = csc.indices.astype(np.int64)     # row of each col-sorted entry

    # ---- row-binned destination layout -------------------------------
    row_deg = np.diff(sp_a.indptr).astype(np.int64)
    row_sort = np.argsort(-row_deg, kind="stable")
    deg_sorted = row_deg[row_sort]
    widths = np.maximum(1, 2 ** np.ceil(
        np.log2(np.maximum(deg_sorted, 1))).astype(np.int64))
    slices = []
    slot_of_row = np.empty(n_rows, np.int64)   # first slot of each row
    w_of_row = np.empty(n_rows, np.int64)
    pos = 0
    i = 0
    while i < n_rows:
        w = int(widths[i])
        j = i
        while j < n_rows and widths[j] == w:
            j += 1
        slices.append((j - i, w, pos))
        slot_of_row[row_sort[i:j]] = pos + np.arange(j - i) * w
        w_of_row[row_sort[i:j]] = w
        pos += (j - i) * w
        i = j
    m_r = pos

    m = -(-max(nnz, m_r, n_cols) // TILE) * TILE
    if m > MAX_M:
        raise NotImplementedError(
            f"padded stream {m} exceeds the routing-plan limit {MAX_M}")

    # ---- expansion side ----------------------------------------------
    # place: run-head slot of column j = csc.indptr[j]
    heads = csc.indptr[:-1][col_deg > 0].astype(np.int64)
    live_cols = np.nonzero(col_deg > 0)[0].astype(np.int64)
    sigma_place = np.full(m, -1, np.int64)
    sigma_place[heads] = live_cols
    free_dst = np.nonzero(sigma_place < 0)[0]
    used = np.zeros(m, bool)
    used[live_cols] = True
    sigma_place[free_dst] = np.nonzero(~used)[0][: free_dst.size]

    off = np.zeros(m, np.int32)
    off[:nnz] = (np.arange(nnz, dtype=np.int64)
                 - np.repeat(csc.indptr[:-1].astype(np.int64), col_deg))
    s_fill = int(np.ceil(np.log2(max(int(col_deg.max(initial=1)), 1) or 1))) \
        if col_deg.size and col_deg.max(initial=0) > 1 else 0

    vals_cs = np.zeros(m, sp_a.dtype)
    vals_cs[:nnz] = csc.data

    # ---- routing to row slots ----------------------------------------
    # col-sorted entry k belongs to row rows_cs[k]; its rank within the
    # row (in column order) is its position among equal rows_cs
    order_r = np.argsort(rows_cs, kind="stable")
    rank = np.empty(nnz, np.int64)
    rank[order_r] = (np.arange(nnz, dtype=np.int64)
                     - np.repeat(sp_a.indptr[:-1].astype(np.int64), row_deg))
    dest = slot_of_row[rows_cs] + rank
    sigma2 = np.full(m, -1, np.int64)
    sigma2[dest] = np.arange(nnz, dtype=np.int64)
    free2 = np.nonzero(sigma2 < 0)[0]
    used2 = np.zeros(m, bool)
    used2[:nnz] = True
    sigma2[free2] = np.nonzero(~used2)[0][: free2.size]

    return StreamPlan(
        build_permute_plan(sigma_place), jnp.asarray(off),
        jnp.asarray(vals_cs), build_permute_plan(sigma2),
        jnp.asarray(row_sort.astype(np.int32)),
        tuple(slices), n_rows, n_cols, m, s_fill)


def _fill(s, off, s_fill):
    """Log-doubling segmented broadcast: after stage t, slot k holds the
    value of slot k - (off[k] mod 2^(t+1)); after all stages, its run
    head. Bit t of off selects a static roll by 2^t (cyclic wrap is
    harmless: the bit is only set when k >= 2^t)."""
    for t in range(s_fill):
        mask = jnp.bitwise_and(
            jax.lax.shift_right_logical(off, jnp.int32(t)), 1) != 0
        s = jnp.where(mask, jnp.roll(s, 1 << t), s)
    return s


def spmv_stream(plan: StreamPlan, x):
    """y = A @ x through the gather-free streaming schedule."""
    xp = jnp.zeros((plan.m,), x.dtype).at[: plan.n_cols].set(x)
    s = apply_permute(plan.place, xp)
    s = _fill(s, plan.off, plan.s_fill)
    t = apply_permute(plan.route2, s * plan.vals_cs)
    parts = []
    for nr, w, o in plan.slices:
        parts.append(t[o: o + nr * w].reshape(nr, w).sum(axis=1))
    y_sorted = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return jax.lax.sort_key_val(plan.row_sort, y_sorted)[1]


def spmv_stream_np(plan: StreamPlan, x: np.ndarray) -> np.ndarray:
    """Numpy oracle for the staged schedule (tests)."""
    from g4s_tpu.ops.route import apply_permute_np
    xp = np.zeros(plan.m, x.dtype)
    xp[: plan.n_cols] = x
    s = apply_permute_np(plan.place, xp)
    off = np.asarray(plan.off)
    for t in range(plan.s_fill):
        mask = ((off >> np.int32(t)) & 1) != 0
        s = np.where(mask, np.roll(s, 1 << t), s)
    t_ = apply_permute_np(plan.route2, s * np.asarray(plan.vals_cs))
    parts = [t_[o: o + nr * w].reshape(nr, w).sum(axis=1)
             for nr, w, o in plan.slices]
    y_sorted = np.concatenate(parts)
    y = np.empty(plan.n_rows, y_sorted.dtype)
    y[np.asarray(plan.row_sort)] = y_sorted
    return y
