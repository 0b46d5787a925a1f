"""Two-phase SpGEMM (C = A @ B) for TPU.

The reference explores three CPU algorithms — per-row hash accumulation
(mm/inc/hash_mult.h), k-way heap merge (mm/inc/heap_mult.h) and outer-product
expand/sort/merge (mm/inc/outer_mult.h) — all built on the same two-phase
symbolic/numeric structure: a symbolic pass sizes the output exactly, then the
numeric pass fills it (hash_mult.h:495-508, :558-608).

TPU has no scatter-probe memory, and XLA needs static shapes, so the rebuild
keeps the two-phase split but moves ALL structure discovery to a host-side
symbolic "plan" and makes the device numeric phase a single gather+multiply+
sorted-segment-sum with fully static shapes:

  symbolic (host, once per sparsity pattern):
    expand every elementary product a_ik * b_kj to a (product -> output slot)
    map, dedupe (row, col) keys, emit exact CSR structure of C.
  numeric (device, jit, reusable):
    c.data = segment_sum(A.data[src_a] * B.data[src_b], slot, nnz)

This mirrors how iterative apps reuse one sparsity pattern across many value
updates (CitcomS rebuilds elt_k values each Stokes solve but the incidence
graph is fixed), so the expensive phase amortizes exactly like the
reference's symbolic phase does.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops.segment import sorted_segment_sum
from g4s_tpu.sparse.containers import CSR


def _static():
    return field(metadata=dict(static=True))


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class SpGEMMPlan:
    """Symbolic-phase output: the product->slot map plus C's structure."""

    src_a: jax.Array        # (F,) product i uses A.data[src_a[i]]
    src_b: jax.Array        # (F,) ... and B.data[src_b[i]]
    slot: jax.Array         # (F,) sorted output slot of product i in C.data
    c_indptr: jax.Array     # (m+1,)
    c_indices: jax.Array    # (nnz_c,)
    flops: int = _static()  # multiply count F
    nnz: int = _static()
    shape: Tuple[int, int] = _static()

    def to_device(self) -> "SpGEMMPlan":
        return SpGEMMPlan(jnp.asarray(self.src_a), jnp.asarray(self.src_b),
                          jnp.asarray(self.slot), jnp.asarray(self.c_indptr),
                          jnp.asarray(self.c_indices), self.flops, self.nnz,
                          self.shape)


def spgemm_flops(a: CSR, b: CSR) -> int:
    """Multiply-add flop count = 2 * sum_k (nnz of A col k rows of B)
    (semantics of mm/inc/mkl_mult.h:8-38 compute_flop / hash_mult.h:46-62)."""
    deg_b = np.diff(np.asarray(b.indptr)).astype(np.int64)
    return int(2 * deg_b[np.asarray(a.indices)].sum())


def spgemm_plan(a: CSR, b: CSR, *, use_native: bool = True) -> SpGEMMPlan:
    """Symbolic phase (host): exact structure of C and the product->slot map.

    Uses the native C++ graph-builder (runtime/native) when available — the
    same role hash_mult.h's symbolic pass plays in the reference — with a
    vectorized numpy fallback.
    """
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    m, n = a.shape[0], b.shape[1]
    if use_native:
        from g4s_tpu.runtime.native_lib import spgemm_symbolic_native
        out = spgemm_symbolic_native(a.indptr, a.indices, b.indptr, b.indices,
                                     m, n)
        if out is not None:
            src_a, src_b, slot, c_rows, c_cols, nnz, F = out
            c_indptr = np.zeros(m + 1, dtype=np.int32)
            np.add.at(c_indptr, c_rows.astype(np.int64) + 1, 1)
            np.cumsum(c_indptr, out=c_indptr)
            idx_t = np.int32 if max(F, a.nnz, b.nnz, 1) < 2**31 else np.int64
            return SpGEMMPlan(src_a.astype(idx_t), src_b.astype(idx_t),
                              slot, c_indptr, c_cols.astype(np.int32),
                              F, nnz, (m, n))
    a_indptr = np.asarray(a.indptr).astype(np.int64)
    a_indices = np.asarray(a.indices).astype(np.int64)
    b_indptr = np.asarray(b.indptr).astype(np.int64)
    b_indices = np.asarray(b.indices).astype(np.int64)

    deg_a = np.diff(a_indptr)
    a_rows = np.repeat(np.arange(m, dtype=np.int64), deg_a)

    counts = (b_indptr[a_indices + 1] - b_indptr[a_indices])  # per-A-nnz expansion
    F = int(counts.sum())
    offsets = np.zeros(a_indices.size + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])

    src_a = np.repeat(np.arange(a_indices.size, dtype=np.int64), counts)
    # position within the expanded run + start of the B row
    src_b = (np.arange(F, dtype=np.int64)
             - np.repeat(offsets[:-1], counts)
             + np.repeat(b_indptr[a_indices], counts))

    rows = a_rows[src_a]
    cols = b_indices[src_b]
    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    src_a, src_b, key = src_a[order], src_b[order], key[order]

    uniq, slot = np.unique(key, return_inverse=True)
    nnz = int(uniq.size)
    c_rows = (uniq // n).astype(np.int64)
    c_indices = (uniq % n).astype(np.int32)
    c_indptr = np.zeros(m + 1, dtype=np.int32)
    np.add.at(c_indptr, c_rows + 1, 1)
    np.cumsum(c_indptr, out=c_indptr)

    idx_t = np.int32 if max(F, a.nnz, b.nnz, 1) < 2**31 else np.int64
    return SpGEMMPlan(src_a.astype(idx_t), src_b.astype(idx_t),
                      slot.astype(np.int32), c_indptr, c_indices,
                      F, nnz, (m, n))


def spgemm_numeric(a_data, b_data, plan: SpGEMMPlan):
    """Numeric phase (device, jit-safe): C.data from A.data/B.data values."""
    prod = jnp.take(a_data, plan.src_a) * jnp.take(b_data, plan.src_b)
    return sorted_segment_sum(prod, plan.slot, plan.nnz)


def spgemm(a: CSR, b: CSR, *, plan: SpGEMMPlan | None = None) -> CSR:
    """C = A @ B. Builds (or reuses) a symbolic plan, runs numeric on device."""
    if plan is None:
        plan = spgemm_plan(a, b)
    c_data = spgemm_numeric(jnp.asarray(a.data), jnp.asarray(b.data),
                            plan.to_device())
    return CSR(plan.c_indptr, plan.c_indices, c_data, plan.shape)


def spgemm_expand_map(a: CSR, b: CSR):
    """Light symbolic phase: ONLY the product expansion map (no host sort /
    dedupe). O(F) prefix-sum work, the flop-counting part of BIN
    (mm/inc/BIN.h:77-95) plus the expansion offsets."""
    a_indptr = np.asarray(a.indptr).astype(np.int64)
    a_indices = np.asarray(a.indices).astype(np.int64)
    b_indptr = np.asarray(b.indptr).astype(np.int64)
    m = a.shape[0]
    deg_a = np.diff(a_indptr)
    a_rows = np.repeat(np.arange(m, dtype=np.int64), deg_a)
    counts = b_indptr[a_indices + 1] - b_indptr[a_indices]
    F = int(counts.sum())
    offsets = np.zeros(a_indices.size + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    src_a = np.repeat(np.arange(a_indices.size, dtype=np.int64), counts)
    src_b = (np.arange(F, dtype=np.int64) - np.repeat(offsets[:-1], counts)
             + np.repeat(b_indptr[a_indices], counts))
    rows = a_rows[src_a]
    return src_a, src_b, rows, F


def _sort_merge_compact(key, val, F):
    """Sort (key, val), reduce equal-key runs, compact to the front.

    Duplicate merge runs as a Hillis-Steele segmented scan (log2(F)
    shift/select/add passes, ~3 ms at F = 8.4M) instead of a
    sorted-segment-sum + scatter (73 + 67 ms measured at the same F:
    XLA lowers both to serial-ish scatters on TPU, while shifts run at
    memory speed). Compaction reuses the sorter: run tails keep their
    key, every other slot is keyed to INT_MAX, and one more stable sort
    moves the merged entries to the front in key order. Output contract:
    keys sorted ascending over [0, nnz), -1 beyond; values merged."""
    key_s, val_s = jax.lax.sort((key, val), num_keys=1)
    v = val_s
    for p in range(max(int(F - 1).bit_length(), 1)):
        d = 1 << p
        if d >= F:
            break
        ks = jnp.concatenate([jnp.full((d,), -1, key_s.dtype), key_s[:-d]])
        vs = jnp.concatenate([jnp.zeros((d,), v.dtype), v[:-d]])
        v = v + jnp.where(key_s == ks, vs, jnp.zeros((), v.dtype))
    tail = jnp.concatenate([key_s[1:] != key_s[:-1],
                            jnp.ones((1,), bool)])
    nnz = jnp.sum(tail.astype(jnp.int32))
    pad = jnp.iinfo(key_s.dtype).max
    out_key = jnp.where(tail, key_s, pad)
    out_val = jnp.where(tail, v, jnp.zeros((), v.dtype))
    out_key, out_val = jax.lax.sort((out_key, out_val), num_keys=1)
    out_key = jnp.where(out_key == pad, jnp.array(-1, out_key.dtype),
                        out_key)
    return out_key, out_val, nnz


@partial(jax.jit, static_argnames=("F",))
def _device_merge_core(src_a, src_b, row_key, b_indices, a_data, b_data, F):
    cols = jnp.take(b_indices, src_b)
    key = row_key + cols
    val = jnp.take(a_data, src_a) * jnp.take(b_data, src_b)
    return _sort_merge_compact(key, val, F)


def spgemm_device_merge(a: CSR, b: CSR):
    """Expand/sort/merge SpGEMM with structure discovery ON DEVICE — the
    TPU analog of the reference's outer-product algorithm
    (mm/inc/outer_mult.h:271-535: expand elementary products to triples,
    radix-sort, merge duplicates). The host contributes only the O(F)
    expansion map; the sort (lax.sort -> TPU sort), duplicate merge
    (segment ops) and exact nnz all happen on device, in ONE jitted
    computation. Right choice when the sparsity pattern is not reused.

    Returns (keys, values, nnz): `keys` (F,) = row * n_cols + col sorted
    ascending with inactive slots = -1 beyond `nnz`; `values` (F,) merged.
    """
    src_a, src_b, rows, F = spgemm_expand_map(a, b)
    m, n = a.shape[0], b.shape[1]
    kt = np.int32 if m * n < 2**31 else np.int64
    return _device_merge_core(
        jnp.asarray(src_a.astype(kt)), jnp.asarray(src_b.astype(kt)),
        jnp.asarray((rows * n).astype(kt)),
        jnp.asarray(np.asarray(b.indices).astype(kt)),
        jnp.asarray(a.data), jnp.asarray(b.data), F)


def spgemm_via_csc(a: CSR, b: CSR) -> CSR:
    """Column-wise SpGEMM: process C column-by-column through the
    transposed operands, C = ((B^T)(A^T))^T.

    This is the TPU analog of the reference's HeapSpGEMM
    (mm/inc/heap_mult.h:47-223): that engine walks CSC columns of B and
    k-way-merges sorted column contributions; here the same column-major
    strategy is expressed as the row-wise two-phase engine applied to the
    transposes, and the final transpose restores row-major CSR with
    columns sorted by construction (the heap variant's selling point).
    """
    from g4s_tpu.sparse.containers import CSC
    from g4s_tpu.sparse.convert import csc_to_csr, csr_to_csc

    at = csr_to_csc(a)        # CSC of A == CSR of A^T (swapped shape)
    bt = csr_to_csc(b)
    a_t = CSR(bt.indptr, bt.indices, bt.data, (b.shape[1], b.shape[0]))
    b_t = CSR(at.indptr, at.indices, at.data, (a.shape[1], a.shape[0]))
    ct = spgemm(a_t, b_t)     # C^T as CSR
    cc = CSC(ct.indptr, ct.indices, np.asarray(ct.data),
             (b.shape[1], a.shape[0]))
    c = csc_to_csr(CSC(cc.indptr, cc.indices, cc.data,
                       (a.shape[0], b.shape[1])))
    return c


def spgemm_device_csr(a: CSR, b: CSR) -> CSR:
    """One-shot SpGEMM with DEVICE-side structure discovery: the
    expand/sort/merge kernel (spgemm_device_merge) finds C's sorted
    (row, col) keys and merged values on the TPU; only the final
    indptr/indices split happens on host. Use when the sparsity pattern
    is NOT reused (otherwise spgemm_plan amortizes the symbolic phase)."""
    keys, vals, nnz = spgemm_device_merge(a, b)
    keys = np.asarray(keys)[: int(nnz)]
    vals = np.asarray(vals)[: int(nnz)]
    m, n = a.shape[0], b.shape[1]
    rows = keys // n
    cols = keys % n
    indptr = np.zeros(m + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    np.cumsum(indptr, out=indptr)
    return CSR(indptr, cols.astype(np.int64), vals, (m, n))


def _bits_cols(x, it):
    """View a <=32-bit float array as an (n, 1) integer bit column of
    dtype `it` (f64 is never packed: TPU's X64 rewriting cannot lower a
    bitcast-convert that touches 64-bit floats)."""
    xb = jnp.dtype(x.dtype).itemsize
    u = jax.lax.bitcast_convert_type(
        x, jnp.dtype(f"uint{8 * xb}")).astype(it)
    return u[:, None]


def _bits_back(col, dtype, it):
    """Inverse of _bits_cols: (n,) bit column -> float array."""
    ut = jnp.dtype(f"uint{8 * jnp.dtype(dtype).itemsize}")
    return jax.lax.bitcast_convert_type(col.astype(ut), dtype)


@partial(jax.jit, static_argnames=("F", "n_cols"))
def _device_expand_merge(a_indptr, a_indices, a_data, b_indptr, b_indices,
                         b_data, F, n_cols):
    """Expand/sort/merge with the EXPANSION MAP built on device too.

    The host contributes only the static flop count F (one O(nnz) pass);
    everything else — per-product source indices, elementary products,
    sort, duplicate merge — runs on the TPU. This kills the cold-start
    cost of shipping an O(F) host-built map to the device (the round-2
    symbolic path moved ~25 bytes/flop over the host link; this moves
    only the CSR arrays).

    Gather discipline: dynamic gathers are the TPU's weak op (one
    F-sized scalar gather measured 55 ms at F = 8.4M, vs 0.3 ms for an
    elementwise pass), so each side's per-entry state — B-run start
    minus run offset, row key base, value bits — is packed into ONE
    (nnz, k) int record and fetched with a single row gather per side
    (44 ms for (F,3): cheaper than one scalar gather, 6x cheaper than
    the six separate gathers it replaces)."""
    nnz_a = a_indices.shape[0]
    m = a_indptr.shape[0] - 1
    it = a_indices.dtype
    deg_b = b_indptr[1:] - b_indptr[:-1]
    counts = jnp.take(deg_b, a_indices)                 # (nnz_a,)
    ends = jnp.cumsum(counts)
    starts = ends - counts
    pos = jnp.arange(F, dtype=it)
    # src_a[p] = which A-entry product p belongs to: scatter +1 at each
    # run head, cumsum. Empty runs stack their heads on one slot (add
    # keeps them all), so the cumsum skips them — two memory-bound
    # passes instead of searchsorted's log(nnz_a) binary-search gathers
    # over the flop stream.
    heads = jnp.zeros((F,), it).at[starts].add(1, mode="drop")
    src_a = jnp.cumsum(heads) - 1
    deg_a = a_indptr[1:] - a_indptr[:-1]
    a_rows = jnp.repeat(jnp.arange(m, dtype=it), deg_a,
                        total_repeat_length=nnz_a)
    pack = jnp.dtype(a_data.dtype).itemsize <= 4 \
        and jnp.dtype(b_data.dtype).itemsize <= 4
    base_b = jnp.take(b_indptr, a_indices) - starts
    key_a = a_rows * n_cols
    if pack:
        rec_a = jnp.concatenate(
            [base_b[:, None], key_a[:, None], _bits_cols(a_data, it)],
            axis=1)                                     # (nnz_a, 3)
        ga = jnp.take(rec_a, src_a, axis=0)             # ONE row gather
        src_b = pos + ga[:, 0]
        rec_b = jnp.concatenate(
            [b_indices[:, None], _bits_cols(b_data, it)], axis=1)
        gb = jnp.take(rec_b, src_b, axis=0)             # ONE row gather
        key = ga[:, 1] + gb[:, 0]
        val = (_bits_back(ga[:, 2], a_data.dtype, it)
               * _bits_back(gb[:, 1], b_data.dtype, it))
    else:   # 64-bit values: unpacked gathers (CPU-oracle path)
        src_b = pos + jnp.take(base_b, src_a)
        key = jnp.take(key_a, src_a) + jnp.take(b_indices, src_b)
        val = jnp.take(a_data, src_a) * jnp.take(b_data, src_b)
    return _sort_merge_compact(key, val, F)


def spgemm_device_full(a: CSR, b: CSR):
    """One-shot SpGEMM with both structure discovery AND product
    expansion on device. Host work: flop count + final CSR split.
    Returns (keys, values, nnz) like spgemm_device_merge. When a and b
    share their arrays (A @ A), each is shipped to the device once."""
    m, n = a.shape[0], b.shape[1]
    F = spgemm_flops(a, b) // 2
    kt = np.int32 if max(m * n, F, a.nnz, b.nnz) < 2**31 else np.int64
    a_ptr = jnp.asarray(np.asarray(a.indptr).astype(kt))
    a_idx = jnp.asarray(np.asarray(a.indices).astype(kt))
    a_dat = jnp.asarray(a.data)
    same = a.indptr is b.indptr and a.indices is b.indices \
        and a.data is b.data
    b_ptr = a_ptr if same else jnp.asarray(np.asarray(b.indptr).astype(kt))
    b_idx = a_idx if same else jnp.asarray(np.asarray(b.indices).astype(kt))
    b_dat = a_dat if same else jnp.asarray(b.data)
    return _device_expand_merge(a_ptr, a_idx, a_dat, b_ptr, b_idx, b_dat,
                                int(F), n)
