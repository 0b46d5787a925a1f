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


@partial(jax.jit, static_argnames=("F",))
def _device_merge_core(src_a, src_b, row_key, b_indices, a_data, b_data, F):
    cols = jnp.take(b_indices, src_b)
    key = row_key + cols
    val = jnp.take(a_data, src_a) * jnp.take(b_data, src_b)
    key_s, val_s = jax.lax.sort((key, val), num_keys=1)
    head = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    seg = (jnp.cumsum(head) - 1).astype(jnp.int32)
    merged = sorted_segment_sum(val_s, seg, F)
    nnz = seg[-1] + 1
    out_keys = jnp.full((F,), -1, key_s.dtype)
    out_keys = out_keys.at[seg].set(key_s)   # same-key writes agree
    return out_keys, merged, nnz


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


@partial(jax.jit, static_argnames=("F", "n_cols"))
def _device_expand_merge(a_indptr, a_indices, a_data, b_indptr, b_indices,
                         b_data, F, n_cols):
    """Expand/sort/merge with the EXPANSION MAP built on device too.

    The host contributes only the static flop count F (one O(nnz) pass);
    everything else — per-product source indices, elementary products,
    sort, duplicate merge — runs on the TPU. This kills the cold-start
    cost of shipping an O(F) host-built map to the device (the round-2
    symbolic path moved ~25 bytes/flop over the host link; this moves
    only the CSR arrays)."""
    nnz_a = a_indices.shape[0]
    m = a_indptr.shape[0] - 1
    deg_b = b_indptr[1:] - b_indptr[:-1]
    counts = jnp.take(deg_b, a_indices)                 # (nnz_a,)
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                               jnp.cumsum(counts)])     # (nnz_a+1,)
    pos = jnp.arange(F, dtype=counts.dtype)
    # src_a[p] = which A-entry product p belongs to
    src_a = jnp.searchsorted(offsets, pos, side="right") - 1
    src_b = (pos - jnp.take(offsets, src_a)
             + jnp.take(jnp.take(b_indptr, a_indices), src_a))
    deg_a = a_indptr[1:] - a_indptr[:-1]
    a_rows = jnp.repeat(jnp.arange(m, dtype=counts.dtype), deg_a,
                        total_repeat_length=nnz_a)
    rows = jnp.take(a_rows, src_a)
    cols = jnp.take(b_indices, src_b)
    key = rows * n_cols + cols
    val = jnp.take(a_data, src_a) * jnp.take(b_data, src_b)
    key_s, val_s = jax.lax.sort((key, val), num_keys=1)
    head = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    seg = (jnp.cumsum(head) - 1).astype(jnp.int32)
    merged = sorted_segment_sum(val_s, seg, F)
    nnz = seg[-1] + 1
    out_keys = jnp.full((F,), -1, key_s.dtype)
    out_keys = out_keys.at[seg].set(key_s)
    return out_keys, merged, nnz


def spgemm_device_full(a: CSR, b: CSR):
    """One-shot SpGEMM with both structure discovery AND product
    expansion on device. Host work: flop count + final CSR split.
    Returns (keys, values, nnz) like spgemm_device_merge."""
    m, n = a.shape[0], b.shape[1]
    F = spgemm_flops(a, b) // 2
    kt = np.int32 if max(m * n, F, a.nnz, b.nnz) < 2**31 else np.int64
    return _device_expand_merge(
        jnp.asarray(np.asarray(a.indptr).astype(kt)),
        jnp.asarray(np.asarray(a.indices).astype(kt)),
        jnp.asarray(a.data),
        jnp.asarray(np.asarray(b.indptr).astype(kt)),
        jnp.asarray(np.asarray(b.indices).astype(kt)),
        jnp.asarray(b.data), int(F), n)
