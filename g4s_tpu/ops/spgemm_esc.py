"""Gather-free SpGEMM: expand / sort / compress with class-tiled MXU-style
broadcasting (C = A @ B on TPU without a single dynamic gather).

The reference's three CPU SpGEMM engines all pivot on scatter-friendly
memory (hash probes mm/inc/hash_mult.h:558-608, heap merges
heap_mult.h:123-174, atomic bucket appends outer_mult.h:334,347). TPU has
neither scatter nor fast dynamic gather — XLA's take runs ~100 M elem/s —
so the round-2 numeric phase (two takes + segment_sum over the flop
stream) was gather-bound. This engine removes every gather:

  expand   elementary products a_ik * b_kj are materialized by *shape*,
           not by index: inner index k is partitioned into classes of
           equal padded (M̂ = pow2-rounded A-column count, W = rounded
           B-row length); one class is a dense (nb, M̂, W) tile product
           of a (nb, M̂, 1) A-slab and a (nb, 1, W) B-slab — a pure XLA
           broadcast-multiply. The slabs are filled by two conflict-free
           monotone log-shift spreads (ops/shifts.py) from the value
           arrays, after one small static reorder (nnz-scale, via
           stable sort_key_val on precomputed ranks).
  sort     the only unavoidable all-to-all: products move to C-slot
           order by ONE stable lax.sort under precomputed static keys
           (row * n + col); everything about the sort's outcome is known
           at plan time, so the merge metadata below is static.
  compress pad products drop via a monotone `compact`; equal-slot runs
           reduce with `runsum` (exact tree adds, no prefix-sum
           cancellation); head sums compact to C.data.

Two-phase split mirrors hash_mult.h:495-508: `esc_plan` is the symbolic
phase (pure O(flop) numpy, no Benes routing, no host sort of the flop
stream beyond one np.argsort), `esc_numeric` is the jitted value phase,
reusable across value updates like the reference apps reuse sparsity
(CitcomS re-assembles elt_k values on a fixed incidence each Stokes
solve). Structure of C (indptr/indices) comes out of the plan.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops.shifts import compact, runsum, spread, stages_for
from g4s_tpu.sparse.containers import CSR


def _static():
    return field(metadata=dict(static=True))


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class ESCPlan:
    """Static schedule for C = A @ B at fixed sparsity."""

    a_rank: jax.Array       # (nnz_a,) stable-sort rank -> class-major order
    b_rank: jax.Array       # (nnz_b,)
    d_a: jax.Array          # (Na,) spread dists into the A slabs (-1 dead)
    d_b: jax.Array          # (Nb,)
    d_pad: jax.Array        # (m2,) pad-compaction dists
    keys: jax.Array         # (F,) static C-slot keys (flat int32, or the
                            # MAJOR key when keys_minor is present)
    keys_minor: Optional[jax.Array]  # (F,) int32 minor key for m*n >= 2^31
    off_c: jax.Array        # (F,) position within equal-key run after sort
    d_head: jax.Array       # (F,) head-compaction dists
    c_indptr: Optional[np.ndarray]
    c_indices: Optional[np.ndarray]
    # classes: (nb, Mh, W, a_off, b_off) per class, product regions in order
    classes: Tuple[Tuple[int, int, int, int, int], ...] = _static()
    na: int = _static()     # Σ nb*Mh
    nb_len: int = _static()  # Σ nb*W
    m2: int = _static()     # Σ nb*Mh*W (padded product stream)
    flops: int = _static()  # F = number of real elementary products
    nnz: int = _static()
    t_a: int = _static()
    t_b: int = _static()
    t_pad: int = _static()
    t_sum: int = _static()
    t_head: int = _static()
    shape: Tuple[int, int] = _static()
    # merge order the plan was built with ('row' -> CSR keys, 'col' ->
    # CSC); recorded so materialize_structure cannot be asked to decode
    # the sorted key stream under the wrong major axis
    order_by: str = field(default="row", metadata=dict(static=True))
    # family-bucketed plans: `nnz`/`flops` hold the CANONICAL caps (so
    # the compiled programs are shared); the true output count is here
    nnz_real: Optional[int] = field(default=None,
                                    metadata=dict(static=True))
    # device plans only: sorted key stream kept for lazy C-structure
    # materialization (tunnel downloads run ~0.1-13 MB/s, so the
    # (F,)-sized structure arrays stay on device until asked for)
    keys_sorted: Optional[jax.Array] = None
    keys_sorted_minor: Optional[jax.Array] = None

    def to_device(self) -> "ESCPlan":
        return dataclasses.replace(
            self, a_rank=jnp.asarray(self.a_rank),
            b_rank=jnp.asarray(self.b_rank), d_a=jnp.asarray(self.d_a),
            d_b=jnp.asarray(self.d_b), d_pad=jnp.asarray(self.d_pad),
            keys=jnp.asarray(self.keys),
            keys_minor=(None if self.keys_minor is None
                        else jnp.asarray(self.keys_minor)),
            off_c=jnp.asarray(self.off_c),
            d_head=jnp.asarray(self.d_head))


def _round_width(l: np.ndarray) -> np.ndarray:
    """Waste-bounded width levels: exact <= 8, mult-of-4 <= 32, mult-of-16
    <= 128, pow2 beyond (<= 17% pad waste, bounded class count)."""
    w = l.copy()
    m = (l > 8) & (l <= 32)
    w[m] = -(-l[m] // 4) * 4
    m = (l > 32) & (l <= 128)
    w[m] = -(-l[m] // 16) * 16
    m = l > 128
    if m.any():
        w[m] = 2 ** np.ceil(np.log2(l[m])).astype(np.int64)
    return w


def _expand(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate ranges [starts[i], starts[i]+counts[i]) — O(total)
    via repeat (no per-element binary search)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    return (np.repeat(starts - (ends - counts), counts)
            + np.arange(total, dtype=np.int64))


@dataclasses.dataclass(frozen=True)
class _Partition:
    """Deterministic class partition of the inner index (host-side).

    Shared between `esc_plan` and `esc_route_plan` so the routed
    numeric's stream positions agree with the plan's by construction."""

    m: int
    n: int
    kk: np.ndarray          # active inner indices, class-major order
    M: np.ndarray           # A-column counts per block
    L: np.ndarray           # B-row lengths per block
    Mh: np.ndarray          # pow2-rounded M
    W: np.ndarray           # rounded L
    a_off: np.ndarray       # (nblk+1,) slab offsets
    b_off: np.ndarray
    p_off: np.ndarray
    classes: tuple
    ac_indptr: np.ndarray   # A as CSC
    ac_rows: np.ndarray
    csc_of_csr: np.ndarray
    b_indptr: np.ndarray
    b_indices: np.ndarray

    @property
    def sizes(self):
        return (int(self.a_off[-1]), int(self.b_off[-1]),
                int(self.p_off[-1]))


def _partition(a: CSR, b: CSR) -> _Partition:
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    m, n = a.shape[0], b.shape[1]
    a_sp = a.to_scipy().tocsc()
    a_sp.sort_indices()
    ac_indptr = a_sp.indptr.astype(np.int64)
    ac_rows = a_sp.indices.astype(np.int64)
    # map CSC entry -> position in a.data (CSR): stable-sort CSR entries
    # by column gives CSC order
    a_csr_cols = np.asarray(a.indices, dtype=np.int64)
    csc_of_csr = np.argsort(a_csr_cols, kind="stable")  # csc pos -> csr pos

    b_indptr = np.asarray(b.indptr).astype(np.int64)
    b_indices = np.asarray(b.indices).astype(np.int64)

    M_all = np.diff(ac_indptr)
    L_all = np.diff(b_indptr)
    active = np.nonzero((M_all > 0) & (L_all > 0))[0]
    if active.size == 0:
        raise ValueError("empty product")
    M = M_all[active]
    L = L_all[active]
    Mh = np.maximum(1, 2 ** np.ceil(np.log2(M)).astype(np.int64))
    W = _round_width(L)

    # class-major block order
    order = np.lexsort((active, Mh * (1 << 40) + W))
    kk, M, L, Mh, W = active[order], M[order], L[order], Mh[order], W[order]
    cls_key = Mh * (1 << 40) + W
    cls_start = np.nonzero(np.concatenate(
        [[True], cls_key[1:] != cls_key[:-1]]))[0]
    cls_end = np.append(cls_start[1:], kk.size)

    a_off = np.concatenate([[0], np.cumsum(Mh)])        # per block
    b_off = np.concatenate([[0], np.cumsum(W)])
    p_off = np.concatenate([[0], np.cumsum(Mh * W)])

    classes = tuple(
        (int(e - s), int(Mh[s]), int(W[s]), int(a_off[s]), int(b_off[s]))
        for s, e in zip(cls_start, cls_end))
    return _Partition(m, n, kk, M, L, Mh, W, a_off, b_off, p_off, classes,
                      ac_indptr, ac_rows, csc_of_csr, b_indptr, b_indices)


def esc_plan(a: CSR, b: CSR, *, order_by: str = "row") -> ESCPlan:
    """Symbolic phase: class partition, spread distances, sort metadata
    and C's exact structure. Pure vectorized numpy, O(flop).

    order_by="row" merges products in row-major slot order and emits
    CSR structure (the hash engine's strategy, hash_mult.h:558-608);
    order_by="col" merges COLUMN-major — the genuinely column-wise
    engine of the reference's HeapSpGEMM (heap_mult.h:47-223: walk
    columns, k-way merge sorted contributions): the single stable sort
    under j*m+i keys IS the k-way column merge, C comes out as CSC with
    rows sorted within each column by construction."""
    if order_by not in ("row", "col"):
        raise ValueError(f"order_by must be 'row' or 'col': {order_by}")
    P = _partition(a, b)
    m, n = P.m, P.n
    kk, M, L, Mh, W = P.kk, P.M, P.L, P.Mh, P.W
    a_off, b_off, p_off = P.a_off, P.b_off, P.p_off
    ac_indptr, ac_rows, csc_of_csr = P.ac_indptr, P.ac_rows, P.csc_of_csr
    b_indptr, b_indices = P.b_indptr, P.b_indices
    classes = P.classes
    na, nb_len, m2 = P.sizes

    if max(a.nnz, b.nnz) >= (1 << 31) - 1:
        raise NotImplementedError("nnz >= 2^31 needs int64 rank streams")

    # ---- native fast path: all O(flop) passes in fused C++ loops -------
    # (g4s_esc_plan_core in runtime/native/host_kernels.cc — the host
    # graph-builder role the reference threads natively,
    # hash_mult.h:495-508). The numpy section below is the equivalent
    # fallback, kept bit-identical (tests/test_spgemm_esc.py compares).
    two_key = m * n >= (1 << 31)
    n_min_ = n if order_by == "row" else m
    n_major_ = m if order_by == "row" else n
    F_ = int((M * L).sum())
    from g4s_tpu.runtime.native_lib import esc_plan_core_native
    native = esc_plan_core_native(
        kk, M, L, Mh, W, a_off[:-1], b_off[:-1], p_off[:-1],
        ac_indptr, ac_rows, csc_of_csr, b_indptr, b_indices,
        a.nnz, b.nnz, n_min_, n_major_, F_, na, nb_len, m2,
        order_by == "row", two_key)
    if native is not None:
        (a_rank_n, b_rank_n, d_a_n, d_b_n, d_pad_n, keys_n, kmin_n,
         off_c_n, d_head_n, c_idx_n, c_ptr_n, nnz_n, meta) = native
        return ESCPlan(
            a_rank=a_rank_n, b_rank=b_rank_n, d_a=d_a_n, d_b=d_b_n,
            d_pad=d_pad_n, keys=keys_n, keys_minor=kmin_n,
            off_c=off_c_n, d_head=d_head_n, c_indptr=c_ptr_n,
            c_indices=c_idx_n, classes=classes, na=na, nb_len=nb_len,
            m2=m2, flops=F_, nnz=nnz_n,
            t_a=stages_for(int(meta[1])), t_b=stages_for(int(meta[2])),
            t_pad=stages_for(int(meta[3])), t_sum=stages_for(int(meta[4])),
            t_head=stages_for(int(meta[5])), shape=(m, n),
            order_by=order_by)

    # ---- A side: CSC entries -> class-major (block, r) order -----------
    a_src = _expand(ac_indptr[kk], M)        # csc positions, class-major
    n_arows = a_src.size                     # == nnz over active columns
    # int32 sentinel: inactive entries sort (stably) to the tail; int64
    # sentinels would overflow under jax's default-x64-off int32 cast
    a_rank_pos = np.full(a.nnz, np.iinfo(np.int32).max, np.int32)
    a_rank_pos[csc_of_csr[a_src]] = np.arange(n_arows, dtype=np.int32)
    # stable sort by rank puts inactive entries at the tail
    a_dest = _expand(a_off[:-1], M)          # slab dest per (block, r)
    d_a = np.full(na, -1, np.int32)
    d_a[:n_arows] = (a_dest - np.arange(n_arows)).astype(np.int32)
    t_a = stages_for(int(d_a[:n_arows].max(initial=0)))

    # ---- B side: CSR entries -> class-major block order ----------------
    b_src = _expand(b_indptr[kk], L)         # b.data positions
    n_brows = b_src.size
    b_rank_pos = np.full(b.nnz, np.iinfo(np.int32).max, np.int32)
    b_rank_pos[b_src] = np.arange(n_brows, dtype=np.int32)
    b_dest = _expand(b_off[:-1], L)
    d_b = np.full(nb_len, -1, np.int32)
    d_b[:n_brows] = (b_dest - np.arange(n_brows)).astype(np.int32)
    t_b = stages_for(int(d_b[:n_brows].max(initial=0)))

    # ---- product stream: real positions, keys, pad compaction ----------
    # level 1: (block, r) rows, r < M
    row_block = np.repeat(np.arange(kk.size, dtype=np.int64), M)
    row_r = np.arange(row_block.size, dtype=np.int64) - \
        np.repeat(np.cumsum(M) - M, M)
    row_pos = p_off[row_block] + row_r * W[row_block]   # start of row's lane
    row_i = ac_rows[a_src]                              # C-row of each row
    # level 2: lanes l < L of each (block, r) row
    Lr = L[row_block]
    real_pos = _expand(row_pos, Lr)
    F = real_pos.size
    j_cols = b_indices[_expand(b_indptr[kk][row_block], Lr)]
    i_rows = np.repeat(row_i, Lr)

    if order_by == "row":
        kmaj, kmin, n_min = i_rows, j_cols, n
    else:                                   # column-major: CSC output
        kmaj, kmin, n_min = j_cols, i_rows, m
    # host simulation always uses the flat int64 key; the DEVICE sort
    # uses one int32 key when the flat key fits, else the (major, minor)
    # int32 pair under lax.sort num_keys=2 — so m*n >= 2^31 never forces
    # int64 (emulated, and x64-gated) onto the TPU
    keys_real = kmaj * np.int64(n_min) + kmin
    if m * n < (1 << 31):
        keys_dev, keys_minor = keys_real.astype(np.int32), None
    else:
        keys_dev = kmaj.astype(np.int32)
        keys_minor = kmin.astype(np.int32)

    d_pad = np.zeros(m2, np.int32)
    d_pad[real_pos] = (real_pos - np.arange(F, dtype=np.int64)) \
        .astype(np.int32)
    t_pad = stages_for(int(d_pad.max(initial=0)))

    # ---- simulate the stable sort: merge metadata ----------------------
    s_ord = np.argsort(keys_real, kind="stable")
    keys_s = keys_real[s_ord]
    head = np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
    heads = np.nonzero(head)[0]
    nnz = heads.size
    grp = np.cumsum(head) - 1
    off_c = (np.arange(F, dtype=np.int64) - heads[grp]).astype(np.int32)
    t_sum = stages_for(int(off_c.max(initial=0)))
    d_head = np.zeros(F, np.int32)
    d_head[heads] = (heads - np.arange(nnz, dtype=np.int64)) \
        .astype(np.int32)
    t_head = stages_for(int(d_head.max(initial=0)))

    uniq = keys_s[heads].astype(np.int64)
    if order_by == "row":
        major, minor, n_major = uniq // n, uniq % n, m
    else:
        major, minor, n_major = uniq // m, uniq % m, n
    c_indices = minor.astype(np.int32)
    c_indptr = np.zeros(n_major + 1, np.int64)
    np.add.at(c_indptr, major + 1, 1)
    np.cumsum(c_indptr, out=c_indptr)

    return ESCPlan(
        a_rank=a_rank_pos, b_rank=b_rank_pos,
        d_a=d_a, d_b=d_b, d_pad=d_pad, keys=keys_dev,
        keys_minor=keys_minor,
        off_c=off_c, d_head=d_head, c_indptr=c_indptr, c_indices=c_indices,
        classes=classes, na=na, nb_len=nb_len, m2=m2, flops=F, nnz=nnz,
        t_a=t_a, t_b=t_b, t_pad=t_pad, t_sum=t_sum, t_head=t_head,
        shape=(m, n), order_by=order_by)


@partial(jax.jit, static_argnames=("classes", "na", "nb_len", "m2", "flops",
                                   "t_a", "t_b", "t_pad", "order_row",
                                   "two_key", "n_min"))
def _esc_symbolic_impl(rows_cm, cols_cm, d_a, d_b, M_d, L_d, *, classes,
                       na, nb_len, m2, flops, t_a, t_b, t_pad, order_row,
                       two_key, n_min):
    """Device O(flop) passes of the symbolic phase: build the product-
    stream keys by the same spread/expand the numeric uses on values,
    derive the pad-compaction distances from the block mask, run the ONE
    stable device sort on the keys, and emit the merge metadata
    (off_c/d_head) plus the scalars the host needs for stage counts.

    Returns (keys, keys_minor, d_pad, off_c, d_head, keys_sorted,
    keys_sorted_minor, scalars[nnz, max_off, max_dh])."""
    ra = spread(_fit(rows_cm, na), d_a, t_a)
    rb = spread(_fit(cols_cm, nb_len), d_b, t_b)
    parts_maj, parts_min, parts_mask = [], [], []
    poff = 0
    boff_blk = 0
    for nb, mh, w, aoff, boff in classes:
        ta = jax.lax.dynamic_slice_in_dim(ra, aoff, nb * mh) \
            .reshape(nb, mh, 1)
        tb = jax.lax.dynamic_slice_in_dim(rb, boff, nb * w) \
            .reshape(nb, 1, w)
        am = jnp.broadcast_to(ta, (nb, mh, w)).reshape(-1)
        bm = jnp.broadcast_to(tb, (nb, mh, w)).reshape(-1)
        if order_row:
            parts_maj.append(am)
            parts_min.append(bm)
        else:
            parts_maj.append(bm)
            parts_min.append(am)
        M_c = jax.lax.dynamic_slice_in_dim(M_d, boff_blk, nb) \
            .reshape(nb, 1, 1)
        L_c = jax.lax.dynamic_slice_in_dim(L_d, boff_blk, nb) \
            .reshape(nb, 1, 1)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (nb, mh, w), 1)
        l_i = jax.lax.broadcasted_iota(jnp.int32, (nb, mh, w), 2)
        parts_mask.append(((r_i < M_c) & (l_i < L_c)).reshape(-1))
        poff += nb * mh * w
        boff_blk += nb
    cat = (lambda p: p[0] if len(p) == 1 else jnp.concatenate(p))
    kmaj2, kmin2, mask2 = cat(parts_maj), cat(parts_min), cat(parts_mask)
    iota2 = jax.lax.iota(jnp.int32, m2)
    f_excl = jnp.cumsum(mask2.astype(jnp.int32)) - mask2.astype(jnp.int32)
    d_pad = jnp.where(mask2, iota2 - f_excl, 0)
    kmaj = compact(kmaj2, d_pad, t_pad)[:flops]
    if two_key:
        kmin = compact(kmin2, d_pad, t_pad)[:flops]
        keys, keys_minor = kmaj, kmin
        ks, ks_min = jax.lax.sort((kmaj, kmin), num_keys=2)
        head = jnp.concatenate([
            jnp.ones((1,), bool),
            (ks[1:] != ks[:-1]) | (ks_min[1:] != ks_min[:-1])])
    else:
        # single flat int32 key, built from the compacted pair
        kmin = compact(kmin2, d_pad, t_pad)[:flops]
        keys = kmaj * jnp.int32(n_min) + kmin
        keys_minor = None
        ks = jax.lax.sort(keys)
        ks_min = None
        head = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    iota_f = jax.lax.iota(jnp.int32, flops)
    seg_start = jax.lax.cummax(jnp.where(head, iota_f, 0))
    off_c = iota_f - seg_start
    rank = jnp.cumsum(head.astype(jnp.int32)) - head.astype(jnp.int32)
    d_head = jnp.where(head, iota_f - rank, 0)
    scal = jnp.stack([jnp.sum(head.astype(jnp.int32)),
                      jnp.max(off_c), jnp.max(d_head)])
    return keys, keys_minor, d_pad, off_c, d_head, ks, ks_min, scal


def esc_plan_device(a: CSR, b: CSR, *, order_by: str = "row") -> ESCPlan:
    """Symbolic phase with the O(flop) passes ON THE DEVICE.

    The host keeps only the O(nnz)/O(n) work (class partition, CSC
    streams, spread distances); the product-stream expansion, pad
    distances, the stable key sort and the merge metadata all run as one
    jitted program, and the resulting plan arrays are BORN device-
    resident — `esc_numeric` consumes them with no further upload. Host
    round trips: one ~O(nnz) upload plus one 3-scalar fetch. C's
    structure (indptr/indices) stays on device; call
    `materialize_structure(plan)` to pull it when a CSR container is
    actually needed (the tunnel downloads at ~0.1-13 MB/s, so this is
    deliberately lazy).

    This is the role hash_mult.h:495-508 gives its thread-parallel
    symbolic phase — on a single-core host the reference's approach is
    memory-latency-bound (measured 28-42 s at nnz=2.1M, vs ~1 s here).
    """
    if order_by not in ("row", "col"):
        raise ValueError(f"order_by must be 'row' or 'col': {order_by}")
    P = _partition(a, b)
    m, n = P.m, P.n
    kk, M, L, Mh, W = P.kk, P.M, P.L, P.Mh, P.W
    a_off, b_off, p_off = P.a_off, P.b_off, P.p_off
    na, nb_len, m2 = P.sizes
    if max(a.nnz, b.nnz) >= (1 << 31) - 1:
        raise NotImplementedError("nnz >= 2^31 needs int64 rank streams")

    # host O(nnz): class-major streams + spread distances (passA/passB)
    a_src = _expand(P.ac_indptr[kk], M)
    n_arows = a_src.size
    a_rank_pos = np.full(a.nnz, np.iinfo(np.int32).max, np.int32)
    a_rank_pos[P.csc_of_csr[a_src]] = np.arange(n_arows, dtype=np.int32)
    a_dest = _expand(a_off[:-1], M)
    d_a = np.full(na, -1, np.int32)
    d_a[:n_arows] = (a_dest - np.arange(n_arows)).astype(np.int32)
    t_a = stages_for(int(d_a[:n_arows].max(initial=0)))

    b_src = _expand(P.b_indptr[kk], L)
    n_brows = b_src.size
    b_rank_pos = np.full(b.nnz, np.iinfo(np.int32).max, np.int32)
    b_rank_pos[b_src] = np.arange(n_brows, dtype=np.int32)
    b_dest = _expand(b_off[:-1], L)
    d_b = np.full(nb_len, -1, np.int32)
    d_b[:n_brows] = (b_dest - np.arange(n_brows)).astype(np.int32)
    t_b = stages_for(int(d_b[:n_brows].max(initial=0)))

    rows_cm = P.ac_rows[a_src].astype(np.int32)     # class-major C-rows
    cols_cm = P.b_indices[b_src].astype(np.int32)   # class-major C-cols

    # t_pad without materializing the stream: within block b the pad
    # distance is p_off[b]-f_start[b]+r*(W-L), maximal at r=M-1
    F = int((M * L).sum())
    f_start = np.cumsum(M * L) - M * L
    d_max = p_off[:-1] - f_start + (M - 1) * (W - L)
    t_pad = stages_for(int(d_max.max(initial=0)))

    order_row = order_by == "row"
    n_min = n if order_row else m
    n_major = m if order_row else n
    two_key = m * n >= (1 << 31)

    (keys, keys_minor, d_pad, off_c, d_head, ks, ks_min,
     scal) = _esc_symbolic_impl(
        jnp.asarray(rows_cm), jnp.asarray(cols_cm),
        jnp.asarray(d_a), jnp.asarray(d_b),
        jnp.asarray(M.astype(np.int32)), jnp.asarray(L.astype(np.int32)),
        classes=P.classes, na=na, nb_len=nb_len, m2=m2, flops=F,
        t_a=t_a, t_b=t_b, t_pad=t_pad, order_row=order_row,
        two_key=two_key, n_min=n_min)
    nnz, max_off, max_dh = (int(v) for v in np.asarray(scal))

    return ESCPlan(
        a_rank=jnp.asarray(a_rank_pos), b_rank=jnp.asarray(b_rank_pos),
        d_a=jnp.asarray(d_a), d_b=jnp.asarray(d_b), d_pad=d_pad,
        keys=keys, keys_minor=keys_minor, off_c=off_c, d_head=d_head,
        c_indptr=None, c_indices=None, classes=P.classes, na=na,
        nb_len=nb_len, m2=m2, flops=F, nnz=nnz, t_a=t_a, t_b=t_b,
        t_pad=t_pad, t_sum=stages_for(max_off), t_head=stages_for(max_dh),
        shape=(m, n), order_by=order_by,
        keys_sorted=ks, keys_sorted_minor=ks_min)


def materialize_structure(plan: ESCPlan):
    """Pull C's (indptr, indices) from a device plan (one download of
    nnz int32/int64 values). Host plans already carry them. The merge
    order is the one recorded on the plan at build time."""
    if plan.c_indptr is not None:
        return plan.c_indptr, plan.c_indices
    m, n = plan.shape
    n_min = n if plan.order_by == "row" else m
    n_major = m if plan.order_by == "row" else n
    nnz = plan.nnz if plan.nnz_real is None else plan.nnz_real
    heads = jnp.asarray(compact(plan.keys_sorted, plan.d_head,
                                plan.t_head)[: nnz])
    if plan.keys_sorted_minor is None:
        uniq = np.asarray(heads).astype(np.int64)
        major, minor = uniq // n_min, uniq % n_min
    else:
        major = np.asarray(heads).astype(np.int64)
        minor = np.asarray(compact(plan.keys_sorted_minor, plan.d_head,
                                   plan.t_head)[: nnz]).astype(np.int64)
    c_indices = minor.astype(np.int32)
    c_indptr = np.zeros(n_major + 1, np.int64)
    np.add.at(c_indptr, major + 1, 1)
    np.cumsum(c_indptr, out=c_indptr)
    return c_indptr, c_indices


@partial(jax.jit, static_argnames=("classes", "na", "nb_len", "m2", "flops",
                                   "nnz", "t_a", "t_b", "t_pad", "t_sum",
                                   "t_head"))
def _esc_numeric_impl(a_data, b_data, a_rank, b_rank, d_a, d_b, d_pad,
                      keys, keys_minor, off_c, d_head, *, classes, na,
                      nb_len, m2, flops, nnz, t_a, t_b, t_pad, t_sum,
                      t_head):
    # small static reorders (stable sort by precomputed rank)
    av = jax.lax.sort((a_rank, a_data), num_keys=1)[1]
    bv = jax.lax.sort((b_rank, b_data), num_keys=1)[1]
    # spread into the class-major slabs
    xa = spread(_fit(av, na), d_a, t_a)
    xb = spread(_fit(bv, nb_len), d_b, t_b)
    # expand: per-class dense tile products (pure broadcast, no indexing)
    parts = []
    for nb, mh, w, aoff, boff in classes:
        ta = jax.lax.dynamic_slice_in_dim(xa, aoff, nb * mh) \
            .reshape(nb, mh, 1)
        tb = jax.lax.dynamic_slice_in_dim(xb, boff, nb * w) \
            .reshape(nb, 1, w)
        parts.append((ta * tb).reshape(-1))
    prod = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    # compress: drop pads, sort to slot order, reduce runs, compact heads
    prod = compact(prod, d_pad, t_pad)[:flops]
    if keys_minor is None:
        prod_s = jax.lax.sort((keys, prod), num_keys=1)[1]
    else:   # flat key would overflow int32: two-key stable sort
        prod_s = jax.lax.sort((keys, keys_minor, prod), num_keys=2)[2]
    sums = runsum(prod_s, off_c, t_sum)
    return compact(sums, d_head, t_head)[:nnz]


def _fit(x, n):
    if x.shape[0] == n:
        return x
    if x.shape[0] > n:
        return x[:n]
    return jnp.concatenate([x, jnp.zeros(n - x.shape[0], x.dtype)])


def esc_numeric(a_data, b_data, plan: ESCPlan):
    """Value phase: C.data (in plan.c_indptr/c_indices order) from A/B
    values. Jit-safe, reusable across value updates. Family-bucketed
    plans carry nnz-capped rank arrays; the value arrays are padded to
    match (pad entries rank to the tail and never spread)."""
    a_data = jnp.asarray(a_data)
    b_data = jnp.asarray(b_data)
    na_ = plan.a_rank.shape[0]
    nb_ = plan.b_rank.shape[0]
    if a_data.shape[0] < na_:
        a_data = jnp.concatenate(
            [a_data, jnp.zeros(na_ - a_data.shape[0], a_data.dtype)])
    if b_data.shape[0] < nb_:
        b_data = jnp.concatenate(
            [b_data, jnp.zeros(nb_ - b_data.shape[0], b_data.dtype)])
    return _esc_numeric_impl(
        a_data, b_data,
        jnp.asarray(plan.a_rank),
        jnp.asarray(plan.b_rank), jnp.asarray(plan.d_a),
        jnp.asarray(plan.d_b), jnp.asarray(plan.d_pad),
        jnp.asarray(plan.keys),
        None if plan.keys_minor is None else jnp.asarray(plan.keys_minor),
        jnp.asarray(plan.off_c),
        jnp.asarray(plan.d_head),
        classes=plan.classes, na=plan.na, nb_len=plan.nb_len, m2=plan.m2,
        flops=plan.flops, nnz=plan.nnz, t_a=plan.t_a, t_b=plan.t_b,
        t_pad=plan.t_pad, t_sum=plan.t_sum, t_head=plan.t_head)


def spgemm_esc(a: CSR, b: CSR, *, plan: ESCPlan | None = None) -> CSR:
    """C = A @ B through the gather-free ESC engine."""
    if plan is None:
        plan = esc_plan(a, b)
    c_data = esc_numeric(np.asarray(a.data), np.asarray(b.data), plan)
    return CSR(plan.c_indptr, plan.c_indices, c_data, plan.shape)


def esc_numeric_staged(a_data, b_data, plan: ESCPlan):
    """Numeric phase with per-stage wall times (the Timings.h role,
    mm/src/Timings.cpp:33-64): returns (c_data, {stage: ms}). Stages run
    as separate dispatches with device sync, so totals exceed the fused
    esc_numeric — use for attribution, not for headline timing.

    Timing forces completion with a value fetch (obs/devtime): the axon
    tunnel does not honor block_until_ready, which silently reported
    dispatch latency as stage time."""
    import jax as _jax

    from g4s_tpu.obs.devtime import time_fn

    p = plan.to_device()
    a_d, b_d = jnp.asarray(a_data), jnp.asarray(b_data)
    out = {}

    def timed(name, f, *args):
        out[name] = round(time_fn(f, *args, reps=4) * 1e3, 3)
        return f(*args)

    reorder = _jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)[1])
    av = timed("reorder_a", reorder, p.a_rank, a_d)
    bv = timed("reorder_b", reorder, p.b_rank, b_d)
    sp_a = _jax.jit(lambda x, d: spread(_fit(x, plan.na), d, plan.t_a))
    sp_b = _jax.jit(lambda x, d: spread(_fit(x, plan.nb_len), d, plan.t_b))
    xa = timed("spread_a", sp_a, av, p.d_a)
    xb = timed("spread_b", sp_b, bv, p.d_b)

    def expand(xa, xb):
        parts = []
        for nb, mh, w, aoff, boff in plan.classes:
            ta = xa[aoff:aoff + nb * mh].reshape(nb, mh, 1)
            tb = xb[boff:boff + nb * w].reshape(nb, 1, w)
            parts.append((ta * tb).reshape(-1))
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    prod = timed("expand", _jax.jit(expand), xa, xb)
    prod = timed("compact_pads", _jax.jit(
        lambda x, d: compact(x, d, plan.t_pad)[:plan.flops]), prod, p.d_pad)
    prod_s = timed("sort", reorder, p.keys, prod)
    sums = timed("runsum", _jax.jit(
        lambda x, o: runsum(x, o, plan.t_sum)), prod_s, p.off_c)
    c = timed("compact_heads", _jax.jit(
        lambda x, d: compact(x, d, plan.t_head)[:plan.nnz]), sums, p.d_head)
    return c, out


# ---------------------------------------------------------------------------
# Routed numeric: Benes routes replace the sort and both compactions
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class ESCRoutePlan:
    """ESC plan + offline Clos/Benes routes for the two data movements
    the sort-based numeric pays bandwidth for: products -> sorted-slot
    order (replacing pad compaction AND the lax.sort) and run sums ->
    C.data order (replacing head compaction).

    The routes are static-permutation programs (ops/route.py) built once
    per sparsity pattern; building them costs far more host time than
    `esc_plan` alone, so this is the persistent-plan tier — the value
    regime the reference apps live in (CitcomS re-assembles elt_k values
    on a fixed incidence every Stokes solve; DeePMD re-evaluates fixed
    neighbor-list structures every step), where the route build
    amortizes to zero and the numeric runs at butterfly bandwidth
    instead of O(n log^2 n) bitonic-sort rate."""

    plan: ESCPlan
    main: object            # PermutePlan: padded stream -> sorted order
    heads: object           # PermutePlan: sorted stream -> C.data order
    # small routes replacing the two nnz-scale rank lax.sorts (a static
    # reorder costs ~0.75 ms/512k as a sort vs ~0.12 ms as a route);
    # None below the route-worthwhile size (the numeric falls back to
    # the stable sort)
    a_route: object = None
    b_route: object = None


# ---------------------------------------------------------------------------
# Family-bucketed device symbolic: one compiled executable per FAMILY
# ---------------------------------------------------------------------------
#
# esc_plan_device's jitted program is keyed on the exact class signature
# (per-class block counts, slab/stream sizes, flop count) — a first-ever
# matrix pays the full XLA compile (30-170 s measured) even when its
# geometry differs from an already-compiled one by a single block. The
# bucketed variant canonicalizes the signature: per-class block counts
# round up to 12.5%-granular capacities (top-3-bits rounding), stream
# and output lengths round up the same way, the real flop count travels
# as a RUNTIME scalar (pad products past it get INT32_MAX sentinel keys
# that sort to the tail), and the shift-stage counts take their
# capacity-derived upper bounds. Any matrix whose classes fit the
# family's menu then reuses BOTH compiled programs (symbolic + numeric)
# with zero recompilation — the workload this serves is a solver whose
# sparsity drifts across steps (CitcomS tracer-driven re-assembly,
# hash_mult.h:495-508's repeated symbolic role).


def _cap_round(x: int) -> int:
    """Round up keeping the top 3 bits: <=12.5% waste, log-many buckets."""
    x = int(x)
    if x <= 8:
        return max(x, 1)
    g = 1 << (x.bit_length() - 3)
    return -(-x // g) * g


@dataclasses.dataclass(frozen=True)
class EscFamily:
    """Canonical padded class signature shared by a matrix family."""

    menu: Tuple[Tuple[int, int, int], ...]   # (mh, w, nb_cap), (mh, w)-sorted
    classes: Tuple[Tuple[int, int, int, int, int], ...]  # canonical
    na: int
    nb_len: int
    m2: int
    f_cap: int
    n_cap: int
    order_row: bool
    two_key: bool
    t_a: int
    t_b: int
    t_pad: int
    t_sum: int
    t_head: int
    # canonical nnz paddings so the NUMERIC executable's argument
    # shapes are family-stable too (esc_numeric pads a_data to match)
    nnz_a_cap: int = 0
    nnz_b_cap: int = 0

    def assign(self, P: "_Partition", f_real: int, two_key: bool):
        """Map each real class to a menu class that can serve it, or
        None when no assignment exists. A real (mh, w) class fits any
        menu class with mh' >= mh and w' >= w — the per-block (M, L)
        mask absorbs the extra padding — so families survive the
        class-menu fragmentation of drifting sparsity. Greedy: cheapest
        admissible class (least padding) first."""
        if two_key != self.two_key or f_real > self.f_cap:
            return None
        if P.ac_indptr[-1] > self.nnz_a_cap \
                or P.b_indptr[-1] > self.nnz_b_cap:
            return None
        remaining = [nbc for _, _, nbc in self.menu]
        out = []
        for nb, mh, w, _, _ in P.classes:
            admissible = sorted(
                (mh2 * w2, mi)
                for mi, (mh2, w2, _) in enumerate(self.menu)
                if mh2 >= mh and w2 >= w)
            pieces = []
            need = nb
            for _, mi in admissible:        # cheapest (least padding) first
                take = min(need, remaining[mi])
                if take > 0:
                    remaining[mi] -= take
                    pieces.append((mi, take))
                    need -= take
                if need == 0:
                    break
            if need:
                return None
            out.append(pieces)
        return out


def make_esc_family(a: CSR, b: CSR, *, order_by: str = "row",
                    slack: float = 1.25) -> EscFamily:
    """Build the canonical family signature from one representative
    matrix pair (class capacities, stream/output caps, stage bounds).

    `slack` headroom on every capacity buys drift tolerance — class
    promotion (EscFamily.assign) lets a drifted instance borrow bigger
    classes' spare room — at the cost of up to `slack`-1 extra padded
    stream work for every family member."""
    P = _partition(a, b)
    m, n = P.m, P.n
    two_key = m * n >= (1 << 31)
    menu = tuple(sorted((mh, w, _cap_round(int(np.ceil(nb * slack))))
                        for nb, mh, w, _, _ in P.classes))
    classes = []
    aoff = boff = m2 = 0
    for mh, w, nbc in menu:
        classes.append((nbc, mh, w, aoff, boff))
        aoff += nbc * mh
        boff += nbc * w
        m2 += nbc * mh * w
    f_cap = _cap_round(int(np.ceil(float((P.M * P.L).sum()) * slack)))
    return EscFamily(
        menu=menu, classes=tuple(classes), na=aoff, nb_len=boff, m2=m2,
        f_cap=f_cap, n_cap=f_cap, order_row=order_by == "row",
        two_key=two_key,
        t_a=stages_for(aoff - 1), t_b=stages_for(boff - 1),
        t_pad=stages_for(m2 - 1), t_sum=stages_for(f_cap - 1),
        t_head=stages_for(f_cap - 1),
        nnz_a_cap=_cap_round(int(np.ceil(a.nnz * slack))),
        nnz_b_cap=_cap_round(int(np.ceil(b.nnz * slack))))


@partial(jax.jit, static_argnames=("classes", "na", "nb_len", "m2",
                                   "f_cap", "t_a", "t_b", "t_pad",
                                   "order_row", "two_key"))
def _esc_symbolic_family(rows_cm, cols_cm, d_a, d_b, M_d, L_d, f_real,
                         n_min, *, classes, na, nb_len, m2, f_cap, t_a,
                         t_b, t_pad, order_row, two_key):
    """_esc_symbolic_impl with canonical shapes: the real flop count and
    the minor-axis extent are runtime scalars; pad slots past f_real
    carry INT32_MAX sentinel keys (one tail run, excluded from nnz)."""
    ra = spread(_fit(rows_cm, na), d_a, t_a)
    rb = spread(_fit(cols_cm, nb_len), d_b, t_b)
    parts_maj, parts_min, parts_mask = [], [], []
    boff_blk = 0
    for nb, mh, w, aoff, boff in classes:
        ta = jax.lax.dynamic_slice_in_dim(ra, aoff, nb * mh) \
            .reshape(nb, mh, 1)
        tb = jax.lax.dynamic_slice_in_dim(rb, boff, nb * w) \
            .reshape(nb, 1, w)
        am = jnp.broadcast_to(ta, (nb, mh, w)).reshape(-1)
        bm = jnp.broadcast_to(tb, (nb, mh, w)).reshape(-1)
        parts_maj.append(am if order_row else bm)
        parts_min.append(bm if order_row else am)
        M_c = jax.lax.dynamic_slice_in_dim(M_d, boff_blk, nb) \
            .reshape(nb, 1, 1)
        L_c = jax.lax.dynamic_slice_in_dim(L_d, boff_blk, nb) \
            .reshape(nb, 1, 1)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (nb, mh, w), 1)
        l_i = jax.lax.broadcasted_iota(jnp.int32, (nb, mh, w), 2)
        parts_mask.append(((r_i < M_c) & (l_i < L_c)).reshape(-1))
        boff_blk += nb
    cat = (lambda p: p[0] if len(p) == 1 else jnp.concatenate(p))
    kmaj2, kmin2, mask2 = cat(parts_maj), cat(parts_min), cat(parts_mask)
    iota2 = jax.lax.iota(jnp.int32, m2)
    f_excl = jnp.cumsum(mask2.astype(jnp.int32)) - mask2.astype(jnp.int32)
    d_pad = jnp.where(mask2, iota2 - f_excl, 0)
    iota_f = jax.lax.iota(jnp.int32, f_cap)
    pad_tail = iota_f >= f_real
    smax = jnp.int32(np.iinfo(np.int32).max)
    kmaj = jnp.where(pad_tail, smax, compact(kmaj2, d_pad, t_pad)[:f_cap])
    kmin = jnp.where(pad_tail, smax, compact(kmin2, d_pad, t_pad)[:f_cap])
    if two_key:
        keys, keys_minor = kmaj, kmin
        ks, ks_min = jax.lax.sort((kmaj, kmin), num_keys=2)
        head = jnp.concatenate([
            jnp.ones((1,), bool),
            (ks[1:] != ks[:-1]) | (ks_min[1:] != ks_min[:-1])])
        sent = ks == smax
    else:
        keys = jnp.where(pad_tail, smax, kmaj * n_min + kmin)
        keys_minor = None
        ks = jax.lax.sort(keys)
        ks_min = None
        head = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        sent = ks == smax
    seg_start = jax.lax.cummax(jnp.where(head, iota_f, 0))
    off_c = iota_f - seg_start
    rank = jnp.cumsum(head.astype(jnp.int32)) - head.astype(jnp.int32)
    d_head = jnp.where(head, iota_f - rank, 0)
    live_head = head & ~sent
    scal = jnp.stack([jnp.sum(live_head.astype(jnp.int32)),
                      jnp.max(jnp.where(sent, 0, off_c)),
                      jnp.max(jnp.where(sent, 0, d_head))])
    return keys, keys_minor, d_pad, off_c, d_head, ks, ks_min, scal


def esc_plan_device_family(a: CSR, b: CSR,
                           family: Optional[EscFamily] = None, *,
                           order_by: str = "row"):
    """Device symbolic through a canonical family executable.

    Returns (plan, family). Pass the returned family back for the next
    matrix: if its classes fit the menu, BOTH the symbolic and numeric
    programs are reused with no XLA compile (the cold-compile tax is
    paid once per family, not once per matrix). A matrix that does not
    fit rebuilds the family (and recompiles)."""
    if order_by not in ("row", "col"):
        raise ValueError(f"order_by must be 'row' or 'col': {order_by}")
    P = _partition(a, b)
    m, n = P.m, P.n
    two_key = m * n >= (1 << 31)
    f_real = int((P.M * P.L).sum())
    assign = None if family is None \
        else family.assign(P, f_real, two_key)
    if assign is None:
        family = make_esc_family(a, b, order_by=order_by)
        assign = family.assign(P, f_real, two_key)
        assert assign is not None
    fam = family
    if max(a.nnz, b.nnz) >= (1 << 31) - 1:
        raise NotImplementedError("nnz >= 2^31 needs int64 rank streams")

    # regroup the partition's class-major blocks into their ASSIGNED
    # menu classes (dead capacity: M = L = 0, masked out on device).
    # Blocks from several real classes can share one menu class; they
    # pack consecutively from the class start.
    spans = []
    idx = 0
    for nb, mh, w, _, _ in P.classes:
        spans.append(slice(idx, idx + nb))
        idx += nb
    # each real class may be split across several admissible menu
    # classes; record (real idx, start, count) pieces per menu class
    by_menu = [[] for _ in fam.classes]
    for ri, pieces in enumerate(assign):
        done = 0
        for mi, take in pieces:
            by_menu[mi].append((ri, done, take))
            done += take
    kk_parts, M_parts, L_parts = [], [], []
    a_off_parts, b_off_parts = [], []
    fill = [0] * len(fam.classes)           # blocks placed per menu class
    for mi, (nbc, mh, w, aoff, boff) in enumerate(fam.classes):
        for ri, start, take in by_menu[mi]:
            sl = slice(spans[ri].start + start,
                       spans[ri].start + start + take)
            kk_parts.append(P.kk[sl])
            M_parts.append(P.M[sl])
            L_parts.append(P.L[sl])
            j = fill[mi] + np.arange(take, dtype=np.int64)
            a_off_parts.append(aoff + j * mh)
            b_off_parts.append(boff + j * w)
            fill[mi] += take
    z = np.zeros(0, np.int64)
    kk = np.concatenate(kk_parts) if kk_parts else z
    M_live = np.concatenate(M_parts) if M_parts else z
    L_live = np.concatenate(L_parts) if L_parts else z
    a_blk_off = np.concatenate(a_off_parts) if a_off_parts else z
    b_blk_off = np.concatenate(b_off_parts) if b_off_parts else z

    # device-stream host passes (the exact structure of
    # esc_plan_device's, with canonical slab offsets)
    a_src = _expand(P.ac_indptr[kk], M_live)
    n_arows = a_src.size
    a_rank_pos = np.full(fam.nnz_a_cap, np.iinfo(np.int32).max, np.int32)
    a_rank_pos[P.csc_of_csr[a_src]] = np.arange(n_arows, dtype=np.int32)
    a_dest = _expand(a_blk_off, M_live)
    d_a = np.full(fam.na, -1, np.int32)
    d_a[:n_arows] = (a_dest - np.arange(n_arows)).astype(np.int32)

    b_src = _expand(P.b_indptr[kk], L_live)
    n_brows = b_src.size
    b_rank_pos = np.full(fam.nnz_b_cap, np.iinfo(np.int32).max, np.int32)
    b_rank_pos[b_src] = np.arange(n_brows, dtype=np.int32)
    b_dest = _expand(b_blk_off, L_live)
    d_b = np.full(fam.nb_len, -1, np.int32)
    d_b[:n_brows] = (b_dest - np.arange(n_brows)).astype(np.int32)

    # canonical argument shapes (a different n_arows must not recompile)
    rows_cm = np.zeros(fam.na, np.int32)
    rows_cm[:n_arows] = P.ac_rows[a_src]
    cols_cm = np.zeros(fam.nb_len, np.int32)
    cols_cm[:n_brows] = P.b_indices[b_src]
    n_min = n if fam.order_row else m

    # the M/L mask arrays must be in canonical per-menu-class block
    # order: assigned blocks pack first within each class, dead
    # capacity (zeros) after
    M_d = np.zeros(sum(nbc for nbc, *_ in fam.classes), np.int64)
    L_d = np.zeros_like(M_d)
    pos = 0
    for mi, (nbc, mh, w, _, _) in enumerate(fam.classes):
        o = 0
        for ri, start, take in by_menu[mi]:
            sl = slice(spans[ri].start + start,
                       spans[ri].start + start + take)
            M_d[pos + o:pos + o + take] = P.M[sl]
            L_d[pos + o:pos + o + take] = P.L[sl]
            o += take
        pos += nbc

    (keys, keys_minor, d_pad, off_c, d_head, ks, ks_min,
     scal) = _esc_symbolic_family(
        jnp.asarray(rows_cm), jnp.asarray(cols_cm),
        jnp.asarray(d_a), jnp.asarray(d_b),
        jnp.asarray(M_d.astype(np.int32)),
        jnp.asarray(L_d.astype(np.int32)),
        jnp.int32(f_real), jnp.int32(n_min),
        classes=fam.classes, na=fam.na, nb_len=fam.nb_len, m2=fam.m2,
        f_cap=fam.f_cap, t_a=fam.t_a, t_b=fam.t_b, t_pad=fam.t_pad,
        order_row=fam.order_row, two_key=fam.two_key)
    nnz_real = int(np.asarray(scal)[0])

    plan = ESCPlan(
        a_rank=jnp.asarray(a_rank_pos), b_rank=jnp.asarray(b_rank_pos),
        d_a=jnp.asarray(d_a), d_b=jnp.asarray(d_b), d_pad=d_pad,
        keys=keys, keys_minor=keys_minor, off_c=off_c, d_head=d_head,
        c_indptr=None, c_indices=None, classes=fam.classes, na=fam.na,
        nb_len=fam.nb_len, m2=fam.m2, flops=fam.f_cap, nnz=fam.n_cap,
        t_a=fam.t_a, t_b=fam.t_b, t_pad=fam.t_pad, t_sum=fam.t_sum,
        t_head=fam.t_head, shape=(m, n), order_by=order_by,
        keys_sorted=ks, keys_sorted_minor=ks_min, nnz_real=nnz_real)
    return plan, fam


def esc_route_plan(a: CSR, b: CSR, *, order_by: str = "row",
                   plan: ESCPlan | None = None) -> ESCRoutePlan:
    """Build the routed plan. Host-heavy (two Benes routings over the
    product stream); reuse it across value updates."""
    from g4s_tpu.ops.route import TILE, build_permute_plan
    if plan is None:
        plan = esc_plan(a, b, order_by=order_by)
    P = _partition(a, b)
    # real product positions in the padded class-major stream — the same
    # construction esc_plan uses for d_pad (kept consistent via the
    # shared _partition)
    row_block = np.repeat(np.arange(P.kk.size, dtype=np.int64), P.M)
    row_r = np.arange(row_block.size, dtype=np.int64) - \
        np.repeat(np.cumsum(P.M) - P.M, P.M)
    row_pos = P.p_off[row_block] + row_r * P.W[row_block]
    real_pos = _expand(row_pos, P.L[row_block])
    F, m2, nnz = plan.flops, plan.m2, plan.nnz

    # sorted order of the F real products (any stable tie order yields
    # the same run sums; run boundaries come from the key multiset)
    keys = np.asarray(plan.keys, np.int64)
    if plan.keys_minor is None:
        s_ord = np.argsort(keys, kind="stable")
    else:
        s_ord = np.lexsort((np.asarray(plan.keys_minor, np.int64), keys))

    m_r = -(-m2 // TILE) * TILE
    sigma = np.empty(m_r, np.int64)
    sigma[:F] = real_pos[s_ord]
    dead = np.ones(m2, bool)
    dead[real_pos] = False
    sigma[F:m2] = np.nonzero(dead)[0]          # pads park at the tail
    sigma[m2:] = np.arange(m2, m_r)
    main = build_permute_plan(sigma)

    heads_pos = np.nonzero(np.asarray(plan.off_c) == 0)[0]
    m_h = -(-F // TILE) * TILE
    sig_h = np.empty(m_h, np.int64)
    sig_h[:nnz] = heads_pos
    rest = np.ones(F, bool)
    rest[heads_pos] = False
    sig_h[nnz:F] = np.nonzero(rest)[0]
    sig_h[F:] = np.arange(F, m_h)
    # rank reorders as routes: sigma_r[i] = CSR position of rank-i entry
    def _rank_route(rank, nnz_side):
        if nnz_side < (1 << 16):
            return None
        m_s = -(-nnz_side // TILE) * TILE
        sig = np.empty(m_s, np.int64)
        sig[:nnz_side] = np.argsort(np.asarray(rank), kind="stable")
        sig[nnz_side:] = np.arange(nnz_side, m_s)
        return build_permute_plan(sig)

    # store the plan device-resident: the numeric re-reads a_rank/d_a/
    # off_c every call, and host-resident arrays would re-cross the
    # host<->device link per invocation (~35 MB at F ~ 8M)
    return ESCRoutePlan(plan.to_device(), main, build_permute_plan(sig_h),
                        _rank_route(plan.a_rank, a.nnz),
                        _rank_route(plan.b_rank, b.nnz))


@partial(jax.jit, static_argnames=("classes", "na", "nb_len", "flops",
                                   "nnz", "t_a", "t_b", "t_sum"))
def _esc_routed_impl(a_data, b_data, a_rank, b_rank, d_a, d_b, off_c,
                     main, heads, a_route, b_route, *, classes, na,
                     nb_len, flops, nnz, t_a, t_b, t_sum):
    from g4s_tpu.ops.route import apply_permute
    if a_route is not None:
        av = apply_permute(a_route, _fit(a_data, a_route.m))
    else:
        av = jax.lax.sort((a_rank, a_data), num_keys=1)[1]
    if b_route is not None:
        bv = apply_permute(b_route, _fit(b_data, b_route.m))
    else:
        bv = jax.lax.sort((b_rank, b_data), num_keys=1)[1]
    xa = spread(_fit(av, na), d_a, t_a)
    xb = spread(_fit(bv, nb_len), d_b, t_b)
    parts = []
    for nb, mh, w, aoff, boff in classes:
        ta = jax.lax.dynamic_slice_in_dim(xa, aoff, nb * mh) \
            .reshape(nb, mh, 1)
        tb = jax.lax.dynamic_slice_in_dim(xb, boff, nb * w) \
            .reshape(nb, 1, w)
        parts.append((ta * tb).reshape(-1))
    prod = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    prod_s = apply_permute(main, _fit(prod, main.m))[:flops]
    sums = runsum(prod_s, off_c, t_sum)
    return apply_permute(heads, _fit(sums, heads.m))[:nnz]


def esc_numeric_routed(a_data, b_data, rp: ESCRoutePlan):
    """Value phase through the routes: C.data (plan.c_indptr/c_indices
    order) from A/B values. Jit-safe, reusable across value updates."""
    p = rp.plan
    return _esc_routed_impl(
        jnp.asarray(a_data), jnp.asarray(b_data), jnp.asarray(p.a_rank),
        jnp.asarray(p.b_rank), jnp.asarray(p.d_a), jnp.asarray(p.d_b),
        jnp.asarray(p.off_c), rp.main, rp.heads, rp.a_route, rp.b_route,
        classes=p.classes, na=p.na, nb_len=p.nb_len, flops=p.flops,
        nnz=p.nnz, t_a=p.t_a, t_b=p.t_b, t_sum=p.t_sum)


def spgemm_esc_routed(a: CSR, b: CSR, *,
                      rplan: ESCRoutePlan | None = None) -> CSR:
    """C = A @ B through the routed ESC engine (persistent-plan tier)."""
    if rplan is None:
        rplan = esc_route_plan(a, b)
    c_data = esc_numeric_routed(np.asarray(a.data), np.asarray(b.data),
                                rplan)
    p = rplan.plan
    return CSR(p.c_indptr, p.c_indices, c_data, p.shape)


def spgemm_esc_col(a: CSR, b: CSR, *, plan: ESCPlan | None = None):
    """Column-wise C = A @ B: the HeapSpGEMM role (heap_mult.h:47-223).

    Same gather-free expansion, but the merge sorts under column-major
    keys, so the one stable sort is a k-way merge of each C column's
    sorted contributions and the result materializes directly as CSC
    with in-column rows sorted by construction — a distinct numeric
    engine, not a transpose wrapper around the row-wise path."""
    from g4s_tpu.sparse.containers import CSC
    if plan is None:
        plan = esc_plan(a, b, order_by="col")
    c_data = esc_numeric(np.asarray(a.data), np.asarray(b.data), plan)
    return CSC(plan.c_indptr, plan.c_indices, c_data, plan.shape)
