"""Block-ESC SpGEMM: the gather-free engine at dense-block granularity.

FE stiffness matrices have bs x bs dense node blocks by construction
(CitcomS: 3 dofs/node, 24x24 element stiffness scattered on the node
incidence, Element_calculations.c:475-509); K @ K on such a matrix is
the workload-shaped SpGEMM case the reference's mm corpus drives
(mkl_spgemm.cpp:67-81 on suite_sparse members). The scalar ESC engine
(ops/spgemm_esc.py) prices this badly: flop/nnz ~ 144 blows the
expand-sort-compress stream to ~300M products, and the single stable
sort of that stream dominates.

At block granularity the SAME plan machinery runs on the node pattern:
25-30x fewer sort keys (one per block pair-product instead of one per
scalar product), with the bs*bs=9 block components riding the one sort
as payload operands. The expand phase computes each pair's 3x3 block
product as 27 broadcast-multiplies of (nb, Mh, W) class tiles — pure
VPU-elementwise work, no tiny-matmul lowering. Layouts keep the
component axis LEADING ((bs*bs, N) — a trailing dim of 3 would pad to
the 128-lane tile, a 42x memory blowup on TPU).

Two host-side composition tricks keep the numeric gather-free:
  * the scalar CSR -> block-slab map is composed at plan time
    (entry e -> block t -> slab slot p(t), component c) so ONE small
    sort + ONE monotone spread moves a.data straight into the
    (bs*bs, na) class slabs — no intermediate BCSR array;
  * blocks with missing scalar entries (eliminate_zeros holes, ~3.5%
    on the CitcomS K) read 0 from the spread's fill — dense-block
    algebra with explicit zeros, pruned only if a scalar CSR is asked
    for.

Output is BCSR: (block indptr, block indices, (bs*bs, nnz_b) data) —
device-resident, component-major. `block_c_to_scipy` re-inflates for
host validation against scipy.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.ops.shifts import compact, runsum, spread, stages_for
from g4s_tpu.ops.spgemm_esc import ESCPlan, esc_plan
from g4s_tpu.sparse.containers import CSR


def block_cover(a: CSR, bs: int) -> float:
    """Fraction of a bs-block cover that is real entries (1.0 = perfect
    blocks). Cheap host statistic for dispatch decisions."""
    if a.shape[0] % bs or a.shape[1] % bs:
        return 0.0
    sp = a.to_scipy().tocoo()
    ids = (sp.row // bs).astype(np.int64) * (a.shape[1] // bs) \
        + sp.col // bs
    return a.nnz / (np.unique(ids).size * bs * bs)


@dataclasses.dataclass(frozen=True)
class BlockPlan:
    """Static schedule for C = A @ B over bs x bs blocks."""

    plan: ESCPlan               # scalar ESC plan on the BLOCK pattern
    bs: int
    shape: Tuple[int, int]      # scalar shape
    # scalar-CSR -> component-major slab maps (one sort + one spread)
    a_rank: jax.Array           # (nnz_a,) int32
    a_d: jax.Array              # (bs*bs*na,) int32 spread dists (-1 dead)
    t_a: int
    b_rank: jax.Array           # (nnz_b,)
    b_d: jax.Array              # (bs*bs*nb_len,)
    t_b: int
    nnz_a: int
    nnz_b: int

    @property
    def c_indptr(self):         # block CSR structure of C
        return self.plan.c_indptr

    @property
    def c_indices(self):
        return self.plan.c_indices

    @property
    def nnz_blocks(self) -> int:
        return self.plan.nnz


def _block_pattern(a: CSR, bs: int):
    """Host: block-cover pattern of a + per-entry (block id, component)."""
    m, n = a.shape
    if m % bs or n % bs:
        raise ValueError(f"shape {a.shape} not divisible by bs={bs}")
    sp = a.to_scipy()
    sp.sort_indices()
    coo = sp.tocoo()            # data order == CSR entry order
    nbc = n // bs
    # int32 id stream when the block shape allows (half the memory
    # traffic through the div/mod/searchsorted passes)
    idt = np.int32 if (m // bs) * nbc < (1 << 31) else np.int64
    br = (coo.row // bs).astype(idt)
    bc = (coo.col // bs).astype(idt)
    comp = (coo.row % bs).astype(np.int64) * bs + coo.col % bs
    ids = br * idt(nbc) + bc
    # block cover pattern: scipy's COO->CSR C path dedups/sorts ~4x
    # faster than np.unique on the id stream; entry -> block position
    # then falls out of one searchsorted against the row-major-sorted
    # unique ids
    import scipy.sparse as _sps
    pat = _sps.coo_matrix(
        (np.ones(ids.size, np.float32), (br, bc)),
        shape=(m // bs, nbc)).tocsr()
    pat.sort_indices()
    uids = np.repeat(
        np.arange(pat.shape[0], dtype=idt),
        np.diff(pat.indptr)) * idt(nbc) + pat.indices.astype(idt)
    inv = np.searchsorted(uids, ids)
    pat.data[:] = 1.0
    return CSR.from_scipy(pat), inv, comp


def _slab_pos(rank: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Compose the inner plan's (rank-sort, spread) into per-entry slab
    positions: entry t lands at rank[t] + d[rank[t]] (or -1 if dead).
    Inactive entries carry an INT32_MAX sentinel rank (sorted to the
    tail, never spread)."""
    pos1 = np.asarray(rank, np.int64)
    dd = np.asarray(d, np.int64)
    live = pos1 < dd.shape[0]
    dpos = np.where(live, dd[np.minimum(pos1, dd.shape[0] - 1)], -1)
    return np.where(dpos >= 0, pos1 + dpos, -1)


def _entry_map(inv: np.ndarray, comp: np.ndarray, slab_of_block,
               slab_len: int, bs: int):
    """Scalar entry e -> flat component-major slab target
    comp[e] * slab_len + slab_of_block[inv[e]]; returns the (rank,
    spread-dists, stages) triple that realizes the map gather-free.

    Sort-free: targets are inverted through two O(n) scatters (slab
    slot -> block, block slot -> entry) instead of an O(n log n)
    argsort of the entry stream — this map sits on the cold-start
    critical path."""
    k2 = bs * bs
    nnz = inv.size
    nblk = slab_of_block.size
    out_len = k2 * slab_len
    # slab position -> block index (injective where live)
    inv_slab = np.full(slab_len, -1, np.int64)
    blive = slab_of_block >= 0
    inv_slab[slab_of_block[blive]] = np.nonzero(blive)[0]
    # (block, component) slot -> entry index (holes: missing scalar
    # entries inside a covered block)
    eid = np.full(nblk * k2, -1, np.int64)
    eid[inv * k2 + comp] = np.arange(nnz, dtype=np.int64)
    # walk slab-major component-major target order: g[c, p] = entry
    # destined for flat slot c*slab_len + p
    g = np.where(inv_slab[None, :] >= 0,
                 eid[np.maximum(inv_slab[None, :], 0) * k2
                     + np.arange(k2, dtype=np.int64)[:, None]],
                 -1).ravel()
    tgt_live = np.nonzero(g >= 0)[0]          # targets, ascending
    order = g[tgt_live]                       # entries in target order
    n_live = order.size
    rank = np.full(nnz, np.iinfo(np.int32).max, np.int32)
    rank[order] = np.arange(n_live, dtype=np.int32)
    # dead entries (block inactive in this product): stable tail ranks
    dead = np.nonzero(rank == np.iinfo(np.int32).max)[0]
    rank[dead] = np.arange(n_live, nnz, dtype=np.int32)
    d = np.full(out_len, -1, np.int32)
    dist = tgt_live - np.arange(n_live, dtype=np.int64)
    d[:n_live] = dist.astype(np.int32)
    t = stages_for(int(dist.max(initial=0)))
    return rank, d, t


@partial(jax.jit, static_argnames=("out_len",))
def _expand_dists(mask_bits, out_len):
    """Dense monotone spread distances from a packed live-slot bit mask:
    live slot p receives entry i = rank(p); d[i] = p - i; dead -1. ONE
    small upload (out_len/8 bytes) replaces an out_len int32 array."""
    mask = jnp.unpackbits(mask_bits)[:out_len].astype(jnp.int32)
    ranks = jnp.cumsum(mask) - mask
    p = jax.lax.iota(jnp.int32, out_len)
    idx = jnp.where(mask == 1, ranks, out_len)
    upd = jnp.where(mask == 1, p - ranks, 0)
    return jnp.full((out_len + 1,), -1, jnp.int32) \
        .at[idx].set(upd)[:out_len]


@partial(jax.jit, static_argnames=("m2", "flops"))
def _expand_dpad(real_bits, m2, flops):
    """Pad-compaction distances from the packed real-slot mask (same
    construction as the symbolic's device pass)."""
    mask = jnp.unpackbits(real_bits)[:m2].astype(jnp.int32)
    f_excl = jnp.cumsum(mask) - mask
    return jnp.where(mask == 1, jax.lax.iota(jnp.int32, m2) - f_excl, 0)


@partial(jax.jit, static_argnames=("flops",))
def _expand_dhead(head_pos, head_dist, flops):
    """Dense head-compaction distances from the sparse (position,
    distance) pairs — nnz entries instead of F."""
    return jnp.zeros((flops + 1,), jnp.int32) \
        .at[head_pos].set(head_dist)[:flops]


def _pack_live_mask(d: np.ndarray, out_len: int) -> np.ndarray:
    """Packed bit mask of the slab slots a spread-distance array maps
    its (prefix) live entries to."""
    live = d[d >= 0]
    n_live = live.size
    mask = np.zeros(out_len, np.uint8)
    mask[np.arange(n_live, dtype=np.int64) + live.astype(np.int64)] = 1
    return np.packbits(mask)


def block_plan(a: CSR, b: CSR, bs: int = 3) -> BlockPlan:
    """Symbolic phase: scalar ESC plan on the block cover + composed
    scalar-entry -> slab maps. Pure host work (native plan core used
    when available), O(nnz) + O(block flops).

    Cold start is metadata-UPLOAD-bound on a tunneled accelerator, so
    the O(flop)-sized distance arrays ship as packed bit masks / sparse
    pairs / int8 (~55 MB instead of ~140 MB on the CitcomS K) and are
    expanded to their dense device forms by three tiny jitted prep
    programs, once per plan."""
    pa, inv_a, comp_a = _block_pattern(a, bs)
    if b is a:
        pb, inv_b, comp_b = pa, inv_a, comp_a
    else:
        pb, inv_b, comp_b = _block_pattern(b, bs)
    plan = esc_plan(pa, pb)
    sa = _slab_pos(plan.a_rank, plan.d_a)
    sb = _slab_pos(plan.b_rank, plan.d_b)
    # A block element A[p, r] multiplies as the LEFT factor: component
    # layout index p*bs + r. B[r, q] is the RIGHT factor: r*bs + q.
    # Both happen to equal (row%bs)*bs + col%bs in their own matrices.
    a_rank, a_d, t_a = _entry_map(inv_a, comp_a, sa, plan.na, bs)
    b_rank, b_d, t_b = _entry_map(inv_b, comp_b, sb, plan.nb_len, bs)
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(np.asarray(x), dev)
    k2 = bs * bs
    m2, F, nnz_c = plan.m2, plan.flops, plan.nnz

    # d_pad -> packed real-slot mask. Real slots after the first pad
    # all have d > 0; the d == 0 reals are exactly the contiguous
    # prefix, recovered from the total count F.
    d_pad_h = np.asarray(plan.d_pad)
    real = d_pad_h > 0
    prefix = F - int(real.sum())
    real[:prefix] = True
    d_pad_dev = _expand_dpad(put(np.packbits(real.astype(np.uint8))),
                             m2=m2, flops=F)

    # d_head -> sparse (head position, distance). Heads with d == 0 are
    # the contiguous prefix of the sorted stream (head k at position k).
    d_head_h = np.asarray(plan.d_head)
    hp = np.nonzero(d_head_h)[0]
    hprefix = nnz_c - hp.size
    head_pos = np.concatenate(
        [np.arange(hprefix, dtype=np.int64), hp]).astype(np.int32)
    head_dist = np.concatenate(
        [np.zeros(hprefix, np.int32), d_head_h[hp]])
    d_head_dev = _expand_dhead(put(head_pos), put(head_dist), flops=F)

    # off_c -> int8 when the run offsets fit (t_sum stages bound 2^t-1)
    off_h = np.asarray(plan.off_c)
    off_dev = put(off_h.astype(np.int8)).astype(jnp.int32) \
        if (1 << plan.t_sum) - 1 <= 127 else put(off_h)

    # a_d / b_d -> packed slab live masks
    a_d_dev = _expand_dists(put(_pack_live_mask(a_d, k2 * plan.na)),
                            out_len=k2 * plan.na)
    b_d_dev = _expand_dists(put(_pack_live_mask(b_d, k2 * plan.nb_len)),
                            out_len=k2 * plan.nb_len)

    # the inner plan's own a_rank/b_rank/d_a/d_b (block-entry maps) are
    # not consumed by the block numeric — leave them host-side
    plan = dataclasses.replace(
        plan, d_pad=d_pad_dev,
        keys=put(plan.keys),
        keys_minor=(None if plan.keys_minor is None
                    else put(plan.keys_minor)),
        off_c=off_dev, d_head=d_head_dev)
    return BlockPlan(
        plan=plan, bs=bs, shape=a.shape[:1] + b.shape[1:],
        a_rank=put(a_rank), a_d=a_d_dev, t_a=t_a,
        b_rank=put(b_rank), b_d=b_d_dev, t_b=t_b,
        nnz_a=a.nnz, nnz_b=b.nnz)


@partial(jax.jit, static_argnames=("bs", "classes", "na", "nb_len", "m2",
                                   "flops", "nnz", "t_sa", "t_sb", "t_pad",
                                   "t_sum", "t_head"))
def _block_numeric_impl(a_data, b_data, a_rank, a_d, b_rank, b_d, d_pad,
                        keys, keys_minor, off_c, d_head, *, bs, classes,
                        na, nb_len, m2, flops, nnz, t_sa, t_sb, t_pad,
                        t_sum, t_head):
    k2 = bs * bs

    def to_slabs(data, rank, d, slab_len, t):
        v = jax.lax.sort((rank, data), num_keys=1)[1]
        pad = k2 * slab_len - v.shape[0]
        if pad > 0:
            v = jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
        elif pad < 0:
            # more entries than slab slots: the excess is all dead
            # (inactive block columns/rows), rank-sorted to the tail
            v = v[:k2 * slab_len]
        return spread(v, d, t).reshape(k2, slab_len)

    xa = to_slabs(a_data, a_rank, a_d, na, t_sa)        # (bs*bs, na)
    xb = to_slabs(b_data, b_rank, b_d, nb_len, t_sb)    # (bs*bs, nb_len)
    # stage barriers: without them XLA cross-fuses the k2-operand
    # streams across stage boundaries and the program runs ~11x slower
    # (recompute/spill blowup, measured 1746 ms vs 154 ms on the
    # CitcomS K); each stage alone is layout-clean, so pin the cuts
    xa, xb = jax.lax.optimization_barrier((xa, xb))

    # expand: per class, per output component (p, q), the block product
    # sum_r A[p,r] * B[r,q] as bs broadcast-multiplies of (nb, Mh, W)
    parts = [[] for _ in range(k2)]
    for nb, mh, w, aoff, boff in classes:
        ta = jax.lax.dynamic_slice_in_dim(xa, aoff, nb * mh, axis=1) \
            .reshape(bs, bs, nb, mh)
        tb = jax.lax.dynamic_slice_in_dim(xb, boff, nb * w, axis=1) \
            .reshape(bs, bs, nb, w)
        for p in range(bs):
            for q in range(bs):
                acc = None
                for r in range(bs):
                    term = ta[p, r][:, :, None] * tb[r, q][:, None, :]
                    acc = term if acc is None else acc + term
                parts[p * bs + q].append(acc.reshape(-1))
    prod = tuple(jnp.concatenate(ps) if len(ps) > 1 else ps[0]
                 for ps in parts)                       # k2 x (m2,)
    prod = jax.lax.optimization_barrier(prod)

    # compress: drop pads, ONE sort with k2 payload operands, reduce
    prod = tuple(x[:flops] for x in compact(prod, d_pad, t_pad))
    prod = jax.lax.optimization_barrier(prod)
    if keys_minor is None:
        srt = jax.lax.sort((keys,) + prod, num_keys=1)[1:]
    else:
        srt = jax.lax.sort((keys, keys_minor) + prod, num_keys=2)[2:]
    srt = jax.lax.optimization_barrier(srt)
    sums = tuple(runsum(x, off_c, t_sum) for x in srt)
    sums = jax.lax.optimization_barrier(sums)
    heads = compact(sums, d_head, t_head)
    return jnp.stack([h[:nnz] for h in heads])          # (bs*bs, nnz_b)


def block_numeric(a_data, b_data, bp: BlockPlan):
    """Value phase: C block data (component-major (bs*bs, nnz_blocks),
    component index p*bs+q) from the SCALAR CSR value arrays of A and B.
    Jit-safe, reusable across value updates on fixed sparsity."""
    p = bp.plan
    return _block_numeric_impl(
        jnp.asarray(a_data), jnp.asarray(b_data), bp.a_rank, bp.a_d,
        bp.b_rank, bp.b_d, p.d_pad, p.keys, p.keys_minor,
        p.off_c, p.d_head, bs=bp.bs,
        classes=p.classes, na=p.na, nb_len=p.nb_len, m2=p.m2,
        flops=p.flops, nnz=p.nnz, t_sa=bp.t_a, t_sb=bp.t_b,
        t_pad=p.t_pad, t_sum=p.t_sum, t_head=p.t_head)


def spgemm_block(a: CSR, b: CSR, bs: int = 3,
                 plan: Optional[BlockPlan] = None):
    """C = A @ B through the block-ESC engine. Returns (plan, c_data)
    with c_data component-major (bs*bs, nnz_blocks) on device; block
    CSR structure lives on the plan."""
    if plan is None:
        plan = block_plan(a, b, bs)
    return plan, block_numeric(np.asarray(a.data), np.asarray(b.data),
                               plan)


def block_c_to_scipy(bp: BlockPlan, c_data, *, prune: bool = True):
    """Host re-inflation of the BCSR result to a scalar scipy CSR
    (validation / interchange path). prune drops the explicit zeros
    that dense-block storage carries for block-cover holes."""
    import scipy.sparse as sps
    bs = bp.bs
    dat = np.asarray(c_data).reshape(bs, bs, -1).transpose(2, 0, 1)
    out = sps.bsr_matrix((dat, bp.c_indices, bp.c_indptr),
                         shape=bp.shape, blocksize=(bs, bs)).tocsr()
    if prune:
        out.eliminate_zeros()
    return out
