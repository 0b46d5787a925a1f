"""Multi-chip SpGEMM: row-block sharding of A over a device mesh.

The reference parallelizes SpGEMM by FLOP-balanced row partitions across
threads/ranks (mm/inc/BIN.h:100-122 set_rows_offset; heap_mult.h:56-86
column split). On TPU the same strategy maps to one two-phase plan per
row block, padded to a common size and stacked on a leading device axis:
the numeric phase then runs under shard_map with zero communication
(C's rows partition like A's), exactly like the reference's
embarrassingly-parallel numeric stage.

Host symbolic work is done per block (and could itself be threaded);
padded product slots alias slot 0 with 0*0 contributions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from g4s_tpu.ops.segment import sorted_segment_sum
from g4s_tpu.ops.spgemm import spgemm_plan
from g4s_tpu.sparse.containers import CSR


def shard_spgemm_plan(a: CSR, b: CSR, n_shards: int):
    """Per-row-block plans, padded and stacked for shard_map.

    Returns (stacked dict of arrays, meta) where meta carries the block
    row ranges and per-block true nnz for reassembly.
    """
    n_rows = a.shape[0]
    rows_per = -(-n_rows // n_shards)
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    blocks, metas = [], []
    for s in range(n_shards):
        r0, r1 = s * rows_per, min((s + 1) * rows_per, n_rows)
        bi = np.zeros(max(r1 - r0, 0) + 1, indptr.dtype)
        if r1 > r0:
            bi = indptr[r0:r1 + 1] - indptr[r0]
            sub = CSR(bi, indices[indptr[r0]:indptr[r1]],
                      np.asarray(a.data)[indptr[r0]:indptr[r1]],
                      (r1 - r0, a.shape[1]))
            plan = spgemm_plan(sub, b)
            # data offsets of the block map back into the global A.data
            blocks.append(dict(
                src_a=np.asarray(plan.src_a) + indptr[r0],
                src_b=np.asarray(plan.src_b),
                slot=np.asarray(plan.slot),
                nnz=plan.nnz, c_indptr=np.asarray(plan.c_indptr),
                c_indices=np.asarray(plan.c_indices), rows=(r0, r1)))
        else:
            blocks.append(dict(src_a=np.zeros(0, np.int64),
                               src_b=np.zeros(0, np.int64),
                               slot=np.zeros(0, np.int64), nnz=0,
                               c_indptr=np.zeros(1, np.int64),
                               c_indices=np.zeros(0, np.int64),
                               rows=(r0, r0)))
    F_max = max(max(len(bl["src_a"]) for bl in blocks), 1)
    nnz_max = max(max(bl["nnz"] for bl in blocks), 1)
    sa = np.zeros((n_shards, F_max), np.int64)
    sb = np.zeros((n_shards, F_max), np.int64)
    sl = np.full((n_shards, F_max), nnz_max, np.int64)  # pad -> spill slot
    for s, bl in enumerate(blocks):
        f = len(bl["src_a"])
        sa[s, :f], sb[s, :f], sl[s, :f] = (bl["src_a"], bl["src_b"],
                                           bl["slot"])
    stacked = dict(src_a=jnp.asarray(sa), src_b=jnp.asarray(sb),
                   slot=jnp.asarray(sl))
    meta = dict(blocks=blocks, nnz_max=nnz_max, n_shards=n_shards,
                shape=(a.shape[0], b.shape[1]))
    return stacked, meta


def dist_spgemm_numeric(mesh: Mesh, axis: str, stacked, nnz_max: int,
                        a_data, b_data):
    """C.data blocks (n_shards, nnz_max) via shard_map — no collectives:
    every device owns its row block's products end to end."""
    from jax import shard_map

    def local(sa, sb, sl, ad, bd):
        prod = jnp.take(ad, sa[0]) * jnp.take(bd, sb[0])
        # one spill slot at the end swallows padded products
        out = sorted_segment_sum(prod, sl[0], nnz_max + 1)
        return out[None, :nnz_max]

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(axis), P(axis), P(axis), P(), P()),
                  out_specs=P(axis))
    return f(stacked["src_a"], stacked["src_b"], stacked["slot"],
             jnp.asarray(a_data), jnp.asarray(b_data))


def dist_spgemm(a: CSR, b: CSR, mesh: Mesh, axis: str) -> CSR:
    """C = A @ B with A (and C) row-sharded over `mesh[axis]`."""
    n_shards = mesh.shape[axis]
    stacked, meta = shard_spgemm_plan(a, b, n_shards)
    cdata = np.asarray(dist_spgemm_numeric(mesh, axis, stacked,
                                           meta["nnz_max"],
                                           np.asarray(a.data),
                                           np.asarray(b.data)))
    # host reassembly of the global CSR from per-block structures
    indptr = [np.zeros(1, np.int64)]
    indices, data = [], []
    base = 0
    for s, bl in enumerate(meta["blocks"]):
        indptr.append(bl["c_indptr"][1:] + base)
        base += bl["c_indptr"][-1]
        indices.append(bl["c_indices"])
        data.append(cdata[s, :bl["nnz"]])
    return CSR(np.concatenate(indptr), np.concatenate(indices),
               np.concatenate(data), meta["shape"])
