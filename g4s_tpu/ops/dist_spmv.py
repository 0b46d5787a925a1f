"""Distributed SpMV: row-block sharding over the device mesh.

The reference's "1D row parallelism" (graph-engine vertex striding across
MPI ranks, RedlichKwongMFTP.cpp:949; FLOP-balanced row partitioning,
BIN.h:100-122) maps to: shard the operator's row blocks across devices,
replicate (or all-gather) x, compute local rows, keep y sharded. With
shard_map the collective schedule is explicit and rides ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from g4s_tpu.ops.spmv import spmv_ell
from g4s_tpu.sparse.containers import CSR, ELL
from g4s_tpu.sparse.convert import csr_to_ell


def shard_rows_ell(a: CSR, n_shards: int, *, pad_to: int = 8):
    """Split rows into equal blocks, one ELL block per device, stacked on a
    leading device axis. Rows are padded to a multiple of n_shards."""
    n_rows = a.shape[0]
    rows_per = -(-n_rows // n_shards)
    ell = csr_to_ell(a, pad_to=pad_to)
    w = ell.cols.shape[1]
    cols = np.zeros((n_shards * rows_per, w), np.int32)
    vals = np.zeros((n_shards * rows_per, w), np.asarray(ell.vals).dtype)
    cols[:n_rows] = ell.cols
    vals[:n_rows] = ell.vals
    return (jnp.asarray(cols.reshape(n_shards, rows_per, w)),
            jnp.asarray(vals.reshape(n_shards, rows_per, w)),
            rows_per, a.shape)


def dist_spmv(mesh: Mesh, axis: str, cols, vals, shape, x):
    """y = A @ x with A row-sharded on `axis` and x replicated.

    cols/vals: (n_shards, rows_per, w) sharded on the leading axis.
    Returns y (n_shards * rows_per,) sharded the same way (trim to
    shape[0] on the host if needed).
    """
    def local(c, v, xx):
        ell = ELL(c[0], v[0], (c.shape[1], shape[1]))
        return spmv_ell(ell, xx)[None]

    return shard_map(local, mesh=mesh,
                     in_specs=(P(axis), P(axis), P()),
                     out_specs=P(axis))(cols, vals, x)
