"""The graph engine: mxv/mxm dispatch over layout variants.

This layer replaces the reference's "graph engine that automatically explores
the optimal execution strategy" (README.md:2; the linked spmm_dense library of
citcoms/bin/Citcom.c:45-48 and inlined GraphProcess engines). On TPU the
strategy space is not OpenMP schedules but *layouts and kernels*, and the
exploration happens statically at graph-build time from row statistics — the
same quantities the reference's BIN balancer derives (mm/inc/BIN.h:77-122):
degree histogram, padding waste, skew.

  Graph.build(csr)  -> picks ELL (uniform degrees), SELL (skewed), or CSR
                       (extreme skew) and precomputes gather indices.
  mxv(g, x)         -> one fused gather/multiply/reduce on the chosen layout.
  mxm(a, b)         -> two-phase SpGEMM (see ops/spgemm.py).

Semiring-generic: padded slots are neutralized with the semiring's additive
identity, so min-plus/or-and algebras run through the same kernels.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.engine.semiring import PLUS_TIMES, Semiring
from g4s_tpu.ops.segment import segment_reduce
from g4s_tpu.ops.spgemm import SpGEMMPlan, spgemm_flops, spgemm_plan
from g4s_tpu.sparse.containers import CSR, DIA, ELL
from g4s_tpu.sparse.convert import csr_to_dia, csr_to_ell

_ADD_OPS = {"plus_times": "add", "min_plus": "min", "max_plus": "max",
            "max_times": "max", "or_and": "add"}


def _static():
    return field(metadata=dict(static=True))


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class Graph:
    """A sparse operator staged for the engine.

    Holds the layout the dispatcher chose plus enough metadata to run any
    semiring. `deg` (per-row degree) doubles as the padding mask source.
    """

    ell: Optional[ELL]            # padded layout (ELL/SELL variants)
    csr: Optional[CSR]            # nnz layout (segment-sum variant)
    dia: Optional[DIA]            # banded layout (shifted-multiply variant)
    row_ids: Optional[jax.Array]  # (nnz,) row of each stored entry (CSR path)
    deg: jax.Array                # (n_rows,) true row degrees
    dense: Optional[jax.Array]    # materialized (n_rows, n_cols) (MXU)
    wsell: Optional[object]       # WSELL pack (general Pallas kernel, TPU)
    perm: Optional[jax.Array]     # RCM row/col order (layout stores A[p,p])
    iperm: Optional[jax.Array]    # inverse permutation
    variant: str = _static()      # 'ell' | 'csr' | 'dia' | 'dense'
    shape: Tuple[int, int] = _static()
    # Clos/Benes routing plans for the static permutes (ops/route.py):
    # ~5-10x faster than the sort_key_val fallback at n >= 1M on TPU
    route_in: Optional[object] = None    # applies x -> x[perm]
    route_out: Optional[object] = None   # applies y_p -> y (y[perm[i]]=y_p[i])
    # streaming schedule for unstructured patterns (ops/stream_spmv.py)
    stream: Optional[object] = None

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]


def build_graph(a: CSR, *, variant: str | None = None,
                max_padding_waste: float = 1.5, pad_to: int = 8,
                max_diags: int = 48,
                dense_threshold: int = 1 << 21, dtype=None,
                reorder: bool = True) -> Graph:
    """Static strategy exploration: choose the execution layout from row
    statistics (host-side, once — like the reference engine's per-matrix
    strategy search, but resolved at trace time).

    Order of preference: DIA (banded, gather-free — runs at HBM roofline),
    DENSE (small or dense-ish operators — one MXU matmul beats any gather
    at this size; this is what makes the Cantera StoichManager contraction
    an engine choice, StoichManager.h:63-121), ELL (uniform degrees), CSR
    (extreme skew)."""
    deg = np.diff(np.asarray(a.indptr)).astype(np.int32)
    nnz = max(int(deg.sum()), 1)
    width = int(deg.max()) if deg.size else 0
    waste = (width * a.shape[0] - nnz) / nnz if nnz else 0.0
    size = a.shape[0] * a.shape[1]
    if variant is None:
        if a.shape[0] == a.shape[1] and nnz > 1:
            offs = np.unique(np.asarray(a.indices).astype(np.int64)
                             - np.repeat(np.arange(a.shape[0],
                                                   dtype=np.int64), deg))
            dia_waste = offs.size * a.shape[0] / nnz
            if offs.size <= max_diags and dia_waste <= 2.0 + max_padding_waste:
                variant = "dia"
        if variant is None and 0 < size <= dense_threshold and (
                nnz / size >= 0.05 or size <= 1 << 18):
            variant = "dense"
        if variant is None and reorder and a.shape[0] == a.shape[1] \
                and nnz > 1:
            # no structured layout fits the given numbering: try RCM
            # (the renumbering role the reference's cache blockers play,
            # outer_mult.h:315-353). TPU random gathers run at ~0.5 GB/s
            # while static permutations apply at ~1.6 ms/M via
            # lax.sort_key_val, so a banded-after-RCM matrix is worth two
            # sorts per mxv (and solvers can hoist them entirely).
            from scipy.sparse.csgraph import reverse_cuthill_mckee
            sp_a = a.to_scipy().tocsr()
            perm = np.asarray(reverse_cuthill_mckee(sp_a, symmetric_mode=False))
            ap = sp_a[perm][:, perm].tocsr()
            deg_p = np.diff(ap.indptr).astype(np.int64)
            offs_p = np.unique(ap.indices.astype(np.int64)
                               - np.repeat(np.arange(ap.shape[0],
                                                     dtype=np.int64), deg_p))
            dia_waste_p = offs_p.size * ap.shape[0] / nnz
            if offs_p.size <= max_diags and \
                    dia_waste_p <= 2.0 + max_padding_waste:
                inv = np.empty_like(perm)
                inv[perm] = np.arange(perm.size)
                dia = csr_to_dia(CSR.from_scipy(ap)).to_device()
                rin, rout = _route_plans(perm, inv)
                return Graph(None, None, dia, None, jnp.asarray(deg),
                             None, None, jnp.asarray(perm.astype(np.int32)),
                             jnp.asarray(inv.astype(np.int32)), "dia",
                             a.shape, rin, rout)
            if jax.default_backend() == "tpu":
                # RCM localized but not to a narrow band (mesh matrices:
                # bandwidth ~n^(2/3)) -> the general WSELL-K Pallas
                # kernel (per-pack dynamic x windows; 243 GB/s measured
                # on a shuffled 3D 7-point stencil at n=1M vs 1.3 GB/s
                # for the XLA ELL gather fallback)
                from g4s_tpu.ops.pallas_spmv import (pack_wsell,
                                                     wsell_block_sort_perm)
                try:
                    # sort packs by window count (128-block-granular, so
                    # counts are invariant) -> K-homogeneous tiles, each
                    # group's kernel unrolls only the windows it needs
                    sigma = wsell_block_sort_perm(CSR.from_scipy(ap))
                    if sigma is not None:
                        perm = perm[sigma]
                        ap = ap[sigma][:, sigma].tocsr()
                    packed = pack_wsell(CSR.from_scipy(ap))
                    inv = np.empty_like(perm)
                    inv[perm] = np.arange(perm.size)
                    row_ids = np.repeat(
                        np.arange(a.shape[0], dtype=np.int32), deg)
                    rin, rout = _route_plans(perm, inv)
                    return Graph(None, a.to_device(), None,
                                 jnp.asarray(row_ids), jnp.asarray(deg),
                                 None, packed,
                                 jnp.asarray(perm.astype(np.int32)),
                                 jnp.asarray(inv.astype(np.int32)),
                                 "wsell", a.shape, rin, rout)
                except ValueError:
                    pass
        if variant is None and jax.default_backend() == "tpu" \
                and width <= 128 and nnz > 1 and size > dense_threshold:
            # already-local numbering (no reorder / rectangular): try the
            # WSELL pack directly, no permutation
            from g4s_tpu.ops.pallas_spmv import pack_wsell
            try:
                packed = pack_wsell(a)
                row_ids = np.repeat(
                    np.arange(a.shape[0], dtype=np.int32), deg)
                return Graph(None, a.to_device(), None,
                             jnp.asarray(row_ids), jnp.asarray(deg),
                             None, packed, None, None, "wsell", a.shape)
            except ValueError:
                pass
        if variant is None:
            variant = "ell" if waste <= max_padding_waste else "csr"
        if variant == "csr" and jax.default_backend() == "tpu" \
                and nnz >= (1 << 16):
            # unstructured pattern with no usable window locality: the
            # gather-free streaming schedule (expand -> route -> reduce,
            # ops/stream_spmv.py) replaces the ~0.5 GB/s XLA gather path
            from g4s_tpu.ops.stream_spmv import build_stream_plan
            try:
                splan = build_stream_plan(a.to_scipy().tocsr())
                row_ids = np.repeat(
                    np.arange(a.shape[0], dtype=np.int32), deg)
                return Graph(None, a.to_device(), None,
                             jnp.asarray(row_ids), jnp.asarray(deg),
                             None, None, None, None, "stream", a.shape,
                             stream=splan)
            except NotImplementedError:
                pass
    if variant == "dense":
        from g4s_tpu.sparse.convert import csr_to_dense
        d = jnp.asarray(csr_to_dense(a), dtype)
        # keep the CSR container too: non-plus_times semirings and
        # reduce_vector must see stored entries only (a dense layout's
        # structural zeros would corrupt min/max algebras)
        row_ids = np.repeat(np.arange(a.shape[0], dtype=np.int32), deg)
        return Graph(None, a.to_device(), None, jnp.asarray(row_ids),
                     jnp.asarray(deg), d, None, None, None, "dense", a.shape)
    if variant == "wsell":
        from g4s_tpu.ops.pallas_spmv import pack_wsell
        packed = pack_wsell(a)
        row_ids = np.repeat(np.arange(a.shape[0], dtype=np.int32), deg)
        return Graph(None, a.to_device(), None, jnp.asarray(row_ids),
                     jnp.asarray(deg), None, packed, None, None,
                     "wsell", a.shape)
    if variant == "dia":
        dia = csr_to_dia(a).to_device()
        return Graph(None, None, dia, None, jnp.asarray(deg), None,
                     None, None, None, "dia", a.shape)
    if variant == "ell":
        ell = csr_to_ell(a, pad_to=pad_to).to_device()
        return Graph(ell, None, None, None, jnp.asarray(deg), None,
                     None, None, None, "ell", a.shape)
    row_ids = np.repeat(np.arange(a.shape[0], dtype=np.int32), deg)
    d = a.to_device()
    return Graph(None, d, None, jnp.asarray(row_ids), jnp.asarray(deg),
                 None, None, None, None, "csr", a.shape)


def _route_plans(perm: np.ndarray, inv: np.ndarray):
    """Clos/Benes routing plans for the RCM permutes (ops/route.py).

    Host-side one-time work like the RCM ordering itself; pays off when
    mxv is called per-iteration without hoisting (the sort_key_val
    fallback costs ~2.5 ms/M elements, the routed apply ~5-10x less)."""
    if jax.default_backend() != "tpu":
        return None, None
    from g4s_tpu.ops.route import MAX_M, build_permute_plan
    n = perm.size
    # crossover vs the sort fallback measured at ~0.3-0.4M elements
    # (routed apply has a ~250 us 5-kernel launch floor)
    if n < (1 << 19) or n > MAX_M:
        return None, None
    return build_permute_plan(perm), build_permute_plan(inv)


def permute_in(g: Graph, x):
    """x -> permuted space (x[perm]) via the Benes routing plan when one
    was built, else sort (large gathers lower to a ~0.5 GB/s serial
    path on TPU, so even the sort fallback beats jnp.take)."""
    if g.perm is None:
        return x
    if g.route_in is not None:
        from g4s_tpu.ops.route import apply_permute
        n = x.shape[0]
        xp = jnp.zeros((g.route_in.m,), x.dtype).at[:n].set(x)
        return apply_permute(g.route_in, xp)[:n]
    return jax.lax.sort_key_val(g.iperm, x)[1]


def permute_out(g: Graph, y_p):
    """permuted-space result -> original numbering (y[perm[i]] = y_p[i])."""
    if g.perm is None:
        return y_p
    if g.route_out is not None:
        from g4s_tpu.ops.route import apply_permute
        n = y_p.shape[0]
        yp = jnp.zeros((g.route_out.m,), y_p.dtype).at[:n].set(y_p)
        return apply_permute(g.route_out, yp)[:n]
    return jax.lax.sort_key_val(g.perm, y_p)[1]


def mxv(g: Graph, x, *, semiring: Semiring = PLUS_TIMES, mask=None):
    """y = A (+.x) v over the chosen layout.

    GraphBLAS mxv; subsumes the reference's vertex-program gather loop
    (deepmd/source/op/graph.h:21-31: for each vertex, combine over neighbors,
    then apply).
    """
    if g.variant == "dense" and semiring is PLUS_TIMES:
        from g4s_tpu.engine.matmul import dense_matmul
        y = dense_matmul(g.dense, x)
        if mask is not None:
            y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
        return y
    if g.variant == "dense":
        # non-plus_times algebras run on the stored-entry CSR companion so
        # structural zeros never participate (auto-dispatch may pick dense
        # for callers that later use min/max semirings)
        csr = g.csr
        prod = semiring.mul(csr.data, jnp.take(x, csr.indices, axis=0))
        y = segment_reduce(prod, g.row_ids, g.shape[0],
                           op=_ADD_OPS[semiring.name], indices_are_sorted=True)
        if mask is not None:
            y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
        return y
    if g.variant == "dia":
        if semiring is not PLUS_TIMES:
            raise NotImplementedError(
                "DIA layout supports the plus_times semiring only; "
                "build the graph with variant='ell' or 'csr'")
        from g4s_tpu.ops.spmv import spmv_dia
        y = permute_out(g, spmv_dia(g.dia, permute_in(g, x)))
        if mask is not None:
            y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
        return y
    if g.variant == "stream":
        if semiring is PLUS_TIMES:
            from g4s_tpu.ops.stream_spmv import spmv_stream
            y = spmv_stream(g.stream, x)
        else:
            csr = g.csr
            prod = semiring.mul(csr.data, jnp.take(x, csr.indices, axis=0))
            y = segment_reduce(prod, g.row_ids, g.shape[0],
                               op=_ADD_OPS[semiring.name],
                               indices_are_sorted=True)
        if mask is not None:
            y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
        return y
    if g.variant == "wsell":
        if semiring is PLUS_TIMES:
            from g4s_tpu.ops.pallas_spmv import spmv_wsell
            y = permute_out(g, spmv_wsell(g.wsell, permute_in(g, x)))
        else:
            # stored-entry CSR companion for non-plus_times algebras
            csr = g.csr
            prod = semiring.mul(csr.data, jnp.take(x, csr.indices, axis=0))
            y = segment_reduce(prod, g.row_ids, g.shape[0],
                               op=_ADD_OPS[semiring.name],
                               indices_are_sorted=True)
        if mask is not None:
            y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
        return y
    if g.variant == "ell":
        ell = g.ell
        gathered = jnp.take(x, ell.cols, axis=0)
        prod = semiring.mul(ell.vals, gathered)
        if semiring is not PLUS_TIMES:
            w = ell.cols.shape[1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], w), 1)
            valid = lane < g.deg[:, None]
            prod = jnp.where(valid, prod, jnp.asarray(semiring.zero, prod.dtype))
        y = semiring.reduce(prod, axis=1)
    else:
        csr = g.csr
        prod = semiring.mul(csr.data, jnp.take(x, csr.indices, axis=0))
        y = segment_reduce(prod, g.row_ids, g.shape[0],
                           op=_ADD_OPS[semiring.name], indices_are_sorted=True)
    if mask is not None:
        y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
    return y


_ESC_MIN_FLOPS = 1 << 18       # products; below this the take path wins


def mxm(a: CSR, b: CSR, *, semiring: Semiring = PLUS_TIMES, plan=None) -> CSR:
    """C = A (+.x) B through the two-phase symbolic/numeric engine.

    Strategy exploration (the dispatcher's job, BIN.h role): for
    plus-times on an accelerator backend with a large product count the
    gather-free ESC engine (ops/spgemm_esc.py) replaces the
    take+segment_sum numeric, which is bound by XLA's serial gather on
    TPU; small products, CPU backends and exotic semirings keep the
    take path (gathers are cheap there, and ESC's broadcast expansion
    is specific to (+,*)). Pass an explicit SpGEMMPlan or ESCPlan to
    pin the engine."""
    from g4s_tpu.ops.spgemm_esc import ESCPlan, esc_numeric, esc_plan
    if plan is None:
        if (semiring is PLUS_TIMES
                and jax.default_backend() not in ("cpu",)
                and spgemm_flops(a, b) // 2 >= _ESC_MIN_FLOPS):
            plan = esc_plan(a, b)
        else:
            plan = spgemm_plan(a, b)
    if isinstance(plan, ESCPlan):
        if semiring is not PLUS_TIMES:
            raise NotImplementedError("ESC plans implement plus_times only")
        c_data = esc_numeric(jnp.asarray(a.data), jnp.asarray(b.data), plan)
        return CSR(plan.c_indptr, plan.c_indices, c_data, plan.shape)
    p = plan.to_device()
    prod = semiring.mul(jnp.take(jnp.asarray(a.data), p.src_a),
                        jnp.take(jnp.asarray(b.data), p.src_b))
    c_data = segment_reduce(prod, p.slot, plan.nnz,
                            op=_ADD_OPS[semiring.name], indices_are_sorted=True)
    return CSR(plan.c_indptr, plan.c_indices, c_data, plan.shape)


def reduce_vector(g: Graph, *, semiring: Semiring = PLUS_TIMES):
    """Reduce all stored values of the operator (GraphBLAS reduce)."""
    if g.variant in ("dense", "wsell"):
        vals = g.csr.data        # stored entries only, not structural zeros
    elif g.variant == "ell":
        vals = g.ell.vals
    elif g.variant == "dia":
        vals = g.dia.vals
    else:
        vals = g.csr.data
    return semiring.reduce(vals)


def vxm(g: Graph, x, *, semiring: Semiring = PLUS_TIMES, mask=None):
    """y = v (+.x) A — the GraphBLAS vxm dual of mxv (y_j = sum_i x_i A_ij).

    This is the orientation relaxation-style vertex programs want
    (propagate states ALONG edges); subsumes the reference's column-wise
    engines (heap_mult.h walks CSC columns the same way).
    """
    if g.variant == "dense" and semiring is PLUS_TIMES:
        from g4s_tpu.engine.matmul import dense_matmul
        y = dense_matmul(x, g.dense)
        if mask is not None:
            y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
        return y
    if g.variant == "dense":
        # stored-entry CSR companion (see mxv): min/max algebras must not
        # see structural zeros
        csr = g.csr
        prod = semiring.mul(csr.data, jnp.take(x, g.row_ids))
        y = segment_reduce(prod, csr.indices, g.shape[1],
                           op=_ADD_OPS[semiring.name])
        if mask is not None:
            y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
        return y
    if g.variant == "dia":
        if semiring is not PLUS_TIMES:
            raise NotImplementedError(
                "DIA layout supports the plus_times semiring only")
        # v^T A over diagonals: y[c] = sum_o vals[o][c-o] * x[c-o] — the
        # mirror of spmv_dia with negated offsets
        n = g.shape[0]
        maxoff = max((abs(o) for o in g.dia.offsets), default=0)
        acc = jnp.zeros((n,), jnp.result_type(g.dia.vals, x))
        xp = permute_in(g, x)
        for i, o in enumerate(g.dia.offsets):
            # row r stores A[r, r+o]; its contribution lands on column r+o
            contrib = g.dia.vals[i] * xp
            shifted = jnp.zeros((n + 2 * maxoff,),
                                contrib.dtype).at[
                maxoff + o: maxoff + o + n].add(contrib)
            acc = acc + shifted[maxoff:maxoff + n]
        acc = permute_out(g, acc)
        if mask is not None:
            acc = jnp.where(mask, acc, jnp.asarray(semiring.zero, acc.dtype))
        return acc
    if g.variant == "ell":
        ell = g.ell
        prod = semiring.mul(ell.vals, x[:, None])
        w = ell.cols.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], w), 1)
        valid = lane < g.deg[:, None]
        zero = jnp.asarray(semiring.zero, prod.dtype)
        prod = jnp.where(valid, prod, zero)
        y = segment_reduce(prod.reshape(-1), ell.cols.reshape(-1),
                           g.shape[1], op=_ADD_OPS[semiring.name])
    else:
        csr = g.csr
        prod = semiring.mul(csr.data, jnp.take(x, g.row_ids))
        y = segment_reduce(prod, csr.indices, g.shape[1],
                           op=_ADD_OPS[semiring.name])
    if mask is not None:
        y = jnp.where(mask, y, jnp.asarray(semiring.zero, y.dtype))
    return y
