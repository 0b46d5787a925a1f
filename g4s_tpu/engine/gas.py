"""Gather/Apply (GAS) vertex-program sugar over the engine.

Preserves the reference's programming model — the user supplies `gather`
(fold an edge into a vertex accumulator) and `apply` (post-process the
accumulator), and the engine owns the execution strategy:

  - spmm_dense ABI: citcoms/bin/Citcom.c:45-48 / citcoms/lib/global_defs.h:854
    (numNodes, degree, edgeWeight, vertexStates -> result via callbacks)
  - GraphProcess: deepmd/source/op/graph.h:21-31 (row-parallel fold)
  - GraphProcess1/2: cantera RedlichKwongMFTP.cpp:942-983 (strided reduction)

On TPU the callbacks are traced jnp functions, vmapped/broadcast over the
whole edge set at once; "strategy exploration" is the layout dispatch in
engine.dispatch.build_graph.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from g4s_tpu.engine.dispatch import Graph


def gather_apply(g: Graph, x, gather: Callable,
                 apply: Optional[Callable] = None):
    """out[i] = apply(i, sum_k gather(w[i,k], x[neighbor_k(i)])).

    `gather(edge_weight, neighbor_state) -> contribution` is applied
    elementwise over all edges (broadcast, so any jnp expression works).
    `apply(accumulator) -> out` post-processes the per-vertex sums.
    Padded ELL slots carry weight 0; gather must map zero-weight edges to a
    zero contribution (true for every multiplicative gather, including all
    three reference callbacks).
    """
    if g.variant == "dense":
        # small operator: fold the whole dense neighbor grid at once; the
        # zero entries contribute nothing for multiplicative gathers
        acc = jnp.sum(gather(g.dense, x[None, :]), axis=1)
        return apply(acc) if apply is not None else acc
    if g.variant == "dia":
        # banded layout: fold each diagonal's edges with the gather callback
        import jax
        from g4s_tpu.engine.dispatch import permute_in, permute_out
        n = g.shape[0]
        maxoff = max((abs(o) for o in g.dia.offsets), default=0)
        xp = jnp.pad(permute_in(g, x), (maxoff, maxoff))
        acc = jnp.zeros((n,), jnp.result_type(g.dia.vals, x))
        for i, o in enumerate(g.dia.offsets):
            xs = jax.lax.dynamic_slice(xp, (maxoff + o,), (n,))
            acc = acc + gather(g.dia.vals[i], xs)
        acc = permute_out(g, acc)
        return apply(acc) if apply is not None else acc
    if g.variant == "ell":
        contrib = gather(g.ell.vals, jnp.take(x, g.ell.cols, axis=0))
        acc = jnp.sum(contrib, axis=1)
    else:
        from g4s_tpu.ops.segment import sorted_segment_sum
        contrib = gather(g.csr.data, jnp.take(x, g.csr.indices, axis=0))
        acc = sorted_segment_sum(contrib, g.row_ids, g.shape[0])
    return apply(acc) if apply is not None else acc


def spmm_dense(edge_weight, vertex_states, gather: Callable,
               apply: Optional[Callable] = None):
    """The degree-regular dense engine entry (spmm_dense ABI).

    edge_weight:   (num_nodes, degree) — dense weights per vertex
    vertex_states: (num_nodes, degree) — neighbor states already gathered
                   (the CitcomS caller packs them per element, cf. the
                   gather callback spec at Element_calculations.c:453-471)
    """
    acc = jnp.sum(gather(edge_weight, vertex_states), axis=1)
    return apply(acc) if apply is not None else acc
