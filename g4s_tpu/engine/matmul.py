"""Dense matmul through the graph engine.

The reference routes the embedding-net matmul through its graph engine
(OptMatmul TF op: deepmd/source/op/opt_matmul.cc:19-65 builds a
degree-regular Graph{numNodes=M, degree=K} and folds each row with a
dot-product gather callback via GraphProcess, graph.h:21-31). Its gradient
is two transposed matmuls (deepmd/source/op/_opt_matmul_grad.py:5-11).

On TPU the optimal execution strategy for that dense degree-regular graph
IS the MXU matmul, so the engine entry lowers to jnp.dot — but it remains
the single seam all workloads share, and it carries the accumulation-dtype
policy (f32 accumulation for bf16 inputs).
"""

from __future__ import annotations

import jax.numpy as jnp


def dense_matmul(x, w, *, accum_dtype=None, precision="highest"):
    """The engine's OptMatmul-equivalent entry: x @ w on the MXU.

    `precision="highest"` keeps f32 inputs at full f32 on the MXU (the
    hardware's default silently rounds them to bf16); pass
    `precision="default"` to opt in to the bf16 fast path per call site.
    """
    pet = accum_dtype
    if pet is None:
        pet = jnp.promote_types(x.dtype, w.dtype)
        if pet == jnp.bfloat16:
            pet = jnp.float32
    return jnp.matmul(x, w, preferred_element_type=pet,
                      precision=precision).astype(
        jnp.promote_types(x.dtype, w.dtype))
