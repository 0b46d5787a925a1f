"""Semirings for the GraphBLAS-style engine.

The reference engine hard-codes (+, *) — its gather callbacks multiply an
edge weight with a vertex state and the engine sums (e.g. the dot-product
gather in citcoms/lib/Element_calculations.c:453-471 and deepmd's OptMatmul
gather lambda, deepmd/source/op/opt_matmul.cc:51-58). The rebuild generalizes
to arbitrary (add, mul) monoid pairs so graph algorithms (min-plus shortest
path, or-and reachability) run through the same mxv/mxm entry points.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Semiring:
    name: str
    add: Callable          # elementwise combine
    mul: Callable
    zero: Any              # additive identity
    add_reduce: Callable   # reduction along an axis: f(x, axis)

    def reduce(self, x, axis=None):
        return self.add_reduce(x, axis=axis)


PLUS_TIMES = Semiring("plus_times", jnp.add, jnp.multiply, 0.0, jnp.sum)
MIN_PLUS = Semiring("min_plus", jnp.minimum, jnp.add, jnp.inf, jnp.min)
MAX_PLUS = Semiring("max_plus", jnp.maximum, jnp.add, -jnp.inf, jnp.max)
OR_AND = Semiring("or_and", jnp.logical_or, jnp.logical_and, False, jnp.any)
MAX_TIMES = Semiring("max_times", jnp.maximum, jnp.multiply, -jnp.inf, jnp.max)
