"""Global reductions — the MPI_Allreduce replacement.

Reference semantics: CitcomS's CG dot products reduce over all processors
but must count each *shared* boundary node once — `global_vdot`
(citcoms/lib/Global_operations.c:496-529) multiplies by a 0/1 ownership mask
before the allreduce. Here the mask is an explicit `weight` argument and the
allreduce is `lax.psum` over named mesh axes; sub-communicator reductions
(horizontal/vertical, Regional_parallel_related.c:134-204) are just psum
over a subset of axis names.

SPMD: call inside shard_map/pjit.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
from jax import lax

AxisNames = Union[str, Sequence[str]]


def psum_scalar(x, axes: AxisNames):
    return lax.psum(x, axes if isinstance(axes, str) else tuple(axes))


def pdot(a, b, axes: AxisNames, *, weight=None):
    """Global <a, b> with per-node ownership weights (global_vdot)."""
    local = jnp.vdot(a * weight, b) if weight is not None else jnp.vdot(a, b)
    return psum_scalar(local, axes)


def pnorm2(a, axes: AxisNames, *, weight=None):
    """Global L2 norm."""
    return jnp.sqrt(pdot(a, a, axes, weight=weight))


def pmax(x, axes: AxisNames):
    return lax.pmax(jnp.max(x), axes if isinstance(axes, str) else tuple(axes))


def pmin(x, axes: AxisNames):
    return lax.pmin(jnp.min(x), axes if isinstance(axes, str) else tuple(axes))
