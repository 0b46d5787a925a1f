"""Operator-level strategy dispatch: the engine chooses the execution FORM
of a linear operator, not just a sparse layout.

This is the seam the reference exposes as `assemble_del2_u`'s dispatch
between the element-by-element graph-engine path and the preassembled
nodal path (citcoms/lib/Element_calculations.c:428-443 chooses
e_assemble_del2_u vs n_assemble_del2_u), generalized: workloads register
apply rules for each form they can provide, and `build_operator` picks one
from trace-time structure statistics. The CitcomS Stokes matvec and any
future block-structured operator route through here, so the G4S thesis —
one engine owning the execution strategy for all workloads — holds on the
hot paths, not just in the mxv tests.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict

import jax

_APPLY_RULES: Dict[str, Callable] = {}


def register_operator_variant(name: str, apply_fn: Callable) -> None:
    """Register `apply_fn(data, u) -> v` as the executor for `name`."""
    _APPLY_RULES[name] = apply_fn


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class OperatorGraph:
    """A linear operator staged for the engine with a chosen form."""

    data: Any                                      # pytree the rule consumes
    variant: str = dataclasses.field(metadata=dict(static=True))


def build_operator(candidates: Dict[str, Any], *, stats: Dict) -> OperatorGraph:
    """Pick the execution form from structure statistics (host-side, once).

    Preference order:
      'stencil' — regular tensor grid: the matvec is shifted block
                  multiply-adds, gather/scatter-free (the TPU analog of the
                  reference's nodal Eqn_k path, n_assemble_del2_u:516);
                  requires stats['regular_grid'].
      'eltk'    — element-by-element gather/24x24/scatter (the graph-engine
                  path, e_assemble_del2_u:475); always available.
    """
    if "stencil" in candidates and stats.get("regular_grid", False):
        return OperatorGraph(candidates["stencil"], "stencil")
    for name in ("eltk",):
        if name in candidates:
            return OperatorGraph(candidates[name], name)
    # fall back to any registered candidate, deterministically
    name = sorted(candidates)[0]
    return OperatorGraph(candidates[name], name)


def apply_operator(g: OperatorGraph, u):
    """v = A u through the chosen form's registered rule."""
    try:
        rule = _APPLY_RULES[g.variant]
    except KeyError:
        raise KeyError(f"no apply rule registered for operator variant "
                       f"{g.variant!r}; call register_operator_variant")
    return rule(g.data, u)
