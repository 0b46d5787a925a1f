"""Segment reduction primitives.

On TPU the replacement for the reference's per-thread hash accumulation
(mm/inc/hash_mult.h) and atomic scatter (outer_mult.h:334,347) is the
sorted-segment-sum: contributions are laid out contiguously per segment and
reduced with XLA's segment ops, which compile to scan/scatter-add without any
data races by construction.
"""

from __future__ import annotations

import jax


def segment_sum(data, segment_ids, num_segments: int,
                *, indices_are_sorted: bool = False):
    """Sum `data` into `num_segments` buckets (static segment count)."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def sorted_segment_sum(data, segment_ids, num_segments: int):
    """segment_sum with the sorted-ids contract (fast path on TPU)."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True)


def segment_reduce(data, segment_ids, num_segments: int, op: str = "add",
                   *, indices_are_sorted: bool = False):
    """Generalized segment reduction: op in {add, max, min, mul}."""
    fns = {
        "add": jax.ops.segment_sum,
        "max": jax.ops.segment_max,
        "min": jax.ops.segment_min,
        "mul": jax.ops.segment_prod,
    }
    return fns[op](data, segment_ids, num_segments=num_segments,
                   indices_are_sorted=indices_are_sorted)
