"""Monotone stream movement via conflict-free log-shifts.

Four primitives that move data along a flat stream using only static
rolls, selects and elementwise masks — the vector ops TPU executes at
memory bandwidth — with no gathers, scatters or sorts:

  spread(x, d, T)    forward scatter:  out[i + d[i]] = x[i], d monotone
  compact(x, d, T)   backward gather:  out[i] = x[i + dist of slot i]
  bitfill(x, bits, T) doubling broadcast: slot k copies from
                     k - (bits[k] mod 2^T) (run-head broadcast)
  runsum(x, off, T)  per-run sums accumulated at run heads

`spread`/`compact` implement the classical stable stream
expansion/compaction by binary decomposition of the move distance:
stage t moves elements whose distance has bit t set by 2^t. For
monotone non-decreasing distances this is conflict-free: writing
s = start index, c = distance, two live elements i < j sit at
s_i - (c_i mod M) and s_j - (c_j mod M) after the stages with
2^t < M; since s_j - s_i >= (j - i) + (c_j - c_i) and
(c_j mod M) - (c_i mod M) <= c_j - c_i, their positions stay
distinct at every stage (compaction; the spread argument is the
time-reverse). Distances ride along as data, so no per-stage masks
need precomputing: an element consumes bit t of its distance when it
moves and the stale source copy is killed (d <- 0) so it can never
move again; every destination slot is overwritten by its element's
final hop (or already holds it).

This is the movement layer under the gather-free SpGEMM
(ops/spgemm_esc.py) and complements ops/route.py: routes handle
*arbitrary* static bijections at peak rate but need an expensive
offline Clos/Benes decomposition; these shift nets handle the
*monotone* movements (padding, replication, compaction) with O(n)
host setup — the same division of labor the reference's CPU code has
between its radix re-bucketing (mm/inc/radix_sort.h) and its simple
prefix-sum copy loops (mm/inc/utility.h:167 scan).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def stages_for(max_dist: int) -> int:
    """Number of shift stages needed for distances in [0, max_dist]."""
    return max(int(max_dist).bit_length(), 0)


# ---------------------------------------------------------------------------
# compact: out[i] = x at source slot of dest i (backward moves)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("T", "n_carry"))
def _compact_impl(xs, d, T, n_carry):
    for t in range(T):
        dt = 1 << t
        d_p = jnp.roll(d, -dt)
        take = jnp.bitwise_and(d_p, dt) != 0           # partner moves here
        leave = jnp.bitwise_and(d, dt) != 0            # own element departs
        xs = tuple(jnp.where(take, jnp.roll(x, -dt), x) for x in xs)
        d = jnp.where(take, d_p - dt, jnp.where(leave, 0, d))
    return xs[:n_carry]


def compact(xs, d, T: int):
    """Move element at slot p back to slot p - d[p]; d int32 monotone
    non-decreasing over live elements (dead slots: d = 0 and their value
    becomes garbage unless overwritten). xs: array or tuple of arrays
    moved together. Ascending stages, LSB first."""
    single = not isinstance(xs, (tuple, list))
    t = (xs,) if single else tuple(xs)
    out = _compact_impl(t, jnp.asarray(d, jnp.int32), T, len(t))
    return out[0] if single else out


def compact_np(xs, d, T):
    single = not isinstance(xs, (tuple, list))
    t = [np.array(x) for x in ((xs,) if single else xs)]
    d = np.array(d)
    for s in range(T):
        dt = 1 << s
        d_p = np.roll(d, -dt)
        take = (d_p & dt) != 0
        leave = (d & dt) != 0
        t = [np.where(take, np.roll(x, -dt), x) for x in t]
        d = np.where(take, d_p - dt, np.where(leave, 0, d))
    return t[0] if single else tuple(t)


# ---------------------------------------------------------------------------
# spread: out[i + d[i]] = x[i] (forward moves, time-reverse of compact)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("T", "fill"))
def _spread_impl(x, d, T, fill):
    out_dead = jnp.full_like(x, fill)
    alive = d >= 0
    x = jnp.where(alive, x, out_dead)
    d = jnp.where(alive, d, 0)
    for t in range(T - 1, -1, -1):
        dt = 1 << t
        d_p = jnp.roll(d, dt)
        take = jnp.bitwise_and(d_p, dt) != 0
        leave = jnp.bitwise_and(d, dt) != 0
        x = jnp.where(take, jnp.roll(x, dt), x)
        # a slot whose element left and that received nothing is dead
        x = jnp.where(leave & ~take, out_dead, x)
        d = jnp.where(take, d_p - dt, jnp.where(leave, 0, d))
    return x


def spread(x, d, T: int, *, fill=0):
    """out[i + d[i]] = x[i] for live slots (d[i] >= 0, monotone
    non-decreasing over live slots, targets strictly increasing);
    slots nobody lands on read `fill`. Descending stages (MSB first),
    the exact time-reverse of `compact`."""
    return _spread_impl(x, jnp.asarray(d, jnp.int32), T, fill)


def spread_np(x, d, T, *, fill=0):
    x = np.array(x)
    d = np.array(d, np.int64)
    out = np.full_like(x, fill)
    src = np.nonzero(d >= 0)[0]
    out[src + d[src]] = x[src]
    return out


# ---------------------------------------------------------------------------
# bitfill: doubling broadcast from run heads (static offset bits)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("T",))
def _bitfill_impl(x, bits, T):
    for t in range(T):
        m = jnp.bitwise_and(
            jax.lax.shift_right_logical(bits, jnp.int32(t)),
            jnp.int32(1)) != 0
        x = jnp.where(m, jnp.roll(x, 1 << t), x)
    return x


def bitfill(x, bits, T: int):
    """After all stages, slot k holds the value of slot
    k - (bits[k] mod 2^T). With bits[k] = offset of k within its run,
    this broadcasts each run head down the run (the stream_spmv fill,
    exposed for reuse). Cyclic wrap is harmless: a slot k < 2^t always
    has bits[k] <= k, so bit t cannot be set there."""
    return _bitfill_impl(x, jnp.asarray(bits, jnp.int32), T)


def bitfill_np(x, bits, T):
    x = np.array(x)
    bits = np.array(bits)
    for t in range(T):
        m = ((bits >> t) & 1) != 0
        x = np.where(m, np.roll(x, 1 << t), x)
    return x


# ---------------------------------------------------------------------------
# runsum: per-run sums accumulated at run heads (exact tree adds)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("T",))
def _runsum_impl(x, off, T):
    for t in range(T):
        dt = 1 << t
        off_p = jnp.roll(off, -dt)
        same = off_p == off + dt        # partner is dt deeper in my run
        x = x + jnp.where(same, jnp.roll(x, -dt), jnp.zeros_like(x))
    return x


def runsum(x, off, T: int):
    """off[k] = position of k within its contiguous run (0 at head).
    Returns an array whose run-head slots hold the run sums (non-head
    slots hold partial suffix sums). Exact binary-tree adds, no prefix
    cancellation. After stage t, slot k holds the sum of
    x[k .. min(k + 2^(t+1) - 1, run end)]. Wrap-safe: a partner
    wrapped to slot q < 2^t has off[q] <= q < 2^t <= off[k] + 2^t."""
    return _runsum_impl(x, jnp.asarray(off, jnp.int32), T)


def runsum_np(x, off, T):
    x = np.array(x)
    off = np.array(off, np.int64)
    for t in range(T):
        dt = 1 << t
        off_p = np.roll(off, -dt)
        same = off_p == off + dt
        x = x + np.where(same, np.roll(x, -dt), 0)
    return x
