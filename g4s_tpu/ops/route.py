"""Near-bandwidth static permutations on TPU via Clos/Benes routing.

Why: applying an arbitrary static permutation with `jnp.take` hits XLA's
serial gather path (~7 M elem/s measured), `lax.sort_key_val` costs
~2.5 ms per million elements (O(n log^2 n) bitonic passes), and per-row
`take_along_axis` inside Pallas lowers to ~9 GB/s. All cap any sparse
kernel that needs a data reordering. But a *static* permutation is a
routing problem with an offline solution: decompose it into stages TPU
hardware executes at full rate —

  out = B5 . T' . MID . T . B1          (Clos over the (R, 128) view)

  B1/B5: per-row Benes butterfly networks over the 128 lanes — 13 fused
         stages of x = select(bit, x[lane ^ d], x) where the partner
         comes from two static `pltpu.roll`s (measured ~200 GB/s,
         vs 9 GB/s for the take_along_axis gather it replaces),
         end-to-end: 228 us at m=1M / 459 us at m=2M on v5e, 6.7x/7.7x
         the sort_key_val fallback,
  T/T' : full (R,128) <-> (128,R) transposes (XLA relayout, ~333 GB/s),
  MID  : 128 independent row permutations of length R — each an inner
         Clos on the (q,128) view of its row: lane-Benes, sublane-Benes
         (roll along axis 0), lane-Benes, one Pallas kernel per row,
         no inner transposes.

The decompositions exist for every permutation (Slepian-Duguid for the
Clos stages, Benes rearrangeability for the butterflies); both routing
problems reduce to edge coloring bipartite multigraphs, computed
host-side by recursive Euler splits (each split 2-colors an even-degree
multigraph so every vertex gets exactly half of each color).

This plays the role the reference's hand-tiled data movement plays on
CPUs (cache-blocked copy loops in mm/inc/outer_mult.h:315-353 and the
radix re-bucketing of radix_sort.h): a static schedule computed once on
the host, executed at memory speed on device.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

C = 128               # lane width: butterfly granularity
TILE = C * C          # plan granularity: m is padded to a multiple of 128^2
# largest m one plan covers: the middle kernel streams (bl, q2, 128)
# blocks with bl = max(1, 8*128 // q2), so VMEM stays <= ~5 MB up to
# q2 = 2048 (block + 3 bit planes + out at 1 MB each)
MAX_M = C * C * 2048


def _static():
    return field(metadata=dict(static=True))


# ---------------------------------------------------------------------------
# Host: bipartite edge coloring by recursive Euler splits
# ---------------------------------------------------------------------------


def _pair_two_regular(keys: np.ndarray) -> np.ndarray:
    """Partner array for keys in which every value occurs exactly twice:
    p[e] = the other index with the same key. O(m), no sort."""
    m = keys.size
    k_max = int(keys.max()) + 1 if m else 1
    idx = np.arange(m, dtype=np.int32)
    first = np.empty(k_max, np.int32)
    first[keys[::-1]] = idx[::-1]          # last write wins -> first occurrence
    second = np.empty(k_max, np.int32)
    second[keys] = idx                     # last write wins -> second occurrence
    f = first[keys]
    return np.where(f == idx, second[keys], f)


def _euler_split(a: np.ndarray, b: np.ndarray,
                 cycle_bound: Optional[int] = None,
                 two_regular: bool = False) -> np.ndarray:
    """2-color the edges of a bipartite multigraph with all-even degrees so
    that every vertex sees exactly half of each color.

    Pair consecutive edges at each left vertex (pair_L) and each right
    vertex (pair_R); the constraint graph {e ~ pair_L(e), e ~ pair_R(e)}
    is a disjoint union of even alternating cycles, 2-colored by orbit of
    g = pair_L o pair_R (pointer-doubling for the orbit representative;
    `cycle_bound` caps the doubling depth when cycles are known short).
    `two_regular=True` (every vertex degree exactly 2) switches the
    pairing from stable sorts to an O(m) scatter/gather.
    """
    m = a.size
    if m == 0:
        return np.zeros(0, bool)
    if m >= 1 << 15:
        # native O(m) cycle walker (~50x the numpy path at m = 1M)
        from g4s_tpu.runtime.native_lib import euler_split_native
        color = euler_split_native(a, b)
        if color is not None:
            return color
    if two_regular:
        pa = _pair_two_regular(a)
        pb = _pair_two_regular(b)
    else:
        oa = np.argsort(a, kind="stable").astype(np.int32)
        pa = np.empty(m, np.int32)
        pa[oa[0::2]] = oa[1::2]
        pa[oa[1::2]] = oa[0::2]
        ob = np.argsort(b, kind="stable").astype(np.int32)
        pb = np.empty(m, np.int32)
        pb[ob[0::2]] = ob[1::2]
        pb[ob[1::2]] = ob[0::2]
    g = pa[pb]
    rep = np.arange(m, dtype=np.int32)
    nxt = g
    for _ in range(int(np.ceil(np.log2(max(cycle_bound or m, 2)))) + 1):
        rep = np.minimum(rep, rep[nxt])
        nxt = nxt[nxt]
    color = rep > rep[pb]
    return color


def edge_color_bipartite(a: np.ndarray, b: np.ndarray, deg: int,
                         cycle_bound: Optional[int] = None) -> np.ndarray:
    """Color the edges (a[e], b[e]) of a `deg`-regular bipartite multigraph
    with `deg` colors so each vertex sees every color exactly once.
    `deg` must be a power of two. Vectorized over any number of connected
    components (and, by vertex-offsetting, over batches)."""
    if deg & (deg - 1):
        raise ValueError(f"degree {deg} must be a power of two")
    m = a.size
    if m >= 1 << 14 and deg > 1:
        # one native call runs the whole split recursion with reused
        # buffers (~3x the per-level numpy/native mix at 1M edges)
        from g4s_tpu.runtime.native_lib import edge_color_native
        color = edge_color_native(np.asarray(a, np.int64),
                                  np.asarray(b, np.int64), deg)
        if color is not None:
            return color
    color = np.zeros(m, np.int64)
    na = int(a.max()) + 1 if m else 1
    nb = int(b.max()) + 1 if m else 1
    c = 1
    while c < deg:
        # one split pass over all current classes at once: composite
        # vertex id = (class, vertex)
        half = _euler_split(color * na + a, color * nb + b, cycle_bound)
        color = color * 2 + half
        c *= 2
    return color


# ---------------------------------------------------------------------------
# Host: Benes routing for batches of independent row permutations
# ---------------------------------------------------------------------------


def benes_dists(n: int) -> list:
    """Stage distances of the n-lane Benes network: n/2, ..., 2, 1, 2,
    ..., n/2 (2*log2(n) - 1 stages)."""
    k = int(np.log2(n))
    down = [n >> (i + 1) for i in range(k - 1)]
    return down + [1] + down[::-1]


def benes_route(sigma: np.ndarray) -> np.ndarray:
    """Route batched per-row permutations through Benes butterflies.

    sigma: (B, n), each row a bijection on [0, n), n a power of two >= 2.
    Returns bits (B, n) int32: bit s of lane l is the swap bit of stage s
    (distances `benes_dists(n)`). Stage semantic, applied s = 0..S-1:

        x[l] <- x[l ^ d]  if bit else  x[l]

    Bits are pair-symmetric (bit[l] == bit[l ^ d]), so each stage is a
    permutation; composing all stages gives out[i] = in[sigma[i]].

    Routing: at each level the pairs (l, l + h) of inputs and outputs
    form a 2-regular bipartite multigraph (edges = elements, endpoints =
    source/dest pair ids); an Euler split 2-colors it, assigning each
    element to the upper/lower half-size subnetwork; recurse. All rows
    and all recursion branches are split in one vectorized pass using
    composite block ids.
    """
    sigma = np.asarray(sigma, np.int64)
    B, n = sigma.shape
    if n < 2 or n & (n - 1):
        raise ValueError(f"n={n} must be a power of two >= 2")
    if B * n >= 1 << 15:
        from g4s_tpu.runtime.native_lib import benes_route_native
        bits = benes_route_native(sigma)
        if bits is not None:
            return bits
    S = 2 * int(np.log2(n)) - 1
    bits = np.zeros((B, n), np.int32)

    blk = np.repeat(np.arange(B, dtype=np.int64), n)   # recursion block id
    dst = np.tile(np.arange(n, dtype=np.int64), B)     # dest within block
    src = sigma.reshape(-1).copy()                     # source within block
    size, level = n, 0
    while size > 2:
        h = size // 2
        c = _euler_split(blk * h + src % h, blk * h + dst % h,
                         cycle_bound=2 * size, two_regular=True) \
            .astype(np.int64)
        blocks_per_row = 1 << level
        row_id = blk // blocks_per_row
        base = (blk % blocks_per_row) * size   # lane offset within the row
        # input stage `level`: element enters at lane base + src, leaves
        # the stage at base + (src % h) + c*h. Stage positions are hit by
        # exactly one element each, so plain fancy |= is exact (and much
        # faster than ufunc.at).
        bits[row_id, base + (src % h) + c * h] |= \
            ((c != src // h).astype(np.int32)) << level
        # output stage S-1-level: element arrives at base + (dst % h) +
        # c*h and must reach base + dst
        bits[row_id, base + dst] |= \
            ((c != dst // h).astype(np.int32)) << (S - 1 - level)
        blk = blk * 2 + c
        dst = dst % h
        src = src % h
        size, level = h, level + 1
    blocks_per_row = 1 << level
    row_id = blk // blocks_per_row
    base = (blk % blocks_per_row) * 2
    bits[row_id, base + dst] |= ((src != dst).astype(np.int32)) << level
    return bits


# ---------------------------------------------------------------------------
# Host: plan construction
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class PermutePlan:
    """Executable plan for out[i] = in[sigma[i]] over m padded elements."""

    bits1: jax.Array               # (R, 128) int32 — B1 lane-Benes
    bits5: jax.Array               # (R, 128) int32 — B5 lane-Benes
    # middle (on the transposed (128, R2) view, R2 = q2 * 128):
    mid_a: Optional[jax.Array]     # (128, q2, 128) int32 (None when q2 == 1)
    mid_b: Optional[jax.Array]     # (128, q2, 128) int32 — sublane stages
    mid_c: Optional[jax.Array]     # (128, q2, 128) int32
    mid_small: Optional[jax.Array]  # (128, 128) int32 when q2 == 1
    m: int = _static()             # padded length (multiple of 128^2)
    q2: int = _static()            # R2 / 128, a power of two

    @property
    def r_rows(self) -> int:
        return self.m // C


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def build_permute_plan(sigma: np.ndarray) -> PermutePlan:
    """Build the routing plan for out[i] = in[sigma[i]].

    sigma: (m0,) int array, a bijection on [0, m0). The plan pads to
    m = roundup(m0, 16384) with identity on the tail; callers pad the
    input stream with anything (tail positions map to tail positions).
    """
    sigma = np.asarray(sigma, np.int64)
    m0 = sigma.size
    m = -(-m0 // TILE) * TILE
    if m > MAX_M:
        raise NotImplementedError(
            f"m={m} exceeds the single-plan limit {MAX_M}; chunk the "
            "stream or extend the middle to depth 2")
    if m0 < m:
        sigma = np.concatenate([sigma, np.arange(m0, m, dtype=np.int64)])
    R = m // C

    d = np.arange(m, dtype=np.int64)
    s = sigma
    a = s // C                       # source row of each dest element
    b = d // C                       # dest row
    col1 = edge_color_bipartite(a, b, C)

    # B1: per-row perm p1 with p1[a, col1] = s % 128
    p1 = np.empty((R, C), np.int64)
    p1[a, col1] = s % C
    # after B1 + T: element sits at (col1, a) in the (128, R) view.
    # middle row perms: for lane c, dest row-slot b <- source row a
    mid = np.empty((C, R), np.int64)
    mid[col1, b] = a
    # B5: per-row perm p5 with p5[b, d % 128] = col1
    p5 = np.empty((R, C), np.int64)
    p5[b, d % C] = col1

    # 128-lane Benes = 13 stages -> the bit planes fit int16, halving
    # the plan's HBM traffic per butterfly pass
    bits1 = jnp.asarray(benes_route(p1).astype(np.int16))
    bits5 = jnp.asarray(benes_route(p5).astype(np.int16))

    q = R // C
    q2 = max(_next_pow2(q), 1)
    R2 = q2 * C
    if R2 > R:
        # pad each middle row perm with identity on [R, R2)
        pad = np.broadcast_to(np.arange(R, R2, dtype=np.int64), (C, R2 - R))
        mid = np.concatenate([mid, pad], axis=1)

    if q2 == 1:
        return PermutePlan(bits1, bits5, None, None, None,
                           jnp.asarray(benes_route(mid)
                                       .astype(np.int16)), m, 1)

    # inner Clos for the 128 length-R2 row permutations, batched.
    # Row c's stream viewed as (q2, 128): inner dest bi at (bi//128,
    # bi%128), inner source ai = mid[c, bi].
    bi = np.tile(np.arange(R2, dtype=np.int64), C)
    ai = mid.reshape(-1)
    lane_of = np.repeat(np.arange(C, dtype=np.int64), R2)
    A = ai // C                      # inner source row
    B = bi // C                      # inner dest row
    # alternating cycles of each split live within one lane's component:
    # at most 2 * (q2 * 128) edges
    col2 = edge_color_bipartite(lane_of * q2 + A, lane_of * q2 + B, C,
                                cycle_bound=2 * q2 * C)

    # stage A (lane-Benes per inner row): (A, ai%128) -> (A, col2)
    pA = np.empty((C, q2, C), np.int64)
    pA[lane_of, A, col2] = ai % C
    # stage B (sublane-Benes per inner column): (A, col2) -> (B, col2)
    pB = np.empty((C, C, q2), np.int64)      # indexed [c, column, B]
    pB[lane_of, col2, B] = A
    # stage C (lane-Benes per inner row): (B, col2) -> (B, bi%128)
    pC = np.empty((C, q2, C), np.int64)
    pC[lane_of, B, bi % C] = col2

    mid_a = benes_route(pA.reshape(C * q2, C)).reshape(C, q2, C)
    mid_c = benes_route(pC.reshape(C * q2, C)).reshape(C, q2, C)
    # per-column bits: route (c*128 + column) rows of length q2, then lay
    # out as (c, sublane, column)
    mid_b = benes_route(pB.reshape(C * C, q2)).reshape(C, C, q2) \
        .transpose(0, 2, 1).copy()
    # mid_b carries 2*log2(q2)-1 stage bits: int16 up to q2 = 256
    bt = np.int16 if 2 * int(np.log2(q2)) - 1 <= 15 else np.int32
    return PermutePlan(bits1, bits5, jnp.asarray(mid_a.astype(np.int16)),
                       jnp.asarray(mid_b.astype(bt)),
                       jnp.asarray(mid_c.astype(np.int16)), None, m, q2)


# ---------------------------------------------------------------------------
# Numpy reference executor (oracle for tests; also documents the algebra)
# ---------------------------------------------------------------------------


def _np_stages(x: np.ndarray, bits: np.ndarray, dists, axis: int):
    n = x.shape[axis]
    idx = np.arange(n)
    for st, dd in enumerate(dists):
        mask = ((bits >> np.int32(st)) & 1) != 0
        partner = np.take(x, idx ^ dd, axis=axis)
        x = np.where(mask, partner, x)
    return x


def apply_permute_np(plan: PermutePlan, z: np.ndarray) -> np.ndarray:
    """Reference implementation of the staged permutation."""
    m, q2 = plan.m, plan.q2
    R = m // C
    R2 = q2 * C
    d128 = benes_dists(C)
    z = _np_stages(z.reshape(R, C), np.asarray(plan.bits1), d128, 1)
    z2 = z.T                                     # (128, R)
    if q2 == 1:
        z3 = _np_stages(z2, np.asarray(plan.mid_small), d128, 1)
    else:
        v = np.concatenate(
            [z2, np.zeros((C, R2 - R), z2.dtype)], axis=1) \
            .reshape(C, q2, C)
        v = _np_stages(v, np.asarray(plan.mid_a), d128, 2)
        v = _np_stages(v, np.asarray(plan.mid_b), benes_dists(q2), 1)
        v = _np_stages(v, np.asarray(plan.mid_c), d128, 2)
        z3 = v.reshape(C, R2)[:, :R]
    z4 = z3.T                                    # (R, 128)
    out = _np_stages(z4, np.asarray(plan.bits5), d128, 1)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Device executor
# ---------------------------------------------------------------------------


def _stages(x, bits, dists, axis):
    """Fused butterfly stages inside a Pallas kernel: per stage,
    x = select(bit, x[i ^ d along axis], x). The XOR partner is built
    from two static rolls selected by the (compile-time) index bit.
    `bits` may be int16 (stage planes packed small to halve the plan's
    HBM traffic) or int32 (needed only for >15 stages, q2 > 256)."""
    from jax.experimental.pallas import tpu as pltpu
    n = x.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if bits.dtype != jnp.int32:
        # int16 planes halve the DMA; Mosaic has no i16 vector shift, so
        # widen once here (one op per block, 13+ stages amortize it)
        bits = bits.astype(jnp.int32)
    one = jnp.asarray(1, bits.dtype)
    for st, dd in enumerate(dists):
        m = jnp.bitwise_and(
            jax.lax.shift_right_logical(bits, jnp.asarray(st, bits.dtype)),
            one) != 0
        fwd = pltpu.roll(x, n - dd, axis=axis)    # x[i + d]
        bwd = pltpu.roll(x, dd, axis=axis)        # x[i - d]
        partner = jnp.where(jnp.bitwise_and(pos, dd) != 0, bwd, fwd)
        x = jnp.where(m, partner, x)
    return x


def _lane_benes_kernel(d_ref, b_ref, o_ref):
    o_ref[:] = _stages(d_ref[:], b_ref[:], benes_dists(C), 1)


def lane_benes(z2d, bits, *, block_rows: int = 256):
    """Per-row 128-lane Benes butterflies; ~200 GB/s measured on v5e."""
    from jax.experimental import pallas as pl
    R = z2d.shape[0]
    br = min(block_rows, R)
    while R % br:
        br //= 2
    return pl.pallas_call(
        _lane_benes_kernel,
        grid=(R // br,),
        in_specs=[pl.BlockSpec((br, C), lambda r: (r, 0)),
                  pl.BlockSpec((br, C), lambda r: (r, 0))],
        out_specs=pl.BlockSpec((br, C), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct(z2d.shape, z2d.dtype),
    )(z2d, bits)


def _mid_kernel(q2):
    """Middle kernel over blocks of `_MID_LANES` of the 128 column streams:
    lane-Benes (axis 2), sublane-Benes (axis 1), lane-Benes (axis 2)."""
    dl, dq = benes_dists(C), benes_dists(q2)

    def kernel(d_ref, ba_ref, bb_ref, bc_ref, o_ref):
        x = d_ref[:]
        x = _stages(x, ba_ref[:], dl, 2)
        x = _stages(x, bb_ref[:], dq, 1)
        o_ref[:] = _stages(x, bc_ref[:], dl, 2)
    return kernel


def _mid_lanes(q2: int) -> int:
    """Lanes of the 128 column streams per mid grid step: keep each block
    at <= 8*128*128 elements (512 KB f32) regardless of q2."""
    return min(C, max(1, 8 * C // q2))


def apply_permute(plan: PermutePlan, z):
    """Device execution: out[i] = z[sigma[i]] for flat z of length plan.m."""
    from jax.experimental import pallas as pl
    m, q2 = plan.m, plan.q2
    R = m // C
    R2 = q2 * C
    z = lane_benes(z.reshape(R, C), plan.bits1)
    z2 = z.T                                      # (128, R)
    if q2 == 1:
        z3 = lane_benes(z2, plan.mid_small, block_rows=C)
    else:
        v = z2
        if R2 > R:
            v = jnp.concatenate(
                [v, jnp.zeros((C, R2 - R), z2.dtype)], axis=1)
        v = v.reshape(C, q2, C)
        bl = _mid_lanes(q2)
        spec3 = pl.BlockSpec((bl, q2, C), lambda c: (c, 0, 0))
        v = pl.pallas_call(
            _mid_kernel(q2),
            grid=(C // bl,),
            in_specs=[spec3, spec3, spec3, spec3],
            out_specs=spec3,
            out_shape=jax.ShapeDtypeStruct((C, q2, C), z2.dtype),
        )(v, plan.mid_a, plan.mid_b, plan.mid_c)
        z3 = v.reshape(C, R2)
        if R2 > R:
            z3 = z3[:, :R]
    z4 = z3.T                                     # (R, 128)
    return lane_benes(z4, plan.bits5).reshape(-1)


def permute(sigma: np.ndarray):
    """Convenience: returns (plan, apply_fn) where apply_fn(z) permutes a
    flat device array z (padded to plan.m; tail is identity)."""
    plan = build_permute_plan(np.asarray(sigma))
    return plan, lambda z: apply_permute(plan, z)
