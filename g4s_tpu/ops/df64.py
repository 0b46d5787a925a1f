"""Double-word f32 ("df64") arithmetic for the TPU 1e-10 tier.

TPU v5e has no native f64 (and emulated f64 faults the runtime on this
stack — see benchmarks/RESULTS.json:cookbook2_f64). This module carries
every value as an unevaluated pair (hi, lo) of f32 with |lo| <= ulp(hi)/2,
giving ~49 significand bits (~1.8e-15 relative) — enough to track the
reference's f64 CitcomS trajectories (bin/Citcom.c runs entirely in
double) at the BASELINE.md 1e-10 tier while staying on the VPU.

Algorithms are the classical error-free transformations:
  two_sum   Knuth 2Sum (6 flops, branch-free)
  split     Dekker split at 12 bits (f32 has 24-bit significand)
  two_prod  Dekker product via split (no FMA primitive in XLA-TPU jnp)
  add/mul   double-word add/mul (Dekker/Bailey style, |err| ~ 2^-49)

All functions are shape-polymorphic and jit/vmap-safe; a DF value is just
a (hi, lo) tuple of same-shape f32 arrays, so it threads through
lax.while_loop/scan as a pytree.

Role in the rebuild: replaces the f64 arithmetic of the reference's inner
velocity CG (General_matrix_functions.c:307-433 conj_grad) and nodal
stiffness matvec (Element_calculations.c:516-577 n_assemble_del2_u) on
hardware without doubles.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DF = Tuple[jax.Array, jax.Array]

_SPLITTER = np.float32(4097.0)        # 2^12 + 1 for f32 Dekker split


def two_sum(a, b) -> DF:
    """Exact a + b = s + e (Knuth, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b) -> DF:
    """Exact a + b = s + e assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a) -> DF:
    t = _SPLITTER * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b) -> DF:
    """Exact a * b = p + e via Dekker split (no FMA needed)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# double-word ops: x = (xh, xl), |xl| <= ulp(xh)/2
# ---------------------------------------------------------------------------

def df(hi, lo=None) -> DF:
    hi = jnp.asarray(hi, jnp.float32)
    if lo is None:
        lo = jnp.zeros_like(hi)
    return hi, jnp.asarray(lo, jnp.float32)


def add(x: DF, y: DF) -> DF:
    """Accurate double-word add (two 2Sums; ~2^-49 relative even under
    cancellation — the sloppy one-2Sum variant loses to 1e-12 there)."""
    sh, se = two_sum(x[0], y[0])
    th, te = two_sum(x[1], y[1])
    vh, vl = fast_two_sum(sh, se + th)
    return fast_two_sum(vh, te + vl)


def add_f(x: DF, y) -> DF:
    sh, se = two_sum(x[0], y)
    return fast_two_sum(sh, se + x[1])


def neg(x: DF) -> DF:
    return -x[0], -x[1]


def sub(x: DF, y: DF) -> DF:
    return add(x, neg(y))


def mul(x: DF, y: DF) -> DF:
    ph, pe = two_prod(x[0], y[0])
    pe = pe + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(ph, pe)


def mul_f(x: DF, y) -> DF:
    """DF * f32 (y exact)."""
    ph, pe = two_prod(x[0], y)
    pe = pe + x[1] * y
    return fast_two_sum(ph, pe)


def div(x: DF, y: DF) -> DF:
    q1 = x[0] / y[0]
    r = sub(x, mul_f(y, q1))
    q2 = r[0] / y[0]
    r2 = sub(r, mul_f(y, q2))
    q3 = r2[0] / y[0]
    q, e = fast_two_sum(q1, q2)
    return fast_two_sum(q, e + q3)


def sqrt(x: DF) -> DF:
    s1 = jnp.sqrt(x[0])
    s1 = jnp.where(x[0] <= 0, 0.0, s1)
    # one Newton step in df: s = s1 + (x - s1^2) / (2 s1)
    e = sub(x, mul_f((s1, jnp.zeros_like(s1)), s1))
    corr = e[0] / jnp.where(s1 > 0, 2.0 * s1, 1.0)
    return fast_two_sum(s1, corr)


def select(pred, x: DF, y: DF) -> DF:
    return jnp.where(pred, x[0], y[0]), jnp.where(pred, x[1], y[1])


# Cody-Waite splitting of ln2 into four f32 terms: H1/H2 carry 13/15
# significand bits so k*H1 and k*H2 are EXACT f32 products for |k| <= 512,
# keeping the argument reduction free of the cancellation error a plain
# (hi, lo) ln2 pair would leak at large |k|
_LN2 = 0.6931471805599453094172321214581766
_LN2_H1 = np.float32(round(_LN2 * 2 ** 14) / 2 ** 14)
_LN2_H2 = np.float32(round((_LN2 - float(_LN2_H1)) * 2 ** 29) / 2 ** 29)
_LN2_H3 = np.float32(_LN2 - float(_LN2_H1) - float(_LN2_H2))
_LN2_H4 = np.float32(_LN2 - float(_LN2_H1) - float(_LN2_H2)
                     - float(_LN2_H3))
_INV_LN2 = np.float32(1.4426950408889634)

# Taylor coefficients 1/n! for the reduced-range series (|r| <= ln2/2);
# the tail after n=14 is < 0.347^15/15! ~ 9e-20
_EXP_COEF = [np.float64(1.0)]
for _n in range(1, 15):
    _EXP_COEF.append(_EXP_COEF[-1] / _n)
_EXP_COEF_DF = [(np.float32(c), np.float32(c - float(np.float32(c))))
                for c in _EXP_COEF]


def exp(x: DF) -> DF:
    """Double-word exp: argument reduction x = k ln2 + r, Taylor series in
    df arithmetic on |r| <= ln2/2, exact 2^k scaling. Relative accuracy
    <= ~35 units of 2^-49 (measured 6e-14 worst) for |x| <= 60; beyond
    ~|x|=65 the result's lo word hits the flush-to-zero boundary of the
    f32 normal range and accuracy degrades toward plain f32 ~2^-24 — a
    representation limit of f32 pairs, not of the algorithm. The df
    analog of the f64 libm exp the reference's viscosity laws call
    (Viscosity_structures.c visc_from_T)."""
    k = jnp.round(x[0] * _INV_LN2)
    # r = x - k*ln2 via Cody-Waite: the two leading products are exact, so
    # the cancellation x[0] - k*H1 is captured error-free by two_sum; the
    # tiny lo word of x joins last, once r is small
    zero = jnp.zeros_like(k)
    r = two_sum(x[0], -(k * _LN2_H1))
    r = add(r, (-(k * _LN2_H2), zero))
    r = sub(r, two_prod(k, _LN2_H3))
    r = sub(r, (k * _LN2_H4, zero))
    r = add(r, (x[1], zero))
    # Horner in df: p = c14; p = p*r + c_n
    ch, cl = _EXP_COEF_DF[-1]
    p = (jnp.full_like(r[0], ch), jnp.full_like(r[0], cl))
    for ch, cl in _EXP_COEF_DF[-2::-1]:
        p = mul(p, r)
        p = add(p, (jnp.full_like(r[0], ch), jnp.full_like(r[0], cl)))
    # exact 2^k: XLA's exp2 is an approximation (~2^-20 rel), so build the
    # scale from the f32 exponent field, split in two halves so k spans
    # [-252, 254] without hitting subnormals
    ki = k.astype(jnp.int32)
    k1 = ki // 2
    k2 = ki - k1
    to_pow = lambda e: jax.lax.bitcast_convert_type(
        ((jnp.clip(e, -126, 127) + 127) << 23).astype(jnp.int32),
        jnp.float32)
    s1, s2 = to_pow(k1), to_pow(k2)
    return (p[0] * s1) * s2, (p[1] * s1) * s2


def log(x: DF) -> DF:
    """Double-word natural log by one Newton step on exp from the f32
    libm seed: y1 = y0 + (x e^{-y0} - 1), quadratic convergence takes the
    2^-24 seed error to ~2^-48; accuracy bounded by exp's (~6e-14).
    Domain: x > 0 with x*e^{-y0} in exp's full-accuracy range (always,
    since it is ~1)."""
    y0 = jnp.log(x[0])
    e = mul(x, exp((-y0, jnp.zeros_like(y0))))
    corr = add_f(e, np.float32(-1.0))
    # second-order term -corr^2/2 costs two ops and removes the Newton
    # truncation error floor
    corr2 = mul(corr, corr)
    y = add(corr, mul_f(corr2, np.float32(-0.5)))
    return add(y, (y0, jnp.zeros_like(y0)))


def powf(x: DF, c) -> DF:
    """x**c for x > 0 and a Python/f64 scalar exponent c: exp(c * log x)
    with c split to a df pair (an f32-rounded c would leak
    |log x| * 2^-24 into the result). Relative error ~|c log x| * 2^-49
    + the exp/log floors."""
    c64 = np.float64(c)
    chi = np.float32(c64)
    clo = np.float32(c64 - np.float64(chi))
    lx = log(x)
    t = mul_f(lx, chi)
    t = add(t, mul_f(lx, clo))
    return exp(t)


def pow_df(x: DF, c: DF) -> DF:
    """x**c for x > 0 with a df exponent."""
    return exp(mul(log(x), c))


# Cody-Waite splitting of pi/2 (same scheme as ln2 above): H1/H2 carry
# few enough significand bits that k*H1, k*H2 are exact for |k| <= 512,
# so the reduction x - k*pi/2 cancels error-free
_PIO2 = 1.5707963267948966192313216916397514
_PIO2_H1 = np.float32(round(_PIO2 * 2 ** 13) / 2 ** 13)
_PIO2_H2 = np.float32(round((_PIO2 - float(_PIO2_H1)) * 2 ** 28) / 2 ** 28)
_PIO2_H3 = np.float32(_PIO2 - float(_PIO2_H1) - float(_PIO2_H2))
_PIO2_H4 = np.float32(_PIO2 - float(_PIO2_H1) - float(_PIO2_H2)
                      - float(_PIO2_H3))
_INV_PIO2 = np.float32(2.0 / np.pi)

# reduced-range Taylor coefficients in r^2 (|r| <= pi/4):
# sin r = r * S(r^2), cos r = C(r^2); tails < 1e-16 relative
import math as _math
_SIN_COEF = [(-1.0) ** _k / _math.factorial(2 * _k + 1) for _k in range(9)]
_COS_COEF = [(-1.0) ** _k / _math.factorial(2 * _k) for _k in range(10)]
_SIN_COEF_DF = [(np.float32(c), np.float32(c - float(np.float32(c))))
                for c in _SIN_COEF]
_COS_COEF_DF = [(np.float32(c), np.float32(c - float(np.float32(c))))
                for c in _COS_COEF]


def _horner_sq(r2: DF, coef):
    ch, cl = coef[-1]
    p = (jnp.full_like(r2[0], ch), jnp.full_like(r2[0], cl))
    for ch, cl in coef[-2::-1]:
        p = mul(p, r2)
        p = add(p, (jnp.full_like(r2[0], ch), jnp.full_like(r2[0], cl)))
    return p


def _sincos_reduced(x: DF):
    """(sin, cos, quadrant) after Cody-Waite pi/2 reduction; accurate to
    ~2^-49 relative for |x| <= ~400 (|k| <= 512 exactness bound)."""
    k = jnp.round(x[0] * _INV_PIO2)
    zero = jnp.zeros_like(k)
    r = two_sum(x[0], -(k * _PIO2_H1))
    r = add(r, (-(k * _PIO2_H2), zero))
    r = sub(r, two_prod(k, _PIO2_H3))
    r = sub(r, (k * _PIO2_H4, zero))
    r = add(r, (x[1], zero))
    r2 = mul(r, r)
    s = mul(r, _horner_sq(r2, _SIN_COEF_DF))
    c = _horner_sq(r2, _COS_COEF_DF)
    q = jnp.mod(k.astype(jnp.int32), 4)
    return s, c, q


def sin(x: DF) -> DF:
    """Double-word sine (the f64 libm sin the reference's spherical
    geometry calls, e.g. tracer coordinate rates in
    Regional_tracer_advection.c). |x| <= ~400."""
    s, c, q = _sincos_reduced(x)
    out = select(q == 0, s, select(q == 1, c, select(q == 2, neg(s),
                                                    neg(c))))
    return out


def cos(x: DF) -> DF:
    """Double-word cosine; same reduction/accuracy as sin."""
    s, c, q = _sincos_reduced(x)
    return select(q == 0, c, select(q == 1, neg(s), select(q == 2, neg(c),
                                                           s)))


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

def sum_df(x: DF, axis=None) -> DF:
    """Sum of a DF array in df64 via pairwise halving (log2(n) df adds)."""
    if axis is not None:
        raise NotImplementedError("axis-wise df sum not needed yet")
    h = x[0].reshape(-1)
    l = x[1].reshape(-1)
    n = h.shape[0]
    m = 1
    while m < n:
        m *= 2
    h = jnp.concatenate([h, jnp.zeros((m - n,), h.dtype)])
    l = jnp.concatenate([l, jnp.zeros((m - n,), l.dtype)])
    while m > 1:
        m //= 2
        h, l = add((h[:m], l[:m]), (h[m:], l[m:]))
    return h[0], l[0]


def dot(x: DF, y: DF) -> DF:
    """df64 dot product of two DF arrays (flattened)."""
    return sum_df(mul((x[0].reshape(-1), x[1].reshape(-1)),
                      (y[0].reshape(-1), y[1].reshape(-1))))


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------

def from_f64(a) -> DF:
    """Split a float64 host array into an exact (hi, lo) f32 pair
    (exact when |a| is within f32 range and lo within subnormal range)."""
    a = np.asarray(a, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def to_f64(x: DF) -> np.ndarray:
    return (np.asarray(x[0], np.float64)
            + np.asarray(x[1], np.float64))
