"""Error-tolerant sparse comparisons.

Reproduces the reference's correctness-check semantics: CSR::operator== with
an epsilon-tolerant value compare (mm/inc/CSR.h:343-408) built on
ErrorTolerantEqual (mm/inc/utility.h:19-36): values are equal when exactly
equal, OR |a-b| < eps, OR |a-b| / max(|a|,|b|) < eps.
"""

from __future__ import annotations

import numpy as np

from g4s_tpu.sparse.containers import CSR
from g4s_tpu.sparse.convert import merge_duplicates

EPSILON = 1e-8


def error_tolerant_equal(a, b, eps: float = EPSILON):
    """Vectorized ErrorTolerantEqual (utility.h:24-36)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    diff = np.abs(a - b)
    denom = np.maximum(np.abs(a), np.abs(b))
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.where(denom > 0, diff / denom, 0.0)
    return (a == b) | (diff < eps) | (rel < eps)


def csr_allclose(a: CSR, b: CSR, eps: float = EPSILON,
                 *, canonicalize: bool = True) -> bool:
    """Structural + epsilon-value equality of two CSR matrices.

    With canonicalize=True duplicates are merged and rows sorted first, so
    matrices produced by different algorithms (sorted vs unsorted SpGEMM
    output, cf. hash_mult.h:525-553) compare by mathematical content.
    """
    if a.shape != b.shape:
        return False
    if canonicalize:
        a, b = merge_duplicates(a), merge_duplicates(b)
    if not np.array_equal(np.asarray(a.indptr), np.asarray(b.indptr)):
        return False
    if not np.array_equal(np.asarray(a.indices), np.asarray(b.indices)):
        return False
    return bool(np.all(error_tolerant_equal(a.data, b.data, eps)))
