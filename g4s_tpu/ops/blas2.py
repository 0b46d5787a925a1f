"""Dense BLAS2 kernels (MXU path).

Capability match for the reference's mv/ bench (mv/mv.c:6-27), which wraps
MKL cblas_dgemv / cblas_dsymv / cblas_dtrmv / cblas_dspmv. On TPU these are
all one MXU matmul; the "variants" differ only in how the operand matrix is
materialized (full, symmetric from one triangle, triangular-masked, packed).
Materialization fuses into the matmul under jit, so each variant stays a
single HBM sweep of the matrix — which is the roofline for BLAS2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gemv(a, x, *, preferred_element_type=None):
    """y = A @ x (cblas_dgemv equivalent, mv/mv.c:24-27)."""
    pet = preferred_element_type or jnp.result_type(a.dtype, x.dtype)
    return jnp.dot(a, x, preferred_element_type=pet)


def symv(a, x, *, uplo: str = "U"):
    """y = sym(A) @ x using only the `uplo` triangle of A
    (cblas_dsymv equivalent, mv/mv.c:6-9)."""
    if uplo == "U":
        tri = jnp.triu(a)
        full = tri + jnp.triu(a, 1).T
    else:
        tri = jnp.tril(a)
        full = tri + jnp.tril(a, -1).T
    return gemv(full, x)


def trmv(a, x, *, uplo: str = "U", unit_diag: bool = False):
    """y = tri(A) @ x (cblas_dtrmv equivalent, mv/mv.c:12-15)."""
    tri = jnp.triu(a) if uplo == "U" else jnp.tril(a)
    if unit_diag:
        n = a.shape[0]
        tri = tri - jnp.diag(jnp.diag(tri)) + jnp.eye(n, dtype=a.dtype)
    return gemv(tri, x)


def pack_symmetric(a: np.ndarray, *, uplo: str = "U") -> np.ndarray:
    """Host-side: pack the triangle of a symmetric matrix column-major, the
    LAPACK 'packed' storage that cblas_dspmv consumes (mv/mv.c:18-21)."""
    a = np.asarray(a)
    n = a.shape[0]
    out = []
    for j in range(n):
        out.append(a[: j + 1, j] if uplo == "U" else a[j:, j])
    return np.concatenate(out)


def unpack_symmetric(ap, n: int, *, uplo: str = "U"):
    """Unpack LAPACK packed storage to a full symmetric matrix (device ok)."""
    # static index plan (host) + one gather (device)
    idx = np.zeros((n, n), dtype=np.int32)
    pos = 0
    for j in range(n):
        if uplo == "U":
            for i in range(j + 1):
                idx[i, j] = pos
                idx[j, i] = pos
                pos += 1
        else:
            for i in range(j, n):
                idx[i, j] = pos
                idx[j, i] = pos
                pos += 1
    return jnp.asarray(ap)[idx]


def spmv_packed(ap, x, *, uplo: str = "U"):
    """y = sym(A) @ x from packed storage (cblas_dspmv equivalent)."""
    n = x.shape[0]
    return gemv(unpack_symmetric(ap, n, uplo=uplo), x)
