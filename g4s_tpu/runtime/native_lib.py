"""ctypes loader for the native host kernels (libg4s_host.so).

Compiles the C++ library on first use (g++ is part of the toolchain) and
caches the .so next to the source. Every entry point has a numpy fallback,
so the framework works without a compiler — native just makes the host
phases (data loading, SpGEMM symbolic, BWELL packing) fast.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "host_kernels.cc")
_SO = os.path.join(_HERE, "native", "libg4s_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                       os.path.getmtime(_SRC)
                                       > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.g4s_parse_numbers.restype = ctypes.c_long
        lib.g4s_parse_numbers.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long]
        lib.g4s_spgemm_flops.restype = ctypes.c_long
        lib.g4s_spgemm_symbolic.restype = ctypes.c_long
        lib.g4s_euler_split.restype = ctypes.c_long
        I64 = ctypes.POINTER(ctypes.c_int64)
        lib.g4s_euler_split.argtypes = [
            I64, I64, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.g4s_benes_route.restype = ctypes.c_long
        lib.g4s_benes_route.argtypes = [
            I64, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32)]
        lib.g4s_edge_color.restype = ctypes.c_long
        lib.g4s_edge_color.argtypes = [
            I64, I64, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, I64]
        I32 = ctypes.POINTER(ctypes.c_int32)
        lib.g4s_esc_plan_core.restype = ctypes.c_long
        lib.g4s_esc_plan_core.argtypes = (
            [I64] * 8 + [ctypes.c_long] + [I64, I64, I64, ctypes.c_long]
            + [I64, I64, ctypes.c_long]
            + [ctypes.c_long] * 8
            + [I32] * 10 + [I64, I64])
        _lib = lib
        return _lib


def parse_numbers(body: str, ncomp: int, max_entries: int) -> np.ndarray:
    """Parse whitespace-separated numbers to (n, ncomp); native if possible."""
    lib = get_lib()
    if lib is None:
        flat = np.array(body.split(), dtype=np.float64)
        n = min(flat.size // ncomp, max_entries)
        return flat[: n * ncomp].reshape(n, ncomp)
    raw = body.encode()
    out = np.empty((max_entries, ncomp), dtype=np.float64)
    n = lib.g4s_parse_numbers(
        raw, len(raw), ncomp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_entries)
    return out[:n]


def euler_split_native(a: np.ndarray, b: np.ndarray):
    """2-color an even-degree bipartite multigraph's edges (see
    host_kernels.cc g4s_euler_split); None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    m = a.size
    a = np.ascontiguousarray(a, np.int64)
    b = np.ascontiguousarray(b, np.int64)
    ka = int(a.max()) + 1 if m else 1
    kb = int(b.max()) + 1 if m else 1
    color = np.empty(m, np.uint8)
    I64 = ctypes.POINTER(ctypes.c_int64)
    rc = lib.g4s_euler_split(
        a.ctypes.data_as(I64), b.ctypes.data_as(I64), ctypes.c_long(m),
        ctypes.c_long(ka), ctypes.c_long(kb),
        color.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return color.astype(bool)


def edge_color_native(a: np.ndarray, b: np.ndarray, deg: int):
    """deg-color a deg-regular bipartite multigraph's edges — the whole
    Euler-split recursion of ops/route.py edge_color_bipartite in one
    native call; None if the library is missing or on failure."""
    lib = get_lib()
    if lib is None:
        return None
    m = a.size
    a = np.ascontiguousarray(a, np.int64)
    b = np.ascontiguousarray(b, np.int64)
    na = int(a.max()) + 1 if m else 1
    nb = int(b.max()) + 1 if m else 1
    color = np.empty(m, np.int64)
    I64 = ctypes.POINTER(ctypes.c_int64)
    rc = lib.g4s_edge_color(
        a.ctypes.data_as(I64), b.ctypes.data_as(I64), ctypes.c_long(m),
        ctypes.c_long(na), ctypes.c_long(nb), ctypes.c_long(deg),
        color.ctypes.data_as(I64))
    if rc != 0:
        return None
    return color


def benes_route_native(sigma: np.ndarray):
    """Benes routing bits for batched row permutations (the full level
    recursion of ops/route.py in C); None if unavailable or on failure."""
    lib = get_lib()
    if lib is None:
        return None
    B, n = sigma.shape
    sigma = np.ascontiguousarray(sigma, np.int64)
    bits = np.empty((B, n), np.int32)
    rc = lib.g4s_benes_route(
        sigma.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_long(B), ctypes.c_long(n),
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return bits


def esc_plan_core_native(kk, Mv, Lv, Mh, Wv, a_off, b_off, p_off,
                         ac_indptr, ac_rows, csc_of_csr,
                         b_indptr, b_indices, nnz_a, nnz_b,
                         n_min, n_major, F, na, nb_len, m2,
                         order_row: bool, two_key: bool):
    """Heavy O(flop) passes of the ESC SpGEMM plan (spgemm_esc.esc_plan)
    as fused native loops + an LSD radix key sort; None if the library
    is missing or on an internal inconsistency (caller falls back to the
    equivalent numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    I64 = ctypes.POINTER(ctypes.c_int64)
    I32 = ctypes.POINTER(ctypes.c_int32)

    def as64(x):
        return np.ascontiguousarray(x, np.int64)

    kk, Mv, Lv, Mh, Wv = map(as64, (kk, Mv, Lv, Mh, Wv))
    a_off, b_off, p_off = map(as64, (a_off, b_off, p_off))
    ac_indptr, ac_rows, csc_of_csr = map(as64, (ac_indptr, ac_rows,
                                                csc_of_csr))
    b_indptr, b_indices = as64(b_indptr), as64(b_indices)
    a_rank = np.empty(nnz_a, np.int32)
    b_rank = np.empty(nnz_b, np.int32)
    d_a = np.empty(na, np.int32)
    d_b = np.empty(nb_len, np.int32)
    d_pad = np.empty(m2, np.int32)
    keys_dev = np.empty(F, np.int32)
    keys_minor = np.empty(F if two_key else 1, np.int32)
    off_c = np.empty(F, np.int32)
    d_head = np.empty(F, np.int32)
    c_indices = np.empty(F, np.int32)
    c_indptr = np.empty(n_major + 1, np.int64)
    meta = np.zeros(8, np.int64)

    def p64(x):
        return x.ctypes.data_as(I64)

    def p32(x):
        return x.ctypes.data_as(I32)

    nnz = lib.g4s_esc_plan_core(
        p64(kk), p64(Mv), p64(Lv), p64(Mh), p64(Wv), p64(a_off),
        p64(b_off), p64(p_off), ctypes.c_long(len(kk)),
        p64(ac_indptr), p64(ac_rows), p64(csc_of_csr),
        ctypes.c_long(nnz_a),
        p64(b_indptr), p64(b_indices), ctypes.c_long(nnz_b),
        ctypes.c_long(n_min), ctypes.c_long(n_major), ctypes.c_long(F),
        ctypes.c_long(na), ctypes.c_long(nb_len), ctypes.c_long(m2),
        ctypes.c_long(1 if order_row else 0),
        ctypes.c_long(1 if two_key else 0),
        p32(a_rank), p32(b_rank), p32(d_a), p32(d_b), p32(d_pad),
        p32(keys_dev), p32(keys_minor), p32(off_c), p32(d_head),
        p32(c_indices), p64(c_indptr), p64(meta))
    if nnz < 0:
        return None
    return (a_rank, b_rank, d_a, d_b, d_pad, keys_dev,
            keys_minor if two_key else None, off_c, d_head,
            c_indices[:nnz].copy(), c_indptr, int(nnz), meta)


def spgemm_symbolic_native(a_indptr, a_indices, b_indptr, b_indices,
                           m: int, n: int):
    """Native SpGEMM symbolic phase; returns
    (src_a, src_b, slot, c_rows, c_cols, nnz, F) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    a_indptr = np.ascontiguousarray(a_indptr, np.int64)
    a_indices = np.ascontiguousarray(a_indices, np.int64)
    b_indptr = np.ascontiguousarray(b_indptr, np.int64)
    b_indices = np.ascontiguousarray(b_indices, np.int64)
    I64 = ctypes.POINTER(ctypes.c_int64)
    I32 = ctypes.POINTER(ctypes.c_int32)
    F = lib.g4s_spgemm_flops(a_indptr.ctypes.data_as(I64),
                             a_indices.ctypes.data_as(I64),
                             ctypes.c_long(m),
                             b_indptr.ctypes.data_as(I64))
    lib.g4s_spgemm_symbolic.argtypes = [I64, I64, ctypes.c_long, I64, I64,
                                        ctypes.c_long, ctypes.c_long,
                                        I64, I64, I32, I64, I64]
    src_a = np.empty(F, np.int64)
    src_b = np.empty(F, np.int64)
    slot = np.empty(F, np.int32)
    c_rows = np.empty(max(F, 1), np.int64)
    c_cols = np.empty(max(F, 1), np.int64)
    nnz = lib.g4s_spgemm_symbolic(
        a_indptr.ctypes.data_as(I64), a_indices.ctypes.data_as(I64),
        ctypes.c_long(m), b_indptr.ctypes.data_as(I64),
        b_indices.ctypes.data_as(I64), ctypes.c_long(n), ctypes.c_long(F),
        src_a.ctypes.data_as(I64), src_b.ctypes.data_as(I64),
        slot.ctypes.data_as(I32), c_rows.ctypes.data_as(I64),
        c_cols.ctypes.data_as(I64))
    return src_a, src_b, slot, c_rows[:nnz], c_cols[:nnz], int(nnz), int(F)
