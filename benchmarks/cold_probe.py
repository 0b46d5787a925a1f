"""Stage breakdown of the cold one-shot SpGEMM path (spgemm_device_full).

Uses obs.devtime (value-forcing fetches) — block_until_ready is not
honored by the axon tunnel. Also reports tunnel health (round trip +
host->device bandwidth) so cold numbers can be normalized across runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from g4s_tpu.obs.devtime import fetch_sync, roundtrip_s, time_fn
from g4s_tpu.ops.spgemm import (_bits_back, _bits_cols,
                                _sort_merge_compact, spgemm_flops)
from g4s_tpu.sparse import CSR


def main(n=1 << 15, avg_deg=16):
    print(f"tunnel round trip: {roundtrip_s()*1e3:.1f} ms")
    big = np.zeros(1 << 22, np.float32)          # 16 MB
    t0 = time.perf_counter()
    fetch_sync(jnp.asarray(big))
    print(f"h2d 16MB: {(time.perf_counter()-t0)*1e3:.1f} ms")

    rng = np.random.RandomState(42)
    A_s = sp.random(n, n, density=avg_deg / n, random_state=rng,
                    format="csr", dtype=np.float32)
    A = CSR.from_scipy(A_s)
    F = spgemm_flops(A, A) // 2
    print(f"n={n} nnz={A.nnz} F={F}")

    kt = np.int32
    a_ptr = jnp.asarray(np.asarray(A.indptr).astype(kt))
    a_idx = jnp.asarray(np.asarray(A.indices).astype(kt))
    a_dat = jnp.asarray(A.data)
    fetch_sync((a_ptr, a_idx, a_dat))

    it = jnp.int32
    m = n

    @jax.jit
    def expand_map(a_indptr, a_indices):
        deg_b = a_indptr[1:] - a_indptr[:-1]
        counts = jnp.take(deg_b, a_indices)
        ends = jnp.cumsum(counts)
        starts = ends - counts
        heads = jnp.zeros((F,), it).at[starts].add(1, mode="drop")
        src_a = jnp.cumsum(heads) - 1
        return src_a

    t = time_fn(expand_map, a_ptr, a_idx, reps=3)
    print(f"expand map (scatter+cumsum): {t*1e3:.1f} ms")
    src_a = expand_map(a_ptr, a_idx)

    @jax.jit
    def gathers(a_indptr, a_indices, a_data, src_a):
        nnz_a = a_indices.shape[0]
        deg_b = a_indptr[1:] - a_indptr[:-1]
        counts = jnp.take(deg_b, a_indices)
        ends = jnp.cumsum(counts)
        starts = ends - counts
        pos = jnp.arange(F, dtype=it)
        deg_a = a_indptr[1:] - a_indptr[:-1]
        a_rows = jnp.repeat(jnp.arange(m, dtype=it), deg_a,
                            total_repeat_length=nnz_a)
        base_b = jnp.take(a_indptr, a_indices) - starts
        key_a = a_rows * n
        rec_a = jnp.concatenate(
            [base_b[:, None], key_a[:, None], _bits_cols(a_data, it)],
            axis=1)
        ga = jnp.take(rec_a, src_a, axis=0)
        src_b = pos + ga[:, 0]
        rec_b = jnp.concatenate(
            [a_indices[:, None], _bits_cols(a_data, it)], axis=1)
        gb = jnp.take(rec_b, src_b, axis=0)
        key = ga[:, 1] + gb[:, 0]
        val = (_bits_back(ga[:, 2], a_data.dtype, it)
               * _bits_back(gb[:, 1], a_data.dtype, it))
        return key, val

    t = time_fn(gathers, a_ptr, a_idx, a_dat, src_a, reps=3)
    print(f"two row gathers + products: {t*1e3:.1f} ms")
    key, val = gathers(a_ptr, a_idx, a_dat, src_a)

    @jax.jit
    def sort1(key, val):
        return jax.lax.sort((key, val), num_keys=1)

    t = time_fn(sort1, key, val, reps=3)
    print(f"sort (F={F}): {t*1e3:.1f} ms")
    key_s, val_s = sort1(key, val)

    @jax.jit
    def hillis(key_s, val_s):
        v = val_s
        for p in range(max(int(F - 1).bit_length(), 1)):
            d = 1 << p
            if d >= F:
                break
            ks = jnp.concatenate([jnp.full((d,), -1, key_s.dtype),
                                  key_s[:-d]])
            vs = jnp.concatenate([jnp.zeros((d,), v.dtype), v[:-d]])
            v = v + jnp.where(key_s == ks, vs, jnp.zeros((), v.dtype))
        tail = jnp.concatenate([key_s[1:] != key_s[:-1],
                                jnp.ones((1,), bool)])
        nnz = jnp.sum(tail.astype(jnp.int32))
        pad = jnp.iinfo(key_s.dtype).max
        out_key = jnp.where(tail, key_s, pad)
        out_val = jnp.where(tail, v, jnp.zeros((), v.dtype))
        return out_key, out_val, nnz

    t = time_fn(hillis, key_s, val_s, reps=3)
    print(f"Hillis-Steele + tail mask: {t*1e3:.1f} ms")

    @jax.jit
    def full(key, val):
        return _sort_merge_compact(key, val, F)

    t = time_fn(full, key, val, reps=3)
    print(f"_sort_merge_compact (2 sorts + scan): {t*1e3:.1f} ms")

    # end-to-end cold (bench protocol: ship + compute + checksum fetch)
    from g4s_tpu.ops.spgemm import spgemm_device_full
    keys, vals, nnz_d = spgemm_device_full(A, A)
    fetch_sync(vals)
    for _ in range(3):
        t0 = time.perf_counter()
        keys, vals, nnz_d = spgemm_device_full(A, A)
        csum = float(vals.sum())
        print(f"end-to-end cold: {(time.perf_counter()-t0)*1e3:.1f} ms "
              f"(checksum {csum:.1f}, nnz {int(nnz_d)})")


if __name__ == "__main__":
    main()
