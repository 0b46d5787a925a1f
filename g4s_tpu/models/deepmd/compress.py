"""Model compression: spline-tabulated embedding nets.

Equivalent of `dp compress` (deepmd/deepmd/entrypoints/compress.py:46 +
deepmd/deepmd/utils/tabulate.py: each embedding net is sampled on a uniform
grid of its scalar input and fitted with 5th-order polynomials per
interval; inference then evaluates the table via the tabulate_fusion op,
source/op/tabulate_multi_device.cc).

Here the quintic coefficients come from Hermite data (value, first and
second derivative at both interval ends) computed by jax autodiff of the
exact embedding net — no finite differencing. Evaluation is a gather of
the interval's 6 coefficient rows + Horner, vectorized over all
(atom, neighbor) pairs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.deepmd.descriptor import normalize_env_mat
from g4s_tpu.models.deepmd.model import ModelSpec
from g4s_tpu.models.deepmd.network import embedding_net_apply


class EmbeddingTable(NamedTuple):
    coeffs: jax.Array    # (n_intervals, 6, M1) quintic coefficients
    lower: float
    stride: float
    n_intervals: int


def tabulate_embedding(layers, lower: float, upper: float, stride: float,
                       m1: int) -> EmbeddingTable:
    """Quintic-Hermite table of one embedding net over [lower, upper]."""
    n = int(np.ceil((upper - lower) / stride)) + 1
    xs = jnp.asarray(lower + np.arange(n + 1) * stride)

    def g_scalar(u):
        return embedding_net_apply(layers, u[None])[0]     # (M1,)

    g = jax.vmap(g_scalar)(xs[:, None])                    # (n+1, M1)
    g1 = jax.vmap(jax.jacfwd(g_scalar))(xs[:, None])[:, :, 0]
    g2 = jax.vmap(jax.jacfwd(jax.jacfwd(g_scalar)))(xs[:, None])[:, :, 0, 0]

    h = stride
    y0, y1 = g[:-1], g[1:]
    d0, d1 = g1[:-1] * h, g1[1:] * h
    s0, s1 = g2[:-1] * h * h, g2[1:] * h * h
    # quintic Hermite basis coefficients on t in [0, 1]
    c0 = y0
    c1 = d0
    c2 = 0.5 * s0
    c3 = 10 * (y1 - y0) - 6 * d0 - 4 * d1 - 1.5 * s0 + 0.5 * s1
    c4 = -15 * (y1 - y0) + 8 * d0 + 7 * d1 + 1.5 * s0 - s1
    c5 = 6 * (y1 - y0) - 3 * (d0 + d1) - 0.5 * (s0 - s1)
    coeffs = jnp.stack([c0, c1, c2, c3, c4, c5], axis=1)   # (n, 6, M1)
    return EmbeddingTable(coeffs, float(lower), float(stride), n)


def eval_table(table: EmbeddingTable, u):
    """u: (...,) -> (..., M1) via interval lookup + Horner.

    Out-of-range inputs are clamped to the table edge (constant
    extrapolation): a quintic Hermite polynomial evaluated at |t| >> 1
    diverges catastrophically, which is how an untightened range turned
    the water-model compression into garbage (round-3 dp-chain finding).
    Build tables with data-driven ranges (sample_inputs) to avoid
    clamping in the first place."""
    t_all = (u - table.lower) / table.stride
    t_all = jnp.clip(t_all, 0.0, table.n_intervals - 1e-6)
    idx = jnp.clip(t_all.astype(jnp.int32), 0, table.n_intervals - 1)
    t = t_all - idx
    c = jnp.take(table.coeffs, idx, axis=0)                # (..., 6, M1)
    tt = t[..., None]
    return ((((c[..., 5, :] * tt + c[..., 4, :]) * tt + c[..., 3, :]) * tt
             + c[..., 2, :]) * tt + c[..., 1, :]) * tt + c[..., 0, :]


class CompressedModel(NamedTuple):
    tables: tuple        # tables[tc][tn]
    params: dict         # original params (stats + fit nets still used)
    spec: ModelSpec


def compress_model(params, spec: ModelSpec, *, stride: float = 0.01,
                   extrapolate: float = 5.0, sample_inputs=None):
    """Build tables for every (center, neighbor) embedding net.

    Input range: the normalized s(r) channel is standardized, so
    [-extrapolate, extrapolate] covers it; `sample_inputs` (raw env mats)
    can tighten the range like the reference's check_freq sampling.
    """
    lo, hi = -extrapolate, extrapolate
    if sample_inputs is not None:
        # generous margin: frames OUTSIDE the sampled set stray past the
        # sampled range, and the clamped edge would flatten their forces
        s = np.asarray(sample_inputs)
        span = float(s.max()) - float(s.min())
        lo = float(s.min()) - 0.25 * span - 1.0
        hi = float(s.max()) + 0.25 * span + 1.0
    nt = spec.descriptor.ntypes
    tables = tuple(tuple(
        tabulate_embedding(params["embed"][tc][tn], lo, hi, stride, spec.m1)
        for tn in range(nt)) for tc in range(nt))
    return CompressedModel(tables, params, spec)


def atomic_descriptor_compressed(cm: CompressedModel, R, types):
    """atomic_descriptor with table-evaluated embeddings."""
    spec = cm.spec
    params = cm.params
    nt = spec.descriptor.ntypes
    sel = spec.descriptor.sel
    nnei = spec.descriptor.nnei
    Rn = normalize_env_mat(R, types, params["stats"]["davg"],
                           params["stats"]["dstd"])
    sec = np.concatenate([[0], np.cumsum(sel)])
    D_by_tc = []
    for tc in range(nt):
        T = jnp.zeros((R.shape[0], 4, spec.m1), Rn.dtype)
        for tn in range(nt):
            sec_R = Rn[:, sec[tn]: sec[tn + 1], :]
            G = eval_table(cm.tables[tc][tn], sec_R[:, :, 0])
            T = T + jnp.einsum("nsc,nsm->ncm", sec_R, G)
        T = T / nnei
        D = jnp.einsum("ncm,nck->nmk", T,
                       T[:, :, : spec.axis_neuron]).reshape(R.shape[0], -1)
        D_by_tc.append(D)
    D_all = jnp.stack(D_by_tc, axis=0)
    return jnp.take_along_axis(
        D_all, types[None, :, None].astype(jnp.int32), axis=0)[0]


def total_energy_compressed(cm: CompressedModel, coords, box, types):
    from g4s_tpu.models.deepmd.descriptor import env_mat
    from g4s_tpu.models.deepmd.model import atomic_energy
    R, _ = env_mat(coords, box, types, cm.spec.descriptor)
    D = atomic_descriptor_compressed(cm, R, types)
    return jnp.sum(atomic_energy(cm.params, cm.spec, D, types))


def energy_force_compressed(cm: CompressedModel, coords, box, types):
    e, g = jax.value_and_grad(
        lambda c: total_energy_compressed(cm, c, box, types))(coords)
    return e, -g


def load_compressed(path) -> CompressedModel:
    """Load a `dp compress` artifact (drivers/dp.py cmd_compress pickle)."""
    import pickle
    with open(path, "rb") as f:
        d = pickle.load(f)
    return CompressedModel(d["tables"], d["params"], d["spec"])
