"""NVNMD: the quantized hardware-deployment pipeline, TPU-native.

The reference ships NVNMD (NVNMD paper, DOI 10.1038/s41524-022-00773-z) as
a TF graph-surgery layer that retargets a trained se_a model onto a
fixed-point accelerator:

* quantization-aware training with straight-through estimators and a
  polynomial `tanh4` activation (`deepmd/nvnmd/utils/network.py:62-88`);
* ``mapt``: piecewise-polynomial mapping tables u=r^2 -> s, h and
  s -> G so inference needs only table lookups and fixed-point matmuls
  (`deepmd/nvnmd/entrypoints/mapt.py:35-152`);
* the quantized descriptor contraction with the wrapped-band D' subset
  (`deepmd/nvnmd/descriptor/se_a.py:180-336`);
* ``wrap``: packing quantized weights + tables into the device image
  (`deepmd/nvnmd/entrypoints/wrap.py`).

This rebuild keeps the pipeline's *semantics* — two-stage CNN/QNN
training, table-driven inference, fixed-point artifact with bit-exact
reload — but executes everything as jitted JAX on TPU: the straight-
through quantizers are `stop_gradient` identities, table lookup is a
vectorized gather + Horner cubic, and forces come from `jax.grad`
through the tables (the reference builds separate `*_grad` tables for
its hand-written backward ops; autodiff through the same cubic gives
the identical derivative).

Hardware constraint honored from `deepmd/nvnmd/data/data.py` ("ntypex":
1): the embedding net depends only on the *neighbor* type, so the G
tables are per neighbor type.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.engine.matmul import dense_matmul
from g4s_tpu.models.deepmd.descriptor import (DescriptorSpec,
                                              min_image_displacements,
                                              switch_fn)
from g4s_tpu.models.deepmd.network import init_embedding_net, init_fitting_net


# ---------------------------------------------------------------------------
# Quantization primitives (utils/network.py:62-88)
# ---------------------------------------------------------------------------

def qf(x, nbit: int):
    """Floor-quantize to 2^-nbit grid; straight-through gradient."""
    prec = 2.0 ** nbit
    y = jnp.floor(x * prec) / prec
    return x + jax.lax.stop_gradient(y - x)


def qr(x, nbit: int):
    """Round-quantize to 2^-nbit grid; straight-through gradient."""
    prec = 2.0 ** nbit
    y = jnp.round(x * prec) / prec
    return x + jax.lax.stop_gradient(y - x)


def tanh4(x):
    """Quartic tanh surrogate: sign(x)*(|x|^4/16 - |x|^3/4 + |x|), |x|<=2.

    Exactly representable in fixed point (coefficients are powers of two);
    saturates smoothly at +-1 with zero slope at |x|=2
    (utils/network.py:80-88).
    """
    c = jnp.clip(x, -2.0, 2.0)
    # odd form c^3|c|/16 - c^3/4 + c keeps grad(0) = 1 exactly
    return c ** 3 * jnp.abs(c) / 16.0 - c ** 3 / 4.0 + c


# ---------------------------------------------------------------------------
# Spec + parameters
# ---------------------------------------------------------------------------

class NvnmdSpec(NamedTuple):
    """NVNMD model: se_a with ntypex=1 embedding and fixed-point budgets.

    Bit budgets follow `deepmd/nvnmd/data/data.py` jdata_config["nbit"]:
    NBIT_FIXD_FL=23 (descriptor data), NBIT_FIT_DATA_FL=23 and
    NBIT_FIT_WEIGHT=18 (fitting net).
    """
    descriptor: DescriptorSpec
    embed_neurons: Tuple[int, ...] = (8, 16, 32)
    axis_neuron: int = 4                       # M2
    fit_neurons: Tuple[int, ...] = (32, 32)
    nbit_data_fl: int = 23                     # NBIT_FIXD_FL
    nbit_fit_data_fl: int = 23                 # NBIT_FIT_DATA_FL
    nbit_fit_weight: int = 18                  # NBIT_FIT_WEIGHT
    n_u2s: int = 512                           # u->s,h table rows
    n_s2g_fine: int = 256                      # s->G fine rows
    n_s2g_coarse: int = 256                    # s->G coarse rows (16x step)

    @property
    def m1(self) -> int:
        return self.embed_neurons[-1]


def init_nvnmd_params(key, spec: NvnmdSpec, *, bias_atom_e=None,
                      dtype=jnp.float64):
    """Embedding nets per NEIGHBOR type (ntypex=1) + per-type fitting."""
    nt = spec.descriptor.ntypes
    if bias_atom_e is None:
        bias_atom_e = np.zeros(nt)
    embed = []
    for tn in range(nt):
        key, sub = jax.random.split(key)
        embed.append(init_embedding_net(sub, spec.embed_neurons,
                                        dtype=dtype))
    fit = []
    in_dim = spec.m1 * spec.axis_neuron
    for tc in range(nt):
        key, sub = jax.random.split(key)
        fit.append(init_fitting_net(sub, in_dim, spec.fit_neurons,
                                    bias_out=float(bias_atom_e[tc]),
                                    dtype=dtype))
    # per-type SCALAR stats — the hardware contract (mapt.py run_u2s
    # uses avg[t,0], std[t,0] for s and std[t,1] for h; no per-slot
    # normalization exists on device)
    stats = {"avg": jnp.zeros((nt,), dtype),
             "std_s": jnp.ones((nt,), dtype),
             "std_h": jnp.ones((nt,), dtype)}
    return {"embed": embed, "fit": fit, "stats": stats}


# ---------------------------------------------------------------------------
# Forward passes (CNN stage: continuous tanh4; QNN stage: quantized)
# ---------------------------------------------------------------------------

def _embed_apply(layers, x, *, quantize: bool, spec: NvnmdSpec):
    """Embedding net with tanh4; QNN stage round-quantizes weights and
    floor-quantizes activations (utils/network.py matmul2_qq + qf)."""
    for layer in layers:
        w, b = layer["w"], layer["b"]
        if quantize:
            w = qr(w, spec.nbit_fit_weight)
            b = qr(b, spec.nbit_fit_weight)
        h = tanh4(dense_matmul(x, w) + b)
        if quantize:
            h = qf(h, spec.nbit_data_fl)
        n_in, n_out = layer["w"].shape
        if n_out == n_in:
            x = x + h
        elif n_out == 2 * n_in:
            x = jnp.concatenate([x, x], axis=-1) + h
        else:
            x = h
    return x


def _fit_apply(params, x, *, quantize: bool, spec: NvnmdSpec):
    for layer in params["hidden"]:
        w, b = layer["w"], layer["b"]
        if quantize:
            w = qr(w, spec.nbit_fit_weight)
            b = qr(b, spec.nbit_fit_weight)
        h = tanh4(dense_matmul(x, w) + b)
        if quantize:
            h = qf(h, spec.nbit_fit_data_fl)
        n_in, n_out = layer["w"].shape
        x = x + h if n_out == n_in else h
    w, b = params["final"]["w"], params["final"]["b"]
    if quantize:
        w = qr(w, spec.nbit_fit_weight)
    out = dense_matmul(x, w) + b
    return out[..., 0]


def _band_subset_idx(m1: int, m2: int) -> np.ndarray:
    """The wrapped-band D' subset: (i, (i+j) mod M1) for j in [0, M2)
    (descriptor/se_a.py:300-306) — NVNMD keeps a band of the full M1xM1
    Gram matrix instead of the leading M2 columns."""
    idx = []
    for i in range(m1):
        for j in range(i, i + m2):
            idx.append(i * m1 + (j % m1))
    return np.asarray(idx, np.int32)


def _neighbor_u(coords, box, types, dspec: DescriptorSpec):
    """Per-neighbor u = r^2, unit vectors, validity and neighbor type.

    Same type-sectioned top-k layout as descriptor.env_mat, but keeps
    r^2 (the table input the hardware indexes on — mapt.py run_u2s
    samples u = r^2 so no sqrt is needed on device).
    """
    n = coords.shape[0]
    disp = min_image_displacements(coords, box)
    r2 = jnp.sum(disp * disp, axis=-1)
    big = jnp.asarray(1e10, r2.dtype)
    r2 = r2 + big * jnp.eye(n, dtype=r2.dtype)
    u_secs, e_secs, v_secs = [], [], []
    for t in range(dspec.ntypes):
        k = dspec.sel[t]
        r2_t = jnp.where(types[None, :] == t, r2, big)
        if r2_t.shape[1] < k:
            r2_t = jnp.pad(r2_t, ((0, 0), (0, k - r2_t.shape[1])),
                           constant_values=1e10)
        neg, idx = jax.lax.top_k(-r2_t, k)
        d2 = -neg
        valid = d2 < dspec.rcut ** 2
        idx_g = jnp.where(valid, idx, 0)
        vec = jnp.take_along_axis(disp, idx_g[:, :, None], axis=1)
        d = jnp.sqrt(jnp.where(valid, d2, 1.0))
        unit = vec / d[:, :, None]
        u_secs.append(jnp.where(valid, d2, 0.0))
        e_secs.append(unit * valid[:, :, None])
        v_secs.append(valid)
    return (jnp.concatenate(u_secs, axis=1),
            jnp.concatenate(e_secs, axis=1),
            jnp.concatenate(v_secs, axis=1))


def _s_h_of_u(u, dspec: DescriptorSpec):
    """s(u) = switch(r)/r and h(u) = s/r as functions of u = r^2."""
    r = jnp.sqrt(jnp.maximum(u, 1e-30))
    s = switch_fn(r, dspec.rcut_smth, dspec.rcut) / r
    return s, s / r


def nvnmd_total_energy(params, spec: NvnmdSpec, coords, box, types, *,
                       stage: str = "cnn"):
    """Direct (net-evaluating) forward. stage='cnn' is the continuous
    tanh4 model; stage='qnn' applies the fixed-point quantizers
    (quantization-aware, straight-through gradients)."""
    quantize = stage == "qnn"
    dspec = spec.descriptor
    nt = dspec.ntypes
    u, unit, valid = _neighbor_u(coords, box, types, dspec)
    s, h = _s_h_of_u(u, dspec)
    s = jnp.where(valid, s, 0.0)
    h = jnp.where(valid, h, 0.0)
    # per-center-type scalar normalization (the hardware contract)
    avg = jnp.take(params["stats"]["avg"], types)[:, None]
    std_s = jnp.take(params["stats"]["std_s"], types)[:, None]
    std_h = jnp.take(params["stats"]["std_h"], types)[:, None]
    s_n = (s - avg) / std_s          # pads -> -avg/std_s, like the table
    h_n = h / std_h
    if quantize:
        s_n = qf(s_n, spec.nbit_data_fl)
        h_n = qf(h_n, spec.nbit_data_fl)
    s_in = s_n
    # R-tilde rows [s_n, h_n*ex, h_n*ey, h_n*ez]
    Rt = jnp.concatenate([s_n[:, :, None], h_n[:, :, None] * unit],
                         axis=-1)
    # G per neighbor-type section (ntypex=1: net indexed by tn only)
    sec = np.concatenate([[0], np.cumsum(dspec.sel)])
    G_secs = []
    for tn in range(nt):
        g = _embed_apply(params["embed"][tn],
                         s_in[:, sec[tn]:sec[tn + 1], None],
                         quantize=quantize, spec=spec)
        G_secs.append(g)
    # pad slots participate (their row is [-avg/std, 0, 0, 0] and
    # G(-avg/std) — identical to standard se_a post-normalization)
    G = jnp.concatenate(G_secs, axis=1)                # (N, nnei, M1)
    GR = jnp.einsum("nsc,nsm->ncm", Rt, G) / dspec.nnei
    if quantize:
        GR = qf(GR, spec.nbit_data_fl)
    gram = jnp.einsum("ncm,ncl->nml", GR, GR)          # (N, M1, M1)
    D = gram.reshape(gram.shape[0], -1)[
        :, _band_subset_idx(spec.m1, spec.axis_neuron)]
    if quantize:
        D = qf(D, spec.nbit_data_fl)
    e_by_tc = jnp.stack([_fit_apply(params["fit"][tc], D, quantize=quantize,
                                    spec=spec) for tc in range(nt)], axis=0)
    ae = jnp.take_along_axis(e_by_tc, types[None, :].astype(jnp.int32),
                             axis=0)[0]
    return jnp.sum(ae)


def nvnmd_energy_force(params, spec: NvnmdSpec, coords, box, types, *,
                       stage: str = "cnn"):
    e, neg_f = jax.value_and_grad(
        lambda x: nvnmd_total_energy(params, spec, x, box, types,
                                     stage=stage))(coords)
    return e, -neg_f


# ---------------------------------------------------------------------------
# Mapping tables (entrypoints/mapt.py): u -> s,h and s -> G as
# piecewise cubics; two-segment s->G grid (fine + 16x coarse).
# ---------------------------------------------------------------------------

class MapTables(NamedTuple):
    cfg_u2s: np.ndarray     # (1, 5): x0, x1, dx, row0, row1
    cfg_s2g: np.ndarray     # (2, 5)
    coef_s: jnp.ndarray     # (nt, n_u2s, 4)        Hermite cubic coeffs
    coef_h: jnp.ndarray     # (nt, n_u2s, 4)
    coef_g: jnp.ndarray     # (nt, n_rows, 4*M1)
    s_range: Tuple[float, float]


def _hermite_coef(y0, y1, d0, d1, dx):
    """Cubic Hermite coefficients on [0, dx]: y = c0+c1 t+c2 t^2+c3 t^3.

    Built from endpoint values and first derivatives — the same rank-4
    table the reference assembles from (val, grad, grad_grad) triples
    (mapt.py build_map_coef)."""
    c0 = y0
    c1 = d0
    c2 = (3 * (y1 - y0) / dx - 2 * d0 - d1) / dx
    c3 = (2 * (y0 - y1) / dx + d0 + d1) / dx ** 2
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def build_map(params, spec: NvnmdSpec) -> MapTables:
    """Sample the trained nets onto the two mapping grids."""
    dspec = spec.descriptor
    nt = dspec.ntypes
    avg = np.asarray(params["stats"]["avg"])               # (nt,)
    std_s = np.asarray(params["stats"]["std_s"])
    std_h = np.asarray(params["stats"]["std_h"])

    # --- u -> s, h on a uniform grid over [0, rcut^2] ------------------
    n_u = spec.n_u2s
    u_max = dspec.rcut ** 2
    du = u_max / n_u
    u_knots = np.arange(n_u + 1) * du
    u_j = jnp.asarray(np.maximum(u_knots, 1e-12))

    def s_of_u(u):
        return _s_h_of_u(u, dspec)[0]

    def h_of_u(u):
        return _s_h_of_u(u, dspec)[1]

    s_val = s_of_u(u_j)
    h_val = h_of_u(u_j)
    s_grad = jax.vmap(jax.grad(s_of_u))(u_j)
    h_grad = jax.vmap(jax.grad(h_of_u))(u_j)

    coef_s_rows, coef_h_rows = [], []
    for tc in range(nt):
        sv = (s_val - avg[tc]) / std_s[tc]
        sg = s_grad / std_s[tc]
        hv = h_val / std_h[tc]
        hg = h_grad / std_h[tc]
        # u = 0 is the "no neighbor" sentinel: pin the first knot to the
        # normalized-zero value with zero slope (mapt.py run_u2s rows 0)
        sv = sv.at[0].set(-avg[tc] / std_s[tc])
        sg = sg.at[0].set(0.0)
        hv = hv.at[0].set(0.0)
        hg = hg.at[0].set(0.0)
        coef_s_rows.append(_hermite_coef(sv[:-1], sv[1:],
                                         sg[:-1], sg[1:], du))
        coef_h_rows.append(_hermite_coef(hv[:-1], hv[1:],
                                         hg[:-1], hg[1:], du))
    cfg_u2s = np.asarray([[0.0, u_max, du, 0, n_u]])

    # --- s -> G on a two-segment grid (mapt.py cfg_s2g) ----------------
    s_all = np.concatenate([(np.asarray(s_val)[1:] - avg[t]) / std_s[t]
                            for t in range(nt)]
                           + [-avg / std_s])
    s_lo = float(s_all.min())
    s_hi = float(s_all.max())
    span = max(s_hi - s_lo, 1e-6)
    s_lo -= 0.05 * span
    s_hi += 0.05 * span
    nf, nc = spec.n_s2g_fine, spec.n_s2g_coarse
    ds = (s_hi - s_lo) / (nf + 16 * nc)
    fine = s_lo + np.arange(nf + 1) * ds
    coarse = fine[-1] + np.arange(nc + 1) * (16 * ds)
    cfg_s2g = np.asarray([[s_lo, fine[-1], ds, 0, nf],
                          [fine[-1], coarse[-1], 16 * ds, nf, nf + nc]])

    def g_of_s(layers, sval):
        return _embed_apply(layers, sval[None, None],
                            quantize=False, spec=spec)[0]

    coef_g_rows = []
    for tn in range(nt):
        rows = []
        for knots, step in ((fine, ds), (coarse, 16 * ds)):
            kj = jnp.asarray(knots)
            gv = jax.vmap(lambda s_, l=params["embed"][tn]:
                          g_of_s(l, s_))(kj)              # (nk+1, M1)
            gd = jax.vmap(jax.jacfwd(lambda s_, l=params["embed"][tn]:
                                     g_of_s(l, s_)))(kj)
            rows.append(_hermite_coef(gv[:-1], gv[1:],
                                      gd[:-1], gd[1:], step))
        coef = jnp.concatenate(rows, axis=0)              # (nf+nc, M1, 4)
        coef_g_rows.append(coef.reshape(coef.shape[0], -1))
    return MapTables(cfg_u2s=cfg_u2s, cfg_s2g=cfg_s2g,
                     coef_s=jnp.stack(coef_s_rows),
                     coef_h=jnp.stack(coef_h_rows),
                     coef_g=jnp.stack(coef_g_rows),
                     s_range=(s_lo, s_hi))


def _map_lookup(x, coef, cfg):
    """Piecewise-cubic table evaluation, differentiable.

    x: (...,); coef: (rows, C*4) Hermite coeffs; cfg: (nseg, 5) numpy.
    Returns (..., C)."""
    rows = coef.shape[0]
    ncol = coef.shape[-1] // 4
    idx = jnp.zeros(x.shape, jnp.int32)
    dxx = jnp.zeros_like(x)
    hit = jnp.zeros(x.shape, bool)
    for seg in np.asarray(cfg):
        x0, x1, dx, r0, r1 = seg
        k = jnp.floor((x - x0) / dx).astype(jnp.int32)
        k = jnp.clip(k, 0, int(r1 - r0) - 1)
        inseg = (x >= x0) & (x <= x1) & ~hit
        idx = jnp.where(inseg, k + int(r0), idx)
        dxx = jnp.where(inseg, x - x0 - k * dx, dxx)
        hit = hit | inseg
    # clamp out-of-range to nearest table end
    lo = np.asarray(cfg)[0]
    hi = np.asarray(cfg)[-1]
    below = x < lo[0]
    above = x > hi[1]
    idx = jnp.where(below, 0, jnp.where(above, rows - 1, idx))
    dxx = jnp.where(below, 0.0, jnp.where(above, hi[2], dxx))
    c = jnp.take(coef, idx, axis=0).reshape(x.shape + (ncol, 4))
    t = dxx[..., None]
    return c[..., 0] + t * (c[..., 1] + t * (c[..., 2] + t * c[..., 3]))


def nvnmd_map_energy(params, spec: NvnmdSpec, tables: MapTables,
                     coords, box, types):
    """Table-driven forward: the hardware-execution path. No embedding
    net evaluation — only u2s/u2h/s2g lookups, the GR contraction, the
    band subset, and the quantized fitting net."""
    dspec = spec.descriptor
    nt = dspec.ntypes
    u, unit, valid = _neighbor_u(coords, box, types, dspec)
    coef_s = jnp.take(tables.coef_s, types, axis=0)     # (N, rows, 4)
    coef_h = jnp.take(tables.coef_h, types, axis=0)
    s_n = jax.vmap(lambda ui, cs: _map_lookup(ui, cs, tables.cfg_u2s)
                   [..., 0])(u, coef_s)
    h_n = jax.vmap(lambda ui, ch: _map_lookup(ui, ch, tables.cfg_u2s)
                   [..., 0])(u, coef_h)
    s_n = qf(s_n, spec.nbit_data_fl)     # pads: table's u=0 knot
    h_n = qf(h_n, spec.nbit_data_fl)
    Rt = jnp.concatenate([s_n[:, :, None], h_n[:, :, None] * unit],
                         axis=-1)
    sec = np.concatenate([[0], np.cumsum(dspec.sel)])
    G_secs = []
    for tn in range(nt):
        g = _map_lookup(s_n[:, sec[tn]:sec[tn + 1]],
                        tables.coef_g[tn], tables.cfg_s2g)
        G_secs.append(g)
    G = qf(jnp.concatenate(G_secs, axis=1), spec.nbit_data_fl)
    GR = jnp.einsum("nsc,nsm->ncm", Rt, G) / dspec.nnei
    GR = qf(GR, spec.nbit_data_fl)
    gram = jnp.einsum("ncm,ncl->nml", GR, GR)
    D = gram.reshape(gram.shape[0], -1)[
        :, _band_subset_idx(spec.m1, spec.axis_neuron)]
    D = qf(D, spec.nbit_data_fl)
    e_by_tc = jnp.stack([_fit_apply(params["fit"][tc], D, quantize=True,
                                    spec=spec) for tc in range(nt)], axis=0)
    ae = jnp.take_along_axis(e_by_tc, types[None, :].astype(jnp.int32),
                             axis=0)[0]
    return jnp.sum(ae)


def nvnmd_map_energy_force(params, spec, tables, coords, box, types):
    e, neg_f = jax.value_and_grad(
        lambda x: nvnmd_map_energy(params, spec, tables, x, box,
                                   types))(coords)
    return e, -neg_f


# ---------------------------------------------------------------------------
# Wrap: fixed-point device image (entrypoints/wrap.py role)
# ---------------------------------------------------------------------------

def wrap_model(params, spec: NvnmdSpec, tables: MapTables, path: str):
    """Save the deployment artifact: every tensor as int64 fixed point.

    Weights at 2^-NBIT_FIT_WEIGHT, tables and stats at 2^-NBIT_FIXD_FL —
    the binary the reference's wrap.py would burn into model.pb. Reload
    with `load_wrapped`; the round trip is bit-exact at the quantized
    precision, so eval(load(wrap(m))) == eval(quantized m).
    """
    pw = 2 ** spec.nbit_fit_weight
    pd = 2 ** spec.nbit_data_fl
    out = {"spec_rcut": np.float64(spec.descriptor.rcut),
           "spec_rcut_smth": np.float64(spec.descriptor.rcut_smth),
           "spec_sel": np.asarray(spec.descriptor.sel, np.int64),
           "spec_embed": np.asarray(spec.embed_neurons, np.int64),
           "spec_axis": np.int64(spec.axis_neuron),
           "spec_fit": np.asarray(spec.fit_neurons, np.int64),
           "spec_nbits": np.asarray([spec.nbit_data_fl,
                                     spec.nbit_fit_data_fl,
                                     spec.nbit_fit_weight], np.int64),
           "spec_tab": np.asarray([spec.n_u2s, spec.n_s2g_fine,
                                   spec.n_s2g_coarse], np.int64),
           "cfg_u2s": np.asarray(tables.cfg_u2s),
           "cfg_s2g": np.asarray(tables.cfg_s2g),
           "s_range": np.asarray(tables.s_range),
           "coef_s": np.round(np.asarray(tables.coef_s) * pd
                              ).astype(np.int64),
           "coef_h": np.round(np.asarray(tables.coef_h) * pd
                              ).astype(np.int64),
           "coef_g": np.round(np.asarray(tables.coef_g) * pd
                              ).astype(np.int64),
           "avg": np.round(np.asarray(params["stats"]["avg"]) * pd
                           ).astype(np.int64),
           "std_s": np.round(np.asarray(params["stats"]["std_s"]) * pd
                             ).astype(np.int64),
           "std_h": np.round(np.asarray(params["stats"]["std_h"]) * pd
                             ).astype(np.int64)}
    nt = spec.descriptor.ntypes
    for tn in range(nt):
        for li, layer in enumerate(params["embed"][tn]):
            out[f"e{tn}_{li}_w"] = np.round(
                np.asarray(layer["w"]) * pw).astype(np.int64)
            out[f"e{tn}_{li}_b"] = np.round(
                np.asarray(layer["b"]) * pw).astype(np.int64)
    for tc in range(nt):
        fitp = params["fit"][tc]
        for li, layer in enumerate(fitp["hidden"]):
            out[f"f{tc}_{li}_w"] = np.round(
                np.asarray(layer["w"]) * pw).astype(np.int64)
            out[f"f{tc}_{li}_b"] = np.round(
                np.asarray(layer["b"]) * pw).astype(np.int64)
        out[f"f{tc}_final_w"] = np.round(
            np.asarray(fitp["final"]["w"]) * pw).astype(np.int64)
        # output bias keeps full precision (energy offset)
        out[f"f{tc}_final_b"] = np.asarray(fitp["final"]["b"], np.float64)
    # np.savez appends ".npz" to bare string paths; a file handle writes
    # to exactly the path the caller asked for (model.nvnmd etc.).
    with open(path, "wb") as fh:
        np.savez(fh, **out)


def load_wrapped(path: str):
    """Inverse of wrap_model: (params, spec, tables) with dequantized
    (already-on-grid) weights, so the QNN/table forward is bit-identical
    to the pre-wrap model."""
    z = np.load(path)
    nbits = z["spec_nbits"]
    tabs = z["spec_tab"]
    sel = tuple(int(v) for v in z["spec_sel"])
    spec = NvnmdSpec(
        descriptor=DescriptorSpec(rcut=float(z["spec_rcut"]),
                                  rcut_smth=float(z["spec_rcut_smth"]),
                                  sel=sel, ntypes=len(sel)),
        embed_neurons=tuple(int(v) for v in z["spec_embed"]),
        axis_neuron=int(z["spec_axis"]),
        fit_neurons=tuple(int(v) for v in z["spec_fit"]),
        nbit_data_fl=int(nbits[0]), nbit_fit_data_fl=int(nbits[1]),
        nbit_fit_weight=int(nbits[2]),
        n_u2s=int(tabs[0]), n_s2g_fine=int(tabs[1]),
        n_s2g_coarse=int(tabs[2]))
    pw = 2.0 ** spec.nbit_fit_weight
    pd = 2.0 ** spec.nbit_data_fl
    nt = spec.descriptor.ntypes
    embed = []
    for tn in range(nt):
        layers = []
        li = 0
        while f"e{tn}_{li}_w" in z:
            layers.append({"w": jnp.asarray(z[f"e{tn}_{li}_w"] / pw),
                           "b": jnp.asarray(z[f"e{tn}_{li}_b"] / pw)})
            li += 1
        embed.append(layers)
    fit = []
    for tc in range(nt):
        hidden = []
        li = 0
        while f"f{tc}_{li}_w" in z:
            hidden.append({"w": jnp.asarray(z[f"f{tc}_{li}_w"] / pw),
                           "b": jnp.asarray(z[f"f{tc}_{li}_b"] / pw)})
            li += 1
        fit.append({"hidden": hidden,
                    "final": {"w": jnp.asarray(z[f"f{tc}_final_w"] / pw),
                              "b": jnp.asarray(z[f"f{tc}_final_b"])}})
    params = {"embed": embed, "fit": fit,
              "stats": {"avg": jnp.asarray(z["avg"] / pd),
                        "std_s": jnp.asarray(z["std_s"] / pd),
                        "std_h": jnp.asarray(z["std_h"] / pd)}}
    tables = MapTables(cfg_u2s=z["cfg_u2s"], cfg_s2g=z["cfg_s2g"],
                       coef_s=jnp.asarray(z["coef_s"] / pd),
                       coef_h=jnp.asarray(z["coef_h"] / pd),
                       coef_g=jnp.asarray(z["coef_g"] / pd),
                       s_range=tuple(z["s_range"]))
    return params, spec, tables


# ---------------------------------------------------------------------------
# Two-stage training (entrypoints/train.py: CNN then QNN)
# ---------------------------------------------------------------------------

def train_two_stage(params, spec: NvnmdSpec, frames, *, lr=1e-3,
                    steps_cnn=50, steps_qnn=50, pref_e=1.0, pref_f=1.0):
    """CNN stage (continuous tanh4) then QNN stage (quantization-aware).

    frames: list of (coords, box, types, e_ref, f_ref). Plain Adam-free
    SGD with momentum keeps this dependency-light; returns
    (params, losses_cnn, losses_qnn).
    """
    def loss(p, stage):
        tot = 0.0
        for coords, box, types, e_ref, f_ref in frames:
            e, f = nvnmd_energy_force(p, spec, coords, box, types,
                                      stage=stage)
            na = coords.shape[0]
            tot = tot + pref_e * ((e - e_ref) / na) ** 2 \
                + pref_f * jnp.mean((f - f_ref) ** 2)
        return tot / len(frames)

    losses = {"cnn": [], "qnn": []}
    vel = jax.tree_util.tree_map(jnp.zeros_like, params)
    for stage, steps in (("cnn", steps_cnn), ("qnn", steps_qnn)):
        grad_fn = jax.jit(jax.value_and_grad(
            lambda p: loss(p, stage)))  # noqa: B023 — stage fixed per jit
        for _ in range(steps):
            lv, g = grad_fn(params)
            vel = jax.tree_util.tree_map(
                lambda v, gi: 0.9 * v - lr * gi, vel, g)
            params = jax.tree_util.tree_map(
                lambda p, v: p + v, params, vel)
            losses[stage].append(float(lv))
    return params, losses["cnn"], losses["qnn"]
