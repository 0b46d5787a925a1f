"""se_e2_a energy model: descriptor -> embeddings -> fitting -> E, F, virial.

Assembles the forward graph that the reference builds in TF
(deepmd/deepmd/model/ener.py + descriptor/se_a.py DescrptSeA.build:501):

  R (N, nnei, 4)  normalized per center type
  per (center type tc, neighbor type tn): G = embed_{tc,tn}(s(r))
  T  = sum_sections R̃_sec^T G_sec / nnei          (se_a.py:1056-1095)
  D  = T^T T[:, :axis_neuron]  flattened           (se_a.py:1099-1105)
  E_i = fit_{tc}(D_i) + bias_{tc}
  E  = sum_i E_i;  F = -dE/dx (jax.grad replaces the hand-written
  prod_force_se_a adjoint, source/op/prod_force_multi_device.cc);
  virial = dE/d(strain) likewise replaces prod_virial.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.deepmd.descriptor import (DescriptorSpec, env_mat,
                                              normalize_env_mat)
from g4s_tpu.models.deepmd.network import (embedding_net_apply,
                                           fitting_net_apply,
                                           init_embedding_net,
                                           init_fitting_net)


class ModelSpec(NamedTuple):
    descriptor: DescriptorSpec
    embed_neurons: Tuple[int, ...]      # e.g. (25, 50, 100)
    axis_neuron: int                    # M2, e.g. 16
    fit_neurons: Tuple[int, ...]        # e.g. (240, 240, 240)
    embed_resnet_dt: bool = False
    fit_resnet_dt: bool = True
    descriptor_type: str = "se_e2_a"    # se_e2_r|se_atten|se_t|hybrid|
                                        # loc_frame|se_a_ebd|se_a_mask
    attn_layers: int = 2                # se_atten: attention layers
    attn_dim: int = 0                   # se_atten: Q/K/V width (0 -> m1)
    tebd_dim: int = 8                   # se_atten: type-embedding width
    hybrid_types: Tuple[str, ...] = ("se_e2_a", "se_e2_r")  # hybrid parts
    numb_fparam: int = 0                # frame parameters appended to the
    numb_aparam: int = 0                # fitting input (ener.py:127-158)

    @property
    def m1(self) -> int:
        return self.embed_neurons[-1]

    @property
    def descriptor_dim(self) -> int:
        if self.descriptor_type == "hybrid":
            return sum(self._replace(descriptor_type=t).descriptor_dim
                       for t in self.hybrid_types)
        if self.descriptor_type == "loc_frame":
            return 4 * self.descriptor.nnei
        if self.descriptor_type in ("se_e2_r", "se_t"):
            return self.m1
        # se_e2_a / se_atten / se_a_ebd / se_a_mask all contract to M1*M2
        return self.m1 * self.axis_neuron


def _init_embed(key, spec: ModelSpec, dtype):
    """Embedding-side parameters for one descriptor type."""
    nt = spec.descriptor.ntypes
    if spec.descriptor_type == "loc_frame":
        return []            # no embedding nets: raw local coordinates
    if spec.descriptor_type == "hybrid":
        parts = []
        for t in spec.hybrid_types:
            key, sub = jax.random.split(key)
            parts.append(_init_embed(sub, spec._replace(descriptor_type=t),
                                     dtype))
        return {"parts": parts}
    if spec.descriptor_type in ("se_atten", "se_a_ebd"):
        # one type-mixed embedding net over [s(r), tebd_j, tebd_i];
        # se_a_ebd (DescrptSeAEbd, deepmd/descriptor/se_a_ebd.py) is the
        # same type-embedded input WITHOUT the attention refinement
        key, k1, k2 = jax.random.split(key, 3)
        embed = init_embedding_net(k1, spec.embed_neurons,
                                   in_dim=1 + 2 * spec.tebd_dim,
                                   resnet_dt=spec.embed_resnet_dt,
                                   dtype=dtype)
        d = spec.attn_dim or spec.m1
        attn = []
        n_attn = spec.attn_layers if spec.descriptor_type == "se_atten" else 0
        for _ in range(n_attn):
            key, kq, kk, kv, ko = jax.random.split(key, 5)
            sc = 1.0 / np.sqrt(spec.m1)
            attn.append({
                "wq": sc * jax.random.normal(kq, (spec.m1, d), dtype),
                "wk": sc * jax.random.normal(kk, (spec.m1, d), dtype),
                "wv": sc * jax.random.normal(kv, (spec.m1, d), dtype),
                "wo": sc * jax.random.normal(ko, (d, spec.m1), dtype)})
        key, kt = jax.random.split(key)
        tebd = 0.1 * jax.random.normal(kt, (nt, spec.tebd_dim), dtype)
        return {"net": embed, "attn": attn, "tebd": tebd}
    # se_e2_a / se_e2_r: nets indexed [center_type][neighbor_type];
    # se_t: the same nt x nt grid indexed [type1][type2] (upper triangle
    # used — DescrptSeT's per-type-pair angular nets, se_t.py _filter)
    embed = []
    for tc in range(nt):
        row = []
        for tn in range(nt):
            key, sub = jax.random.split(key)
            row.append(init_embedding_net(sub, spec.embed_neurons,
                                          resnet_dt=spec.embed_resnet_dt,
                                          dtype=dtype))
        embed.append(row)
    return embed


def init_params(key, spec: ModelSpec, *, bias_atom_e=None, dtype=jnp.float64):
    """Parameter pytree: embed[tc][tn] nets + fit[tc] nets + stats
    (+ type embedding and attention weights for se_atten)."""
    nt = spec.descriptor.ntypes
    if bias_atom_e is None:
        bias_atom_e = np.zeros(nt)
    key, ke = jax.random.split(key)
    embed = _init_embed(ke, spec, dtype)
    fit = []
    fit_in = spec.descriptor_dim + spec.numb_fparam + spec.numb_aparam
    for tc in range(nt):
        key, sub = jax.random.split(key)
        fit.append(init_fitting_net(sub, fit_in,
                                    spec.fit_neurons,
                                    resnet_dt=spec.fit_resnet_dt,
                                    bias_out=float(bias_atom_e[tc]),
                                    dtype=dtype))
    nnei = spec.descriptor.nnei
    stats = {"davg": jnp.zeros((nt, nnei, 4), dtype),
             "dstd": jnp.ones((nt, nnei, 4), dtype)}
    if spec.numb_fparam:
        stats["fparam_avg"] = jnp.zeros((spec.numb_fparam,), dtype)
        stats["fparam_std"] = jnp.ones((spec.numb_fparam,), dtype)
    if spec.numb_aparam:
        stats["aparam_avg"] = jnp.zeros((spec.numb_aparam,), dtype)
        stats["aparam_std"] = jnp.ones((spec.numb_aparam,), dtype)
    return {"embed": embed, "fit": fit, "stats": stats}


def atomic_descriptor(params, spec: ModelSpec, R, types, nlist=None):
    """R: (N, nnei, 4) raw env mat -> D: (N, descriptor_dim)."""
    if spec.descriptor_type == "loc_frame":
        return _descriptor_loc_frame(spec, R)
    Rn = normalize_env_mat(R, types, params["stats"]["davg"],
                           params["stats"]["dstd"])
    return _descr_dispatch(params["embed"], spec, Rn, types, nlist)


def _descriptor_loc_frame(spec: ModelSpec, R):
    """Local-frame descriptor (DescrptLocFrame,
    deepmd/descriptor/loc_frame.py): build an orthonormal frame per atom
    from two axis neighbors (first neighbor of the first two type
    sections by default — the axis_rule "closest of type" convention)
    and express every neighbor's (s, x, y, z) env-mat row in that frame.
    Uses the smoothed env mat (channel directions are parallel to the
    raw displacements, so frames and invariance are identical)."""
    sel = spec.descriptor.sel
    sec = np.concatenate([[0], np.cumsum(sel)])
    nt = spec.descriptor.ntypes
    t1, t2 = 0, min(1, nt - 1)
    a1 = R[:, sec[t1], 1:4]                        # closest of type t1
    idx2 = sec[t2] if t2 != t1 else sec[t1] + 1    # distinct axis atom
    a2 = R[:, idx2, 1:4]
    eps = 1e-12
    e1 = a1 / (jnp.linalg.norm(a1, axis=1, keepdims=True) + eps)
    a2p = a2 - jnp.sum(a2 * e1, axis=1, keepdims=True) * e1
    e2 = a2p / (jnp.linalg.norm(a2p, axis=1, keepdims=True) + eps)
    e3 = jnp.cross(e1, e2)
    F = jnp.stack([e1, e2, e3], axis=1)            # (N, 3frame, 3global)
    xyz_loc = jnp.einsum("nfg,nkg->nkf", F, R[:, :, 1:4])
    D = jnp.concatenate([R[:, :, 0:1], xyz_loc], axis=2)
    return D.reshape(R.shape[0], -1)


def _descr_dispatch(embed, spec: ModelSpec, Rn, types, nlist):
    if spec.descriptor_type == "hybrid":
        # DescrptHybrid (deepmd/descriptor/hybrid.py): concatenation of
        # sub-descriptors over the same neighbor environment
        parts = [
            _descr_dispatch(embed["parts"][i],
                            spec._replace(descriptor_type=t), Rn, types,
                            nlist)
            for i, t in enumerate(spec.hybrid_types)]
        return jnp.concatenate(parts, axis=-1)
    if spec.descriptor_type in ("se_atten", "se_a_ebd"):
        return _descriptor_atten(embed, spec, Rn, types, nlist)
    if spec.descriptor_type == "se_t":
        return _descriptor_se_t(embed, spec, Rn)
    if spec.descriptor_type == "se_a_mask":
        return _descriptor_plain(embed, spec, Rn, types)
    return _descriptor_plain(embed, spec, Rn, types)


def _descriptor_se_t(embed, spec: ModelSpec, Rn):
    """Three-body descriptor (DescrptSeT, deepmd/descriptor/se_t.py:617
    _filter): for each neighbor-type pair (t1 <= t2) the angular matrix
    theta_jk = x̃_j . x̃_k (displacement channels) is embedded through a
    per-pair net and contracted res = sum_jk theta_jk G_jk / (sel1 sel2)."""
    sel = spec.descriptor.sel
    sec = np.concatenate([[0], np.cumsum(sel)])
    nt = spec.descriptor.ntypes
    N = Rn.shape[0]
    D = jnp.zeros((N, spec.m1), Rn.dtype)
    for t1 in range(nt):
        x1 = Rn[:, sec[t1]: sec[t1 + 1], 1:4]
        for t2 in range(t1, nt):
            x2 = Rn[:, sec[t2]: sec[t2 + 1], 1:4]
            theta = jnp.einsum("njm,nkm->njk", x1, x2)
            G = embedding_net_apply(embed[t1][t2], theta[..., None])
            D = D + (jnp.einsum("njk,njkm->nm", theta, G)
                     / (sel[t1] * sel[t2]))
    return D


def _descriptor_plain(embed, spec: ModelSpec, Rn, types):
    nt = spec.descriptor.ntypes
    sel = spec.descriptor.sel
    nnei = spec.descriptor.nnei
    sec = np.concatenate([[0], np.cumsum(sel)])

    # per center type, accumulate T = sum over neighbor sections R̃^T G
    D_by_tc = []
    for tc in range(nt):
        if spec.descriptor_type == "se_e2_r":
            # radial-only descriptor (DescrptSeR, deepmd/descriptor/se_r.py):
            # D = mean over neighbors of the embedded s(r)
            acc = jnp.zeros((Rn.shape[0], spec.m1), Rn.dtype)
            for tn in range(nt):
                sec_R = Rn[:, sec[tn]: sec[tn + 1], :]
                G = embedding_net_apply(embed[tc][tn], sec_R[:, :, 0:1])
                acc = acc + jnp.sum(G, axis=1)
            D_by_tc.append(acc / nnei)
            continue
        T = jnp.zeros((Rn.shape[0], 4, spec.m1), Rn.dtype)
        for tn in range(nt):
            sec_R = Rn[:, sec[tn]: sec[tn + 1], :]         # (N, sel_tn, 4)
            s_in = sec_R[:, :, 0:1]                        # radial channel
            G = embedding_net_apply(embed[tc][tn], s_in)
            T = T + jnp.einsum("nsc,nsm->ncm", sec_R, G)
        T = T / nnei
        T2 = T[:, :, : spec.axis_neuron]
        D = jnp.einsum("ncm,nck->nmk", T, T2).reshape(Rn.shape[0], -1)
        D_by_tc.append(D)
    # select per-atom according to its type
    D_all = jnp.stack(D_by_tc, axis=0)                     # (nt, N, M1*M2)
    return jnp.take_along_axis(
        D_all, types[None, :, None].astype(jnp.int32), axis=0)[0]


def _descriptor_atten(emb, spec: ModelSpec, Rn, types, nlist):
    """DPA-style attention descriptor (DescrptSeAtten, se_atten.py):
    type-mixed neighbor embedding of [s(r), tebd_neighbor, tebd_center]
    refined by gated dot-product attention over neighbors, then the same
    R^T G contraction as se_e2_a."""
    tebd = emb["tebd"]
    valid = Rn[:, :, 0] != 0.0 if nlist is None else (nlist >= 0)
    ntypes = spec.descriptor.ntypes
    if nlist is None:
        raise ValueError("se_atten needs the neighbor list (types of "
                         "neighbors); call via total_energy")
    nb_type = jnp.where(nlist >= 0, jnp.take(types, jnp.maximum(nlist, 0)),
                        0)
    t_j = jnp.take(tebd, nb_type, axis=0)               # (N, nnei, d_t)
    t_i = jnp.broadcast_to(jnp.take(tebd, types, axis=0)[:, None, :],
                           t_j.shape)
    s_in = Rn[:, :, 0:1]
    x = jnp.concatenate([s_in, t_j, t_i], axis=-1)
    G = embedding_net_apply(emb["net"], x)              # (N, nnei, m1)
    d = spec.attn_dim or spec.m1
    scale = 1.0 / jnp.sqrt(jnp.asarray(float(d), G.dtype))
    neg = jnp.asarray(-1e9, G.dtype)
    for layer in emb["attn"]:
        q = G @ layer["wq"]
        k = G @ layer["wk"]
        v = G @ layer["wv"]
        logits = jnp.einsum("nid,njd->nij", q, k) * scale
        logits = jnp.where(valid[:, None, :], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(valid[:, :, None], attn, 0.0)
        G = G + (attn @ v) @ layer["wo"]
    G = jnp.where(valid[:, :, None], G, 0.0)
    T = jnp.einsum("nsc,nsm->ncm", Rn, G) / spec.descriptor.nnei
    D = jnp.einsum("ncm,nck->nmk", T, T[:, :, : spec.axis_neuron])
    return D.reshape(Rn.shape[0], -1)


def _fit_input(params, spec: ModelSpec, D, fparam, aparam):
    """Append normalized frame/atom parameters to the fitting input
    (ener.py:191-260: (p - avg)/std, fparam tiled over atoms)."""
    if spec.numb_fparam:
        if fparam is None:
            raise ValueError("model has numb_fparam > 0: pass fparam")
        st = params["stats"]
        fp = (jnp.asarray(fparam, D.dtype).reshape(-1)
              - st["fparam_avg"]) / st["fparam_std"]
        D = jnp.concatenate(
            [D, jnp.broadcast_to(fp[None, :], (D.shape[0], fp.size))],
            axis=1)
    if spec.numb_aparam:
        if aparam is None:
            raise ValueError("model has numb_aparam > 0: pass aparam")
        st = params["stats"]
        ap = (jnp.asarray(aparam, D.dtype).reshape(D.shape[0], -1)
              - st["aparam_avg"]) / st["aparam_std"]
        D = jnp.concatenate([D, ap], axis=1)
    return D


def atomic_energy(params, spec: ModelSpec, D, types, fparam=None,
                  aparam=None):
    D = _fit_input(params, spec, D, fparam, aparam)
    e_by_tc = jnp.stack([fitting_net_apply(params["fit"][tc], D)
                         for tc in range(spec.descriptor.ntypes)], axis=0)
    return jnp.take_along_axis(e_by_tc, types[None, :].astype(jnp.int32),
                               axis=0)[0]


def total_energy(params, spec: ModelSpec, coords, box, types,
                 atom_mask=None, fparam=None, aparam=None):
    if spec.descriptor_type == "se_a_mask":
        from g4s_tpu.models.deepmd.descriptor import env_mat_nopbc
        R, nlist = env_mat_nopbc(coords, types, spec.descriptor,
                                 atom_mask=atom_mask)
        D = atomic_descriptor(params, spec, R, types, nlist)
        ae = atomic_energy(params, spec, D, types, fparam, aparam)
        if atom_mask is not None:
            ae = jnp.where(atom_mask, ae, 0.0)   # virtual atoms drop out
        return jnp.sum(ae)
    R, nlist = env_mat(coords, box, types, spec.descriptor)
    D = atomic_descriptor(params, spec, R, types, nlist)
    return jnp.sum(atomic_energy(params, spec, D, types, fparam, aparam))


def energy_force_virial(params, spec: ModelSpec, coords, box, types,
                        fparam=None, aparam=None):
    """E, F = -dE/dx, virial W = -dE/de (strain derivative) for one frame."""
    def e_of(x, strain):
        xs = x @ (jnp.eye(3, dtype=x.dtype) + strain)
        bs = box @ (jnp.eye(3, dtype=x.dtype) + strain)
        return total_energy(params, spec, xs, bs, types,
                            fparam=fparam, aparam=aparam)

    zero_strain = jnp.zeros((3, 3), coords.dtype)
    e, (g_x, g_s) = jax.value_and_grad(e_of, argnums=(0, 1))(coords, zero_strain)
    return e, -g_x, -g_s
