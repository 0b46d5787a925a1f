"""Tensor fitting: dipole and polarizability models.

Reference capability: deepmd/fit/dipole.py (DipoleFittingSeA) and
deepmd/fit/polar.py (PolarFittingSeA), served by DeepTensor
(source/api_cc/DeepTensor.cc). Both reuse the se_e2_a rotation matrix
qmat — the xyz rows of T = R̃^T G — so the outputs are exactly
rotationally covariant by construction:

  dipole_i = qmat_i^T o_i            (o_i: per-atom m1-vector from an MLP)
  polar_i  = qmat_i^T diag(o_i) qmat_i   (symmetric, PSD for o >= 0)

Autodiff supplies d(dipole)/dx etc. where the reference registers custom
TF gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.deepmd.descriptor import env_mat, normalize_env_mat
from g4s_tpu.models.deepmd.model import ModelSpec
from g4s_tpu.models.deepmd.network import (dense_matmul, embedding_net_apply,
                                           init_fitting_net)


def init_tensor_fit(key, spec: ModelSpec, *, dtype=jnp.float64):
    """Per-type MLPs whose FINAL layer is (last_hidden, m1) — the m1
    channel weights applied to qmat."""
    nets = []
    for _ in range(spec.descriptor.ntypes):
        key, sub = jax.random.split(key)
        net = init_fitting_net(sub, spec.descriptor_dim, spec.fit_neurons,
                               resnet_dt=spec.fit_resnet_dt, dtype=dtype)
        key, kf = jax.random.split(key)
        last = spec.fit_neurons[-1]
        net["final"] = {
            "w": jax.random.normal(kf, (last, spec.m1), dtype)
            / np.sqrt(last + spec.m1),
            "b": jnp.zeros((spec.m1,), dtype)}
        nets.append(net)
    return nets


def _fit_vector_out(net, x):
    """fitting_net_apply with an m1-wide final layer."""
    for layer in net["hidden"]:
        h = jnp.tanh(dense_matmul(x, layer["w"]) + layer["b"])
        if "idt" in layer:
            h = h * layer["idt"]
        n_in, n_out = layer["w"].shape
        x = x + h if n_out == n_in else h
    return dense_matmul(x, net["final"]["w"]) + net["final"]["b"]


def _descriptor_and_qmat(params, spec: ModelSpec, coords, box, types):
    """(D, qmat): the invariant descriptor and the covariant xyz rows of
    T (se_a.py _pass_filter returns the same qmat)."""
    R, _ = env_mat(coords, box, types, spec.descriptor)
    Rn = normalize_env_mat(R, types, params["stats"]["davg"],
                           params["stats"]["dstd"])
    nt = spec.descriptor.ntypes
    sel = spec.descriptor.sel
    sec = np.concatenate([[0], np.cumsum(sel)])
    D_tc, Q_tc = [], []
    for tc in range(nt):
        T = jnp.zeros((Rn.shape[0], 4, spec.m1), Rn.dtype)
        for tn in range(nt):
            sec_R = Rn[:, sec[tn]: sec[tn + 1], :]
            G = embedding_net_apply(params["embed"][tc][tn],
                                    sec_R[:, :, 0:1])
            T = T + jnp.einsum("nsc,nsm->ncm", sec_R, G)
        T = T / spec.descriptor.nnei
        D = jnp.einsum("ncm,nck->nmk", T,
                       T[:, :, : spec.axis_neuron]).reshape(Rn.shape[0], -1)
        D_tc.append(D)
        Q_tc.append(T[:, 1:4, :])                      # (N, 3, m1)
    types_i = types[None, :, None].astype(jnp.int32)
    D = jnp.take_along_axis(jnp.stack(D_tc), types_i, axis=0)[0]
    Q = jnp.take_along_axis(jnp.stack(Q_tc),
                            types_i[..., None], axis=0)[0]
    return D, Q


def atomic_dipole(params, tensor_nets, spec: ModelSpec, coords, box, types):
    """(N, 3) per-atom dipoles (DipoleFittingSeA.build)."""
    D, Q = _descriptor_and_qmat(params, spec, coords, box, types)
    o_tc = jnp.stack([_fit_vector_out(net, D) for net in tensor_nets])
    o = jnp.take_along_axis(o_tc, types[None, :, None].astype(jnp.int32),
                            axis=0)[0]                 # (N, m1)
    return jnp.einsum("ncm,nm->nc", Q, o)


def atomic_polar(params, tensor_nets, spec: ModelSpec, coords, box, types):
    """(N, 3, 3) symmetric per-atom polarizability (PolarFittingSeA)."""
    D, Q = _descriptor_and_qmat(params, spec, coords, box, types)
    o_tc = jnp.stack([_fit_vector_out(net, D) for net in tensor_nets])
    o = jnp.take_along_axis(o_tc, types[None, :, None].astype(jnp.int32),
                            axis=0)[0]
    return jnp.einsum("ncm,nm,ndm->ncd", Q, o, Q)


def total_dipole(params, tensor_nets, spec, coords, box, types):
    return jnp.sum(atomic_dipole(params, tensor_nets, spec, coords, box,
                                 types), axis=0)


def total_polar(params, tensor_nets, spec, coords, box, types):
    return jnp.sum(atomic_polar(params, tensor_nets, spec, coords, box,
                                types), axis=0)
