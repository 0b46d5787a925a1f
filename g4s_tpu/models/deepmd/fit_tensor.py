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

from typing import NamedTuple, Optional, Tuple

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


def _descriptor_and_qmat(params, spec: ModelSpec, coords, box, types,
                         nopbc: bool = False):
    """(D, qmat): the invariant descriptor and the covariant xyz rows of
    T (se_a.py _pass_filter returns the same qmat)."""
    if nopbc:
        from g4s_tpu.models.deepmd.descriptor import env_mat_nopbc
        R, _ = env_mat_nopbc(coords, types, spec.descriptor)
    else:
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


def atomic_dipole(params, tensor_nets, spec: ModelSpec, coords, box, types,
                  nopbc: bool = False):
    """(N, 3) per-atom dipoles (DipoleFittingSeA.build)."""
    D, Q = _descriptor_and_qmat(params, spec, coords, box, types, nopbc)
    o_tc = jnp.stack([_fit_vector_out(net, D) for net in tensor_nets])
    o = jnp.take_along_axis(o_tc, types[None, :, None].astype(jnp.int32),
                            axis=0)[0]                 # (N, m1)
    return jnp.einsum("ncm,nm->nc", Q, o)


def atomic_polar(params, tensor_nets, spec: ModelSpec, coords, box, types,
                 nopbc: bool = False):
    """(N, 3, 3) symmetric per-atom polarizability (PolarFittingSeA)."""
    D, Q = _descriptor_and_qmat(params, spec, coords, box, types, nopbc)
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


# ---------------------------------------------------------------------------
# Tensor-supervised training (the DPLR dipole-model training path)
# ---------------------------------------------------------------------------


class TensorLossConfig(NamedTuple):
    """deepmd/loss/tensor.py (TensorLoss) semantics: a weighted sum of an
    atomic-label term and a global-label term,

      loss = pref_atomic * mean((scale*(pred_i - label_i))^2)
           + pref * mean((scale*(sum_i pred_i - label))^2) / n_sel

    with the sums/means restricted to `sel_type` atoms (the types that
    carry the tensor, DipoleFittingSeA sel_type)."""

    pref: float = 0.0
    pref_atomic: float = 1.0
    scale: float = 1.0
    sel_type: Optional[Tuple[int, ...]] = None


def _sel_mask(types, ntypes, sel_type):
    if sel_type is None:
        return jnp.ones(types.shape, bool)
    oh = jnp.zeros((ntypes,), bool).at[jnp.asarray(sel_type)].set(True)
    return oh[types]


def make_tensor_loss_fn(spec: ModelSpec, loss_cfg: TensorLossConfig,
                        tensor_fn=atomic_dipole, nopbc: bool = False):
    """Loss over a batch {coord (F,N,3), box (F,...), and labels
    'atomic_label' (F,N,k) and/or 'label' (F,k)}; `tensor_fn` is
    atomic_dipole or atomic_polar (per-atom tensors, trailing dims
    flattened to k). Normalization statistics stay frozen, as the
    reference's non-trainable t_avg/t_std constants do."""

    def loss_fn(tparams, batch, types):
        params, nets = tparams
        params = dict(params,
                      stats=jax.tree_util.tree_map(jax.lax.stop_gradient,
                                                   params["stats"]))
        pred = jax.vmap(lambda c, b: tensor_fn(params, nets, spec, c, b,
                                               types, nopbc=nopbc))(
            batch["coord"], batch["box"])        # (F, N, ...)
        F, N = pred.shape[0], pred.shape[1]
        pred = pred.reshape(F, N, -1)
        mask = _sel_mask(types, spec.descriptor.ntypes, loss_cfg.sel_type)
        n_sel = jnp.maximum(jnp.sum(mask), 1)
        loss = jnp.asarray(0.0, pred.dtype)
        aux = {}
        if loss_cfg.pref_atomic > 0.0 and "atomic_label" in batch:
            lab = batch["atomic_label"].reshape(F, N, -1)
            d2 = jnp.square(loss_cfg.scale * (pred - lab))
            local = jnp.sum(jnp.where(mask[None, :, None], d2, 0.0)) \
                / (F * n_sel * pred.shape[-1])
            loss = loss + loss_cfg.pref_atomic * local
            aux["rmse_local"] = jnp.sqrt(local) / loss_cfg.scale
        if loss_cfg.pref > 0.0 and "label" in batch:
            g = jnp.sum(jnp.where(mask[None, :, None], pred, 0.0), axis=1)
            lab = batch["label"].reshape(F, -1)
            glob = jnp.mean(jnp.square(loss_cfg.scale * (g - lab)))
            loss = loss + loss_cfg.pref * glob / n_sel
            aux["rmse_global"] = jnp.sqrt(glob) / loss_cfg.scale
        return loss, aux

    return loss_fn


def load_tensor_system(path: str, label: str = "dipole",
                       sel_type=None) -> dict:
    """Read a water_tensor-style npy system (examples/water_tensor/
    dipole/training_data): set.*/{coord,box}.npy plus atomic_<label>.npy
    (labels for the sel_type atoms only, in atom order) and/or
    <label>.npy (per-frame global labels); a `nopbc` marker file switches
    the descriptor to the finite-system path.

    Returns {"frames": {coord (F,N,3), box (F,3,3), atomic_label (F,N,k)
    zero-padded on non-selected atoms, label (F,k)}, "types": (N,),
    "nopbc": bool}.
    """
    import glob
    import os
    types = np.loadtxt(os.path.join(path, "type.raw"), dtype=np.int64)
    types = np.atleast_1d(types)
    n = types.size
    coords, boxes, alabels, glabels = [], [], [], []
    for sp in sorted(glob.glob(os.path.join(path, "set.*"))):
        c = np.load(os.path.join(sp, "coord.npy"))
        coords.append(c.reshape(c.shape[0], n, 3))
        b = np.load(os.path.join(sp, "box.npy"))
        boxes.append(b.reshape(b.shape[0], 3, 3))
        ap = os.path.join(sp, f"atomic_{label}.npy")
        if os.path.exists(ap):
            alabels.append(np.load(ap))
        gp = os.path.join(sp, f"{label}.npy")
        if os.path.exists(gp):
            glabels.append(np.load(gp))
    frames = {"coord": np.concatenate(coords),
              "box": np.concatenate(boxes)}
    if alabels:
        al = np.concatenate(alabels)           # (F, nsel * k)
        if sel_type is None:
            sel = np.ones(n, bool)
        else:
            sel = np.isin(types, np.asarray(sel_type))
        nsel = int(sel.sum())
        k = al.shape[1] // nsel
        full = np.zeros((al.shape[0], n, k), al.dtype)
        full[:, sel, :] = al.reshape(al.shape[0], nsel, k)
        frames["atomic_label"] = full
    if glabels:
        frames["label"] = np.concatenate(glabels)
    return {"frames": frames, "types": types,
            "nopbc": os.path.exists(os.path.join(path, "nopbc"))}


def train_tensor(params, tensor_nets, spec: ModelSpec, frames: dict, types,
                 *, numb_steps: int, loss_cfg: TensorLossConfig,
                 tensor_fn=atomic_dipole, lr_cfg=None, batch_size: int = 8,
                 seed: int = 0, callback=None, nopbc: bool = False):
    """Adam + exp-decay LR over tensor labels (DPTrainer with a
    loss/tensor.py objective, trainer.py:816 loop role). `frames` holds
    full arrays keyed like the loss batch; minibatches are drawn with a
    numpy RNG. Returns ((params, tensor_nets), last_aux)."""
    import optax

    from g4s_tpu.models.deepmd.train import LRConfig
    lr_cfg = lr_cfg or LRConfig(1e-2, 1e-4, max(numb_steps // 10, 1),
                                numb_steps)
    opt = optax.adam(learning_rate=lambda step: lr_cfg.lr_at(step))
    loss_fn = make_tensor_loss_fn(spec, loss_cfg, tensor_fn, nopbc=nopbc)
    tparams = (params, tensor_nets)
    opt_state = opt.init(tparams)

    @jax.jit
    def update(tparams, opt_state, batch, step):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tparams, batch, types)
        updates, opt_state = opt.update(grads, opt_state, tparams)
        return optax.apply_updates(tparams, updates), opt_state, loss, aux

    rng = np.random.default_rng(seed)
    nf = frames["coord"].shape[0]
    aux = {}
    for step in range(numb_steps):
        idx = rng.integers(0, nf, min(batch_size, nf))
        batch = {k: jnp.asarray(v[idx]) for k, v in frames.items()}
        tparams, opt_state, loss, aux = update(
            tparams, opt_state, batch, jnp.asarray(step, jnp.float32))
        if callback and (step % 100 == 0 or step == numb_steps - 1):
            callback(step, float(loss), {k: float(v) for k, v in aux.items()})
    return tparams, {k: float(v) for k, v in aux.items()}
