"""Electronic density-of-states fitting (deepmd/fit/dos.py +
deepmd/loss/dos.py).

A per-type MLP maps the invariant se_e2_a descriptor to `numb_dos`
channels per atom (the discretized DOS on a fixed energy grid); the
frame DOS is the atomic sum. The loss combines four lr-scheduled terms
(DOSLoss): global dos MSE, global CDF (cumsum) MSE, atomic dos MSE and
atomic CDF MSE — the CDF terms regularize the low-frequency shape.

Data layout (examples/dos/data/heat-221): set.*/{coord,box}.npy plus
atom_dos.npy (nframes, natoms*numb_dos) and dos.npy (nframes, numb_dos).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.deepmd.descriptor import env_mat
from g4s_tpu.models.deepmd.model import ModelSpec, atomic_descriptor
from g4s_tpu.models.deepmd.network import dense_matmul, init_fitting_net


def init_dos_fit(key, spec: ModelSpec, numb_dos: int, *,
                 bias_dos=None, dtype=jnp.float64):
    """Per-type MLPs with a (last_hidden, numb_dos) final layer;
    bias_dos: (ntypes, numb_dos) output bias from data statistics
    (compute_output_stats role)."""
    nets = []
    for tc in range(spec.descriptor.ntypes):
        key, sub = jax.random.split(key)
        net = init_fitting_net(sub, spec.descriptor_dim, spec.fit_neurons,
                               resnet_dt=spec.fit_resnet_dt, dtype=dtype)
        key, kf = jax.random.split(key)
        last = spec.fit_neurons[-1]
        b = jnp.zeros((numb_dos,), dtype) if bias_dos is None \
            else jnp.asarray(bias_dos[tc], dtype)
        net["final"] = {
            "w": jax.random.normal(kf, (last, numb_dos), dtype)
            / np.sqrt(last + numb_dos),
            "b": b}
        nets.append(net)
    return nets


def _fit_multi_out(net, x):
    for layer in net["hidden"]:
        h = jnp.tanh(dense_matmul(x, layer["w"]) + layer["b"])
        if "idt" in layer:
            h = h * layer["idt"]
        n_in, n_out = layer["w"].shape
        x = x + h if n_out == n_in else h
    return dense_matmul(x, net["final"]["w"]) + net["final"]["b"]


def atomic_dos(params, dos_nets, spec: ModelSpec, coords, box, types):
    """(N, numb_dos) per-atom DOS (DOSFitting.build)."""
    R, nlist = env_mat(coords, box, types, spec.descriptor)
    D = atomic_descriptor(params, spec, R, types, nlist)
    o_tc = jnp.stack([_fit_multi_out(net, D) for net in dos_nets])
    return jnp.take_along_axis(
        o_tc, types[None, :, None].astype(jnp.int32), axis=0)[0]


def total_dos(params, dos_nets, spec, coords, box, types):
    return jnp.sum(atomic_dos(params, dos_nets, spec, coords, box, types),
                   axis=0)


class DOSLossConfig(NamedTuple):
    """DOSLoss prefactors: each term's pref follows the lr schedule
    pref(t) = limit + (start - limit) * lr(t)/start_lr."""

    start_pref_dos: float = 1.0
    limit_pref_dos: float = 1.0
    start_pref_cdf: float = 0.0
    limit_pref_cdf: float = 0.0
    start_pref_ados: float = 0.0
    limit_pref_ados: float = 0.0
    start_pref_acdf: float = 0.0
    limit_pref_acdf: float = 0.0


def make_dos_loss_fn(spec: ModelSpec, loss_cfg: DOSLossConfig, lr_cfg):
    def loss_fn(tparams, batch, types, step):
        params, nets = tparams
        params = dict(params,
                      stats=jax.tree_util.tree_map(jax.lax.stop_gradient,
                                                   params["stats"]))
        ados = jax.vmap(lambda c, b: atomic_dos(params, nets, spec, c, b,
                                                types))(
            batch["coord"], batch["box"])            # (F, N, numb_dos)
        natoms = ados.shape[1]
        lr = lr_cfg.lr_at(step)
        frac = lr / lr_cfg.start_lr
        pref = lambda s, l: l + (s - l) * frac
        loss = jnp.asarray(0.0, ados.dtype)
        aux = {"lr": lr}
        if "dos" in batch:
            g = jnp.sum(ados, axis=1)                # (F, numb_dos)
            d2 = jnp.mean((g - batch["dos"]) ** 2)
            loss = loss + pref(loss_cfg.start_pref_dos,
                               loss_cfg.limit_pref_dos) * d2 / natoms ** 2
            aux["rmse_dos"] = jnp.sqrt(d2) / natoms
            if loss_cfg.start_pref_cdf or loss_cfg.limit_pref_cdf:
                c2 = jnp.mean((jnp.cumsum(g, axis=1)
                               - jnp.cumsum(batch["dos"], axis=1)) ** 2)
                loss = loss + pref(loss_cfg.start_pref_cdf,
                                   loss_cfg.limit_pref_cdf) \
                    * c2 / natoms ** 2
        if "atom_dos" in batch:
            a2 = jnp.mean((ados - batch["atom_dos"]) ** 2)
            loss = loss + pref(loss_cfg.start_pref_ados,
                               loss_cfg.limit_pref_ados) * a2
            aux["rmse_ados"] = jnp.sqrt(a2)
            if loss_cfg.start_pref_acdf or loss_cfg.limit_pref_acdf:
                ac2 = jnp.mean((jnp.cumsum(ados, axis=2)
                                - jnp.cumsum(batch["atom_dos"],
                                             axis=2)) ** 2)
                loss = loss + pref(loss_cfg.start_pref_acdf,
                                   loss_cfg.limit_pref_acdf) * ac2
        return loss, aux
    return loss_fn


def load_dos_system(path: str) -> dict:
    """Read a heat-221-style DOS system."""
    import glob
    import os
    types = np.atleast_1d(np.loadtxt(os.path.join(path, "type.raw"),
                                     dtype=np.int64))
    n = types.size
    coords, boxes, adoss, doss = [], [], [], []
    for sp in sorted(glob.glob(os.path.join(path, "set.*"))):
        c = np.load(os.path.join(sp, "coord.npy"))
        coords.append(c.reshape(c.shape[0], n, 3))
        b = np.load(os.path.join(sp, "box.npy"))
        boxes.append(b.reshape(b.shape[0], 3, 3))
        ap = os.path.join(sp, "atom_dos.npy")
        if os.path.exists(ap):
            a = np.load(ap)
            adoss.append(a.reshape(a.shape[0], n, -1))
        gp = os.path.join(sp, "dos.npy")
        if os.path.exists(gp):
            doss.append(np.load(gp))
    frames = {"coord": np.concatenate(coords),
              "box": np.concatenate(boxes)}
    if adoss:
        frames["atom_dos"] = np.concatenate(adoss)
    if doss:
        frames["dos"] = np.concatenate(doss)
    return {"frames": frames, "types": types}


def train_dos(params, dos_nets, spec: ModelSpec, frames: dict, types, *,
              numb_steps: int, loss_cfg: DOSLossConfig, lr_cfg=None,
              batch_size: int = 4, seed: int = 0, callback=None):
    """Adam training over DOS labels; returns ((params, nets), aux)."""
    import optax

    from g4s_tpu.models.deepmd.train import LRConfig
    lr_cfg = lr_cfg or LRConfig(1e-2, 1e-4, max(numb_steps // 10, 1),
                                numb_steps)
    opt = optax.adam(learning_rate=lambda step: lr_cfg.lr_at(step))
    loss_fn = make_dos_loss_fn(spec, loss_cfg, lr_cfg)
    tparams = (params, dos_nets)
    opt_state = opt.init(tparams)

    @jax.jit
    def update(tparams, opt_state, batch, step):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tparams, batch, types, step)
        upd, opt_state = opt.update(grads, opt_state, tparams)
        return optax.apply_updates(tparams, upd), opt_state, loss, aux

    rng = np.random.default_rng(seed)
    nf = frames["coord"].shape[0]
    aux = {}
    for step in range(numb_steps):
        idx = rng.integers(0, nf, min(batch_size, nf))
        batch = {k: jnp.asarray(v[idx]) for k, v in frames.items()}
        tparams, opt_state, loss, aux = update(
            tparams, opt_state, batch, jnp.asarray(step, jnp.float32))
        if callback and (step % 20 == 0 or step == numb_steps - 1):
            callback(step, float(loss), {k: float(v) for k, v in aux.items()})
    return tparams, {k: float(v) for k, v in aux.items()}
