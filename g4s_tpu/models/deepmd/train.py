"""Training loop: weighted energy/force/virial loss, exp-decay LR, Adam,
lcurve output, data-parallel scaling.

Reference semantics:
  - loss (deepmd/deepmd/loss/ener.py:100-215): per-step prefactors
    pref(t) = limit + (start - limit) * lr(t)/start_lr; loss =
    pref_e * mean(dE^2)/natoms + pref_f * mean(dF^2) (+ virial term).
  - LR (deepmd/deepmd/utils/learning_rate.py): exponential decay with
    decay_rate derived from stop_lr at numb_steps.
  - trainer loop (deepmd/deepmd/train/trainer.py:816-1120): periodic
    lcurve.out lines with rmse_e/_f per disp_freq, checkpointing.
  - data parallelism: the reference wraps the optimizer in Horovod
    (trainer.py:685); here the batch axis is sharded over the mesh and
    gradients combine via psum — pure-jax DP on ICI.
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from g4s_tpu.models.deepmd.model import ModelSpec, energy_force_virial


class LossConfig(NamedTuple):
    start_pref_e: float = 0.02
    limit_pref_e: float = 1.0
    start_pref_f: float = 1000.0
    limit_pref_f: float = 1.0
    start_pref_v: float = 0.0
    limit_pref_v: float = 0.0


class LRConfig(NamedTuple):
    start_lr: float = 1e-3
    stop_lr: float = 3.51e-8
    decay_steps: int = 5000
    numb_steps: int = 1000000

    def decay_rate(self) -> float:
        return (self.stop_lr / self.start_lr) ** (
            self.decay_steps / max(self.numb_steps, 1))

    def lr_at(self, step):
        return self.start_lr * self.decay_rate() ** (step / self.decay_steps)


def batched_efv(params, spec: ModelSpec, coord, box, types,
                fparam=None, aparam=None):
    """vmapped energy/force/virial over the frame axis."""
    if fparam is not None or aparam is not None:
        extras = tuple(x for x in (fparam, aparam) if x is not None)

        def one(c, b, *xs):
            fp = xs[0] if fparam is not None else None
            ap = xs[-1] if aparam is not None else None
            return energy_force_virial(params, spec, c, b, types,
                                       fparam=fp, aparam=ap)
        return jax.vmap(one)(coord, box, *extras)
    return jax.vmap(lambda c, b: energy_force_virial(params, spec, c, b,
                                                     types))(coord, box)


def make_loss_fn(spec: ModelSpec, loss_cfg: LossConfig, lr_cfg: LRConfig):
    def loss_fn(params, batch, step):
        coord, box = batch["coord"], batch["box"]
        types = batch["types"]
        natoms = coord.shape[1]
        e, f, v = batched_efv(params, spec, coord, box, types,
                              batch.get("fparam"), batch.get("aparam"))
        lr = lr_cfg.lr_at(step)
        frac = lr / lr_cfg.start_lr
        pref_e = loss_cfg.limit_pref_e + (loss_cfg.start_pref_e
                                          - loss_cfg.limit_pref_e) * frac
        pref_f = loss_cfg.limit_pref_f + (loss_cfg.start_pref_f
                                          - loss_cfg.limit_pref_f) * frac
        de2 = jnp.mean((e - batch["energy"]) ** 2)
        df2 = jnp.mean((f - batch["force"]) ** 2)
        loss = pref_e * de2 / natoms + pref_f * df2
        if loss_cfg.start_pref_v or loss_cfg.limit_pref_v:
            pref_v = loss_cfg.limit_pref_v + (loss_cfg.start_pref_v
                                              - loss_cfg.limit_pref_v) * frac
            dv2 = jnp.mean((v - batch["virial"]) ** 2)
            loss = loss + pref_v * dv2 / natoms
        aux = {"rmse_e": jnp.sqrt(de2) / natoms, "rmse_f": jnp.sqrt(df2),
               "lr": lr}
        return loss, aux
    return loss_fn


@dataclasses.dataclass
class Trainer:
    """DPTrainer equivalent: owns optimizer state + jitted update."""

    spec: ModelSpec
    loss_cfg: LossConfig = LossConfig()
    lr_cfg: LRConfig = LRConfig()

    def __post_init__(self):
        self.loss_fn = make_loss_fn(self.spec, self.loss_cfg, self.lr_cfg)
        sched = lambda step: self.lr_cfg.lr_at(step)
        self.opt = optax.adam(learning_rate=sched)

        def update(params, opt_state, batch, step):
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch, step)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        self._update = jax.jit(update)

    def init(self, params):
        return self.opt.init(params)

    def train(self, params, data, numb_steps: int, *, disp_freq: int = 100,
              lcurve_path: Optional[str] = None, callback=None):
        opt_state = self.init(params)
        lcurve = open(lcurve_path, "w") if lcurve_path else None
        if lcurve:
            lcurve.write("# step rmse_e rmse_f lr wall\n")
        t0 = time.time()
        # floating batch arrays adopt the parameter dtype so f64 npy data
        # never drags an f32 (TPU) run into emulated f64
        pdtype = jax.tree_util.tree_leaves(params)[0].dtype
        def _to_dev(v):
            a = jnp.asarray(v)
            return a.astype(pdtype) if jnp.issubdtype(a.dtype,
                                                      jnp.floating) else a
        for step in range(numb_steps):
            raw = data.sample_batch()
            batch = {k: _to_dev(v) for k, v in raw.items()}
            params, opt_state, loss, aux = self._update(
                params, opt_state, batch,
                jnp.asarray(step, jnp.result_type(float)))
            if step % disp_freq == 0 or step == numb_steps - 1:
                line = (f"{step} {float(aux['rmse_e']):.6e} "
                        f"{float(aux['rmse_f']):.6e} {float(aux['lr']):.3e} "
                        f"{time.time() - t0:.2f}")
                if lcurve:
                    lcurve.write(line + "\n")
                    lcurve.flush()
                if callback:
                    callback(step, aux)
        if lcurve:
            lcurve.close()
        return params


def make_dp_train_step(spec: ModelSpec, loss_cfg: LossConfig,
                       lr_cfg: LRConfig, opt, mesh, *, data_axis="data"):
    """Data-parallel train step over a Mesh: batch sharded on `data_axis`,
    params replicated, gradients psum-combined by pjit automatically."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    loss_fn = make_loss_fn(spec, loss_cfg, lr_cfg)

    def step_fn(params, opt_state, batch, step):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, step)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    batch_sharding = {
        "coord": NamedSharding(mesh, P(data_axis)),
        "box": NamedSharding(mesh, P(data_axis)),
        "energy": NamedSharding(mesh, P(data_axis)),
        "force": NamedSharding(mesh, P(data_axis)),
        "types": NamedSharding(mesh, P()),
    }
    replicated = NamedSharding(mesh, P())
    jitted = jax.jit(
        step_fn,
        in_shardings=(replicated, replicated, batch_sharding, replicated),
        out_shardings=(replicated, replicated, replicated, replicated))
    return jitted, batch_sharding


def change_energy_bias(params, spec, data, ntypes: int, *, n_frames: int = 10):
    """Finetune bias correction (trainer.py:1326-1416 init-from-pretrained
    role / deepmd's change_energy_bias): evaluate the pretrained model on
    the NEW data, least-squares the per-type energy residual against type
    counts, and shift each type's final fitting-layer output bias."""
    import jax
    import numpy as np
    from g4s_tpu.models.deepmd.model import energy_force_virial

    rows, res = [], []
    for s in data.systems:
        nf = min(n_frames, s.nframes)
        count = np.bincount(s.types, minlength=ntypes).astype(np.float64)
        types = jnp.asarray(s.types)
        for i in range(nf):
            e_pred, _, _ = energy_force_virial(
                params, spec, jnp.asarray(s.coord[i]),
                jnp.asarray(s.box[i]), types)
            rows.append(count)
            res.append(float(s.energy[i]) - float(e_pred))
    delta, *_ = np.linalg.lstsq(np.stack(rows), np.asarray(res), rcond=None)
    # the final fitting layer of each type-net carries the per-type bias
    new_fit = []
    for tc, net in enumerate(params["fit"]):
        final = dict(net["final"],
                     b=net["final"]["b"] + jnp.asarray(
                         delta[tc], net["final"]["b"].dtype))
        new_fit.append(dict(net, final=final))
    return dict(params, fit=new_fit), delta


class MultiTaskTrainer:
    """Multi-task training (trainer.py multi-task mode): one SHARED
    descriptor (embedding nets + stats) with per-task fitting heads and
    per-task loss preferences, tasks sampled round-robin. The gradient
    of a step updates the shared embeddings plus that task's head only
    (the other heads receive zero gradient through masking-by-absence).
    """

    def __init__(self, spec, tasks):
        """tasks: list of dicts {name, data, loss_cfg, lr_cfg}."""
        self.spec = spec
        self.tasks = tasks
        self.trainers = [Trainer(spec, t.get("loss_cfg", LossConfig()),
                                 t.get("lr_cfg", LRConfig()))
                         for t in tasks]

    def init_params(self, key, *, dtype=jnp.float64):
        import jax
        from g4s_tpu.models.deepmd.model import init_params
        keys = jax.random.split(key, len(self.tasks) + 1)
        base = init_params(keys[0], self.spec, dtype=dtype)
        shared = {"embed": base["embed"], "stats": base["stats"]}
        heads = []
        for i, t in enumerate(self.tasks):
            p = init_params(
                keys[i + 1], self.spec,
                bias_atom_e=t["data"].energy_bias(
                    self.spec.descriptor.ntypes), dtype=dtype)
            heads.append(p["fit"])
        return {"shared": shared, "heads": heads}

    def train(self, mt_params, numb_steps: int, *, disp_freq: int = 100,
              callback=None):
        states = [tr.init(self.task_params(mt_params, i))
                  for i, tr in enumerate(self.trainers)]
        hist = {t["name"]: [] for t in self.tasks}
        for step in range(numb_steps):
            i = step % len(self.tasks)
            tr, task = self.trainers[i], self.tasks[i]
            params_i = self.task_params(mt_params, i)
            batch = {k: jnp.asarray(v)
                     for k, v in task["data"].sample_batch().items()}
            params_i, states[i], loss, aux = tr._update(
                params_i, states[i], batch,
                jnp.asarray(step // len(self.tasks),
                            jnp.result_type(float)))
            # write back: shared descriptor parts + this task's head only
            mt_params = {
                "shared": {"embed": params_i["embed"],
                           "stats": params_i["stats"]},
                "heads": [params_i["fit"] if j == i else h
                          for j, h in enumerate(mt_params["heads"])]}
            if step % disp_freq == 0 or step == numb_steps - 1:
                hist[task["name"]].append(float(aux["rmse_f"]))
                if callback:
                    callback(step, task["name"], aux)
        return mt_params, hist

    def task_params(self, mt_params, i: int):
        return {**mt_params["shared"], "fit": mt_params["heads"][i]}
