"""Inference API: DeepPot + ensemble model deviation.

Reference surface: deepmd/deepmd/infer/deep_pot.py (DeepPot.eval — session
wrapper over a frozen graph, :642 LoC) and model_devi.py (force deviation
across an ensemble of models, used for active-learning error estimates).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.deepmd.freeze import load_frozen
from g4s_tpu.models.deepmd.model import energy_force_virial


class DeepPot:
    """Frozen-model evaluator (DeepPot.eval equivalent).

    dp = DeepPot("frozen_model.npz")
    e, f, v = dp.eval(coords, box, types)      # single frame or batch
    """

    def __init__(self, model_file):
        self.params, self.spec = load_frozen(model_file)
        from g4s_tpu.models.deepmd.freeze import load_frozen_meta
        self.type_map = load_frozen_meta(model_file).get("type_map") or []
        self._single = jax.jit(
            lambda c, b, t, fp, ap: energy_force_virial(
                self.params, self.spec, c, b, t, fparam=fp, aparam=ap))
        self._batch_cache = {}

    def _batch(self, c, b, t, fp, ap):
        key = (fp is None, ap is None)
        if key not in self._batch_cache:
            axes = (0, 0, None, None if fp is None else 0,
                    None if ap is None else 0)
            self._batch_cache[key] = jax.jit(jax.vmap(
                lambda c_, b_, t_, fp_, ap_: energy_force_virial(
                    self.params, self.spec, c_, b_, t_,
                    fparam=fp_, aparam=ap_), in_axes=axes))
        return self._batch_cache[key](c, b, t, fp, ap)

    @property
    def rcut(self) -> float:
        return self.spec.descriptor.rcut

    @property
    def ntypes(self) -> int:
        return self.spec.descriptor.ntypes

    def eval(self, coords, box, atom_types, fparam=None, aparam=None):
        """e/f/v; models with numb_fparam/numb_aparam require the
        matching parameters (DeepPot.eval fparam/aparam kwargs)."""
        coords = jnp.asarray(coords)
        box = jnp.asarray(box)
        types = jnp.asarray(atom_types)
        fp = None if fparam is None else jnp.asarray(fparam)
        ap = None if aparam is None else jnp.asarray(aparam)
        if coords.ndim == 2:
            return self._single(coords, box, types, fp, ap)
        if fp is not None and fp.ndim == 1:
            fp = jnp.broadcast_to(fp[None], (coords.shape[0],) + fp.shape)
        if ap is not None and ap.ndim == 2:
            ap = jnp.broadcast_to(ap[None], (coords.shape[0],) + ap.shape)
        return self._batch(coords, box, types, fp, ap)


def calc_model_devi(models: Sequence[DeepPot], coords, box, atom_types):
    """Force deviation across an ensemble (model_devi.py semantics):
    per atom sigma_i = std over models of the force vector; returns
    (max_devi_f, min_devi_f, avg_devi_f) per frame."""
    fs = []
    for m in models:
        _, f, _ = m.eval(coords, box, atom_types)
        fs.append(np.asarray(f))
    F = np.stack(fs)                      # (n_models, [batch,] natoms, 3)
    if F.ndim == 3:
        F = F[:, None]
    mean = F.mean(axis=0)
    devi = np.sqrt(((F - mean) ** 2).sum(axis=-1).mean(axis=0))  # (b, natoms)
    return devi.max(axis=-1), devi.min(axis=-1), devi.mean(axis=-1)
