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
            lambda c, b, t: energy_force_virial(self.params, self.spec,
                                                c, b, t))
        self._batch = jax.jit(jax.vmap(
            lambda c, b, t: energy_force_virial(self.params, self.spec,
                                                c, b, t),
            in_axes=(0, 0, None)))

    @property
    def rcut(self) -> float:
        return self.spec.descriptor.rcut

    @property
    def ntypes(self) -> int:
        return self.spec.descriptor.ntypes

    def eval(self, coords, box, atom_types):
        coords = jnp.asarray(coords)
        box = jnp.asarray(box)
        types = jnp.asarray(atom_types)
        if coords.ndim == 2:
            return self._single(coords, box, types)
        return self._batch(coords, box, types)


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
