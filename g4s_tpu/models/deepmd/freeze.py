"""Freeze: serialize a trained model to a single deployable artifact.

Equivalent of `dp freeze -o graph.pb` (deepmd/deepmd/entrypoints/freeze.py:
322 freeze_graph — TF variables folded into a constant graph). Here the
artifact is an .npz holding every parameter leaf plus the model spec; it is
self-contained and loadable without the training code path, which is the
property the .pb had.
"""

from __future__ import annotations

import json
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.models.deepmd.descriptor import DescriptorSpec
from g4s_tpu.models.deepmd.model import ModelSpec


def freeze(params, spec: ModelSpec, path, *, type_map=None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(params)
    meta = dict(
        rcut=spec.descriptor.rcut, rcut_smth=spec.descriptor.rcut_smth,
        sel=list(spec.descriptor.sel), ntypes=spec.descriptor.ntypes,
        embed_neurons=list(spec.embed_neurons), axis_neuron=spec.axis_neuron,
        fit_neurons=list(spec.fit_neurons),
        embed_resnet_dt=spec.embed_resnet_dt,
        fit_resnet_dt=spec.fit_resnet_dt,
        descriptor_type=spec.descriptor_type,
        numb_fparam=spec.numb_fparam, numb_aparam=spec.numb_aparam,
        type_map=list(type_map) if type_map else None,
        treedef=str(treedef))
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_frozen(path) -> Tuple[dict, ModelSpec]:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        leaves = [jnp.asarray(z[f"leaf_{i}"])
                  for i in range(len(z.files) - 1)]
    spec = ModelSpec(
        DescriptorSpec(meta["rcut"], meta["rcut_smth"], tuple(meta["sel"]),
                       meta["ntypes"]),
        tuple(meta["embed_neurons"]), meta["axis_neuron"],
        tuple(meta["fit_neurons"]), meta["embed_resnet_dt"],
        meta["fit_resnet_dt"], meta.get("descriptor_type", "se_e2_a"),
        numb_fparam=meta.get("numb_fparam", 0),
        numb_aparam=meta.get("numb_aparam", 0))
    # rebuild the treedef by initializing a skeleton with the same structure
    from g4s_tpu.models.deepmd.model import init_params
    skeleton = init_params(jax.random.PRNGKey(0), spec)
    treedef = jax.tree_util.tree_structure(skeleton)
    return jax.tree_util.tree_unflatten(treedef, leaves), spec


def load_frozen_meta(path) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return json.loads(str(z["__meta__"]))
