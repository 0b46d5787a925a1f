"""Embedding / fitting MLPs as pure parameter pytrees.

Re-implements the reference's network builders
(deepmd/deepmd/utils/network.py):
  - embedding_net (:113-260): layers y = phi(x W + b) with identity-style
    residual shortcuts (+x when N2==N1, +(x,x) when N2==2*N1) and optional
    resnet_dt scaling.
  - one_layer (:17-110): fitting layers with tanh + resnet_dt, final
    linear layer with energy bias.

The matmul inside every layer is routed through the engine's dense entry
(g4s_tpu.engine.dense_matmul), preserving the G4S seam where the reference
routes the same matmul through the OptMatmul graph-engine op
(network.py:234,239 -> source/op/opt_matmul.cc) — on TPU that entry is a
straight MXU jnp.dot, which is the optimal "execution strategy" for a dense
degree-regular graph.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from g4s_tpu.engine.matmul import dense_matmul


def init_embedding_net(key, sizes: Sequence[int], *, in_dim: int = 1,
                       resnet_dt: bool = False, dtype=jnp.float64):
    """Params for one embedding net [in_dim] + sizes."""
    dims = [in_dim] + list(sizes)
    layers = []
    for i in range(1, len(dims)):
        key, k1, k2, k3 = jax.random.split(key, 4)
        w = jax.random.normal(k1, (dims[i - 1], dims[i]), dtype) \
            / np.sqrt(dims[i] + dims[i - 1])
        b = jax.random.normal(k2, (dims[i],), dtype)
        layer = {"w": w, "b": b}
        if resnet_dt:
            layer["idt"] = 1.0 + 0.001 * jax.random.normal(k3, (dims[i],), dtype)
        layers.append(layer)
    return layers


def embedding_net_apply(layers, x):
    """x: (..., in_dim) -> (..., sizes[-1]) with DeePMD residual rules."""
    for layer in layers:
        h = jnp.tanh(dense_matmul(x, layer["w"]) + layer["b"])
        if "idt" in layer:
            h = h * layer["idt"]
        n_in, n_out = layer["w"].shape
        if n_out == n_in:
            x = x + h
        elif n_out == 2 * n_in:
            x = jnp.concatenate([x, x], axis=-1) + h
        else:
            x = h
    return x


def init_fitting_net(key, in_dim: int, sizes: Sequence[int], *,
                     resnet_dt: bool = True, bias_out: float = 0.0,
                     dtype=jnp.float64):
    dims = [in_dim] + list(sizes)
    layers = []
    for i in range(1, len(dims)):
        key, k1, k2, k3 = jax.random.split(key, 4)
        w = jax.random.normal(k1, (dims[i - 1], dims[i]), dtype) \
            / np.sqrt(dims[i] + dims[i - 1])
        b = jax.random.normal(k2, (dims[i],), dtype) * 0.1
        layer = {"w": w, "b": b}
        if resnet_dt and dims[i] == dims[i - 1]:
            layer["idt"] = 1.0 + 0.001 * jax.random.normal(k3, (dims[i],), dtype)
        layers.append(layer)
    key, k1 = jax.random.split(key)
    w_final = jax.random.normal(k1, (dims[-1], 1), dtype) / np.sqrt(dims[-1] + 1)
    final = {"w": w_final, "b": jnp.asarray([bias_out], dtype)}
    return {"hidden": layers, "final": final}


def fitting_net_apply(params, x):
    """x: (..., in_dim) -> (...,) atomic energies."""
    for layer in params["hidden"]:
        h = jnp.tanh(dense_matmul(x, layer["w"]) + layer["b"])
        if "idt" in layer:
            h = h * layer["idt"]
        n_in, n_out = layer["w"].shape
        x = x + h if n_out == n_in else h
    out = dense_matmul(x, params["final"]["w"]) + params["final"]["b"]
    return out[..., 0]
