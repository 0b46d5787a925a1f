"""Device-mesh construction.

Replaces the reference's processor-grid setup: CitcomS's nprocx*nprocy*nprocz
brick decomposition (citcoms/lib/Regional_parallel_related.c:213) and the
12-cap full-sphere layout (Full_parallel_related.c:249) become named axes of
one `jax.sharding.Mesh`; MPI sub-communicators (rows/columns,
Regional_parallel_related.c:134-204) are just collectives over a subset of
axis names.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_mesh_shape(n_devices: int, n_axes: int) -> tuple:
    """Factor n_devices into a near-cubic n_axes-dim grid (largest factors
    last so the fastest-varying axis maps to adjacent devices/ICI links)."""
    shape = [1] * n_axes
    remaining = n_devices
    for i in range(n_axes - 1, -1, -1):
        # greedy: largest divisor <= remaining ** (1/(i+1))
        target = round(remaining ** (1.0 / (i + 1)))
        d = 1
        for cand in range(target, 0, -1):
            if remaining % cand == 0:
                d = cand
                break
        shape[i] = d
        remaining //= d
    shape[-1] *= remaining  # any residue
    assert int(np.prod(shape)) == n_devices
    return tuple(shape)


def make_mesh(axis_names: Sequence[str], axis_sizes: Sequence[int] | None = None,
              *, devices=None) -> Mesh:
    """Build a Mesh over the given named axes.

    With axis_sizes=None the available devices are factored automatically.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = device_mesh_shape(n, len(axis_names))
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(
            f"mesh {tuple(axis_sizes)} needs {int(np.prod(axis_sizes))} devices, "
            f"have {n}")
    grid = np.asarray(devices).reshape(axis_sizes)
    return Mesh(grid, tuple(axis_names))
